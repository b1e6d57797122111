package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed CHUNK-LEVEL SEARCH AT INGEST — the RAG sibling of
  * [[SearchStream]]: arriving documents are scored against the standing
  * CHUNK index (passage-unit BM25 — `/root/reference` has no retrieval
  * layer; this is the §7.4 LLM-pipeline extension surface) inside each
  * micro-batch, via the SAME probe definition the batch
  * `x_search_chunks_in` runs ([[graft.ops.Search.chunkProbe]] — batch and
  * stream cannot drift). The chunk trio derives once at query start
  * (store-served when an [[graft.ops.IndexStore]] carries
  * `chunk_postings`/`chunk_token_df`/`chunk_stats`); a trigger pays only
  * its own arrivals' term probes.
  *
  * Stateless stream-static search: nothing to evict, no watermark; each
  * arrival's passage hits are complete within its own micro-batch, so the
  * result equals the batch form under ANY batching (`ChunkStreamSpec`
  * pins two-batch delivery). Sink key is (query_id, rnk) — replay
  * idempotent.
  *
  * Scale: this is the live "retrieve supporting passages for each
  * arriving query/document" RAG serving shape at 100 TB — the chunk
  * index is the persisted artifact (chunk fan-out paid once at build),
  * triggers pay arrivals × qTerms pruned-posting probes, corpus- AND
  * chunk-count-independent per document. */
object ChunkStream {

  /** Run the ingest chunk-search stream to completion and return the
    * resolved passage-hit table. */
  def streamedChunkSearch(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-schunk-")
    val idx = graft.ops.Search.chunkIngestIndex(ss, sfDir)
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % graft.ops.Similarity.knnBatchMod === 7)
      .select(col("doc_id"), col("text"))
    val q = ingest.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Search.chunkProbe(b.toDF(), idx), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "rnk"))
      .select(col("query_id"),
        expr(s"chunk_key div ${graft.ops.Search.chunkKeyMod}").as("neighbor_id"),
        (col("chunk_key") % graft.ops.Search.chunkKeyMod).as("chunk_id"),
        col("score_m"), col("n_terms"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_chunk_search_stream" -> ((s, d) => streamedChunkSearch(s, d)))

  /** Stateless stream-static search ⇒ NO watermark cut: the oracle is the
    * batch chunk ingest search verbatim. */
  val oracle: Map[String, String] = Map(
    "s_chunk_search_stream" -> graft.ops.Search.oracle("x_search_chunks_in"))
}
