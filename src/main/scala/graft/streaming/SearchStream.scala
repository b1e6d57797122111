package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed LEXICAL SEARCH AT INGEST — the BM25 sibling of
  * [[GraphAnnStream]]: arriving documents (`doc_id % 10 = 7`, the ingest
  * convention) are scored against the standing-corpus BM25 index inside
  * each micro-batch, via the SAME probe definition the batch
  * `x_search_ingest` runs ([[graft.ops.Search.bm25Probe]]) — batch and
  * stream cannot drift. The index trio (denormalized postings, term df,
  * corpus stats) derives ONCE at query start
  * ([[graft.ops.Search.ingestIndex]], each relation lineage-cut), so a
  * trigger pays only its own arrivals' term probes.
  *
  * Stateless stream-static search: nothing to evict, no watermark; each
  * arriving document's answer depends only on its own text plus the static
  * index, so its top-k is complete within its own micro-batch and the
  * result equals the batch form under ANY batching of the source
  * (`SearchStreamSpec` pins two-batch delivery). Results land in the
  * keyed-upsert sink under (query_id, rnk) — checkpoint replay idempotent.
  *
  * Scale: per-trigger cost is arrivals × [[graft.ops.Search.qTerms]]
  * posting-list probes against the persisted index — corpus-size-
  * independent per document once the index stands; state is zero. This is
  * the shape of a live "find near-duplicates / related docs for each
  * crawled page" admission check at 100 TB: the index is the persisted
  * artifact, triggers pay only ingest volume. */
object SearchStream {

  /** Run the ingest BM25 stream to completion over the documents table and
    * return the resolved answer table. */
  def streamedSearch(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-ssearch-")
    val idx = graft.ops.Search.ingestIndex(ss, sfDir)
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
          graft.ops.Search.bm25Probe(b.toDF(), idx), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "rnk"))
      .select(col("query_id"), col("neighbor_id"), col("score_m"),
        col("n_terms"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_search_stream" -> ((s, d) => streamedSearch(s, d)))

  /** Stateless stream-static search ⇒ NO watermark cut: the oracle is the
    * batch ingest search verbatim. */
  val oracle: Map[String, String] = Map(
    "s_search_stream" -> graft.ops.Search.oracle("x_search_ingest"))
}
