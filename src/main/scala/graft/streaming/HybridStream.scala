package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed HYBRID SEARCH AT INGEST — the fusion of [[SearchStream]]'s
  * lexical probe and [[GraphAnnStream]]'s dense stance in one serving
  * path: each arriving document (`doc_id % 10 = 7`) is scored against the
  * standing pruned BM25 index AND, after its vector is looked up from the
  * embedding store (the static `emb` relation — the lookup is the gate:
  * no stored vector, not served), against the standing dense corpus; the
  * two top-k legs fuse by reciprocal rank inside the micro-batch. ONE
  * probe definition is shared with the batch `x_search_hybrid_in`
  * ([[graft.ops.Search.hybridProbe]]), so batch and stream cannot drift.
  *
  * Stateless stream-static: both indexes and the embedding lookup are
  * static at query start (lineage-cut once), each arrival's fused answer
  * depends only on its own row, so the result equals the batch form under
  * ANY batching (`HybridStreamSpec` pins two-batch delivery). Results
  * land in the keyed-upsert sink under (query_id, rnk).
  *
  * Scale: per-trigger cost is arrivals × (qTerms pruned-list probes +
  * one dense scan leg); at 100 TB the dense leg swaps to the navigable-
  * graph search — [[graft.ops.Search.fuseRrf]] reads only (query,
  * neighbor, rnk), so the swap touches no fusion code. State is zero. */
object HybridStream {

  /** Run the hybrid ingest stream to completion and return the resolved
    * fused answer table. */
  def streamedHybrid(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-shybrid-")
    val (idx, c, emb) = graft.ops.Search.hybridIngestIndex(ss, sfDir)
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
          graft.ops.Search.hybridProbe(b.toDF(), idx, c, emb), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "rnk"))
      .select(col("query_id"), col("neighbor_id"), col("rrf"),
        col("n_legs"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_hybrid_stream" -> ((s, d) => streamedHybrid(s, d)))

  /** Stateless stream-static search ⇒ NO watermark cut: the oracle is the
    * batch hybrid ingest search verbatim. */
  val oracle: Map[String, String] = Map(
    "s_hybrid_stream" -> graft.ops.Search.oracle("x_search_hybrid_in"))
}
