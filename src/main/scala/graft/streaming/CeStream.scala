package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FORTY-THIRD streaming execution — CROSS-ENCODER RERANKING AT
  * SERVING TIME: the second retrieval stage run where it actually runs in
  * production, per arriving query. Each micro-batch logs the arriving
  * queries' candidate features through the standing indexes (the SAME
  * [[graft.ops.Search.ltrFeaturesOn]] the trainer and [[LtrStream]] use —
  * the training/serving-skew guard now covers the reranker's inputs too),
  * scores every (query, candidate) pair with the cross-encoder head and
  * re-ranks ([[graft.ops.Search.ceRerankOf]] — ONE definition with the
  * batch `x_search_ce_in`, so serving and offline eval cannot drift).
  *
  * Both standing indexes are derived once at query start (or read from
  * the persisted IndexStore when configured) — per-trigger cost is
  * |batch queries| × k head evaluations against static relations, and the
  * rerank window partitions by query over ≤k rows, so every query's
  * result is complete within its own micro-batch. Stateless stream-static
  * ⇒ the resolved table equals the batch ingest rerank under ANY batching
  * and the oracle is its SQL verbatim; the (query, candidate)-keyed
  * upsert sink makes checkpoint replay idempotent. */
object CeStream {

  def streamedCeRerank(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sce-")
    val bmIdx = graft.ops.Search.ingestIndex(ss, sfDir)
    val lmIdx = graft.ops.Search.lmIngestIndex(ss, sfDir)
    val meta = graft.ops.Lineage.cut(graft.Tables.documents(ss, sfDir)
      .select(col("doc_id"), col("lang"), col("source")))
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
          graft.ops.Search.ceRerankOf(
            graft.ops.Search.ltrFeaturesOn(b.toDF(), bmIdx, lmIdx, meta)),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("bm25_rnk"),
        col("score_m"), col("lm_fp"), col("ce_fp"), col("rel"), col("ce_rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_ce_rerank_stream" -> ((s, d) => streamedCeRerank(s, d)))

  /** Stateless stream-static rerank ⇒ no watermark cut: the oracle is the
    * batch ingest rerank verbatim. */
  val oracle: Map[String, String] = Map(
    "s_ce_rerank_stream" -> graft.ops.Search.oracle("x_search_ce_in"))
}
