package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The THIRTY-NINTH streaming execution: INGEST-TIME FEATURE LOGGING —
  * every arriving document's LTR feature rows computed inside its own
  * micro-batch by the SAME [[graft.ops.Search.ltrFeaturesOn]] definition
  * the offline training emission (`x_search_ltr`) uses. This is the
  * training/serving-skew guard made structural: a reranker trained on the
  * offline emission and served against this log sees byte-identical
  * features for the same (query, candidate), because there is exactly one
  * feature definition — the drift class that plagues two-codebase feature
  * stores cannot exist.
  *
  * Stateless stream-static: both standing indexes (BM25 impacts, LM
  * postings/lengths) derive once at query start — or read from a
  * persisted [[graft.ops.IndexStore]] — and the label metadata relation
  * is lineage-cut once; a trigger pays its own arrivals' probes plus
  * k-per-arrival bounded feature joins. Results land under
  * (query_id, neighbor_id) in the keyed sink — replay idempotent.
  *
  * Oracle: result equals the batch `x_search_ltr_in` under any batching
  * (each arrival's features depend only on its own text + the static
  * indexes), so the twin is that SQL verbatim. */
object LtrStream {

  /** Run the feature-logging stream to completion over the documents
    * table's arrivals and return the resolved feature log. */
  def streamedLtr(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sltr-")
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
          graft.ops.Search.ltrFeaturesOn(b.toDF(), bmIdx, lmIdx, meta),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score_m"),
        col("n_terms"), col("lm_fp"), col("lm_terms"), col("dl"), col("n_q"),
        col("rel"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_ltr_stream" -> ((s, d) => streamedLtr(s, d)))

  /** Stateless stream-static feature logging ⇒ NO watermark cut: the
    * oracle is the batch ingest form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_ltr_stream" -> graft.ops.Search.oracle("x_search_ltr_in"))
}
