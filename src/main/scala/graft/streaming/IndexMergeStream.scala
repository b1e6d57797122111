package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The THIRTY-FIFTH streaming execution: INDEX MAINTENANCE AS A STREAM —
  * [[graft.ops.Search.indexMerge]]'s fold running at ingest, the lexical
  * sibling of [[GraphInsertStream]]'s nav-graph maintenance: arriving
  * documents keep the BM25 index current without any rebuild job.
  *
  * Shape: the SINK IS THE STATE (the [[MvStream]] stance — zero
  * state-store state). Each micro-batch tokenizes ONLY its own documents
  * and appends their raw (doc_id, token, tf) state as that batch's delta
  * ([[UpsertSink.writeBatch]], overwrite per batch id ⇒ replay is a
  * no-op); no streaming aggregation runs, because arriving doc ids are
  * disjoint across batches — the per-batch tf relations PARTITION the
  * increment's state. At read time the standing corpus's stored tf state
  * folds with every delta ([[UpsertSink.readAll]]) through the SAME
  * [[graft.ops.Search.indexFromState]] derivation the from-scratch build
  * uses — impacts and the prune recomputed under the post-ingest df/avgdl,
  * the correctness point [[graft.ops.Search.indexMerge]]'s scaladoc pins.
  *
  * Oracle: the resolved postings equal the full-corpus rebuild under ANY
  * batching, so the twin is `x_search_index_merge`'s pruned-postings SQL
  * verbatim; `IndexMergeStreamSpec` pins two-batch delivery and replay. */
object IndexMergeStream {

  /** Per-slice raw TF state — one tokenization of the given docs frame. */
  private[graft] def tfState(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))

  /** Run the index-maintenance stream to completion over the documents
    * table's arriving slice and return the merged pruned postings. */
  def streamedIndexMerge(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-simerge-")
    val mod = graft.ops.Similarity.knnBatchMod
    val baseTf = graft.ops.Lineage.cut(tfState(
      graft.Tables.documents(ss, sfDir).filter(col("doc_id") % mod =!= 7)))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val q = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % mod === 7)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(tfState(b), id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    val nd = graft.Tables.documents(ss, sfDir).agg(count(lit(1)).as("n_docs"))
    graft.ops.Search.indexFromState(
      baseTf.unionAll(UpsertSink.readAll(ss, s"$scratch/sink")), nd)
      .postings.select(col("token"), col("doc_id"), col("imp_m"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_index_merge_stream" -> ((s, d) => streamedIndexMerge(s, d)))

  /** Disjoint-id partition fold ⇒ no watermark cut: the oracle is the
    * batch merge's full-rebuild twin verbatim. */
  val oracle: Map[String, String] = Map(
    "s_index_merge_stream" -> graft.ops.Search.oracle("x_search_index_merge"))
}
