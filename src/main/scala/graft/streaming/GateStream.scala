package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The EIGHTEENTH streaming execution: the QUALITY GATE AT INGEST — the
  * batch classifier `x_model_gate` applies trained integer weights in a
  * later sweep; a 100 TB deployment scores every document AS IT ARRIVES
  * and maintains the per-stratum admit/reject census the curation
  * dashboard watches. The weights ride into the plan as literals (the
  * broadcast-weights limit case: a linear gate's "model" is a handful of
  * integers), the features are map-side expressions fused into the
  * micro-batch projection ([[graft.ops.TextAnalysis.gateMapSide]] — the
  * SAME scoring definition as the batch gate, so the two cannot drift),
  * and the census is an unwindowed update-mode aggregation whose state is
  * one row per (lang, decision) — cardinality-bounded, nothing to evict,
  * the [[EventPipeline.streamedDecontam]] shape.
  *
  * Semantics: the per-doc score is stateless, and the census aggregation
  * accumulates across micro-batches (update mode re-emits a key's new
  * total each time it changes; the keyed-upsert sink keeps the latest), so
  * the resolved table equals the batch rollup under ANY batching of the
  * source — the multi-batch golden in `GateStreamSpec` delivers the corpus
  * in two batches and pins exactly that. */
object GateStream {

  /** Run the ingest gate to completion over the documents table and return
    * the resolved (lang, is_admit) census. */
  def streamedGate(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    graft.functions.GraftFunctions.register(ss)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sgate-")
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val docs = ss.readStream.schema(schema).parquet(dir.toString)
    val q = graft.ops.TextAnalysis.gateRollup(docs).writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(b, id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("lang", "is_admit"))
      .select(col("lang"), col("is_admit"), col("n_docs"), col("score_m_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_model_gate_stream" -> ((s, d) => streamedGate(s, d)))

  /** Stateless scoring + unwindowed running census ⇒ NO watermark cut: the
    * oracle is the batch gate rollup verbatim. */
  val oracle: Map[String, String] = Map(
    "s_model_gate_stream" -> graft.ops.TextAnalysis.gateRollupSql)
}
