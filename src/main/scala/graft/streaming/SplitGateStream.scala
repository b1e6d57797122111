package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The THIRTY-SIXTH streaming execution: the LEAK-PROOF SPLIT GATE — the
  * streamed twin of [[graft.ops.Sampling.splitLeakproofIngest]], sitting
  * at the same pipeline position as the ingest dedup gate
  * ([[DedupStream]]) and answering the question right after "is this a
  * near-dup?": "which split may this document ever appear in?". Decided
  * at admission time, because a training run that reads an arrival before
  * its split is pinned can leak it into train while its standing near-dup
  * sits in test.
  *
  * Semantics: stateless stream-static probe (the [[DedupStream]] shape —
  * static signature/band index AND static standing-component labels on
  * the right, nothing to evict, no watermark); each arrival's assignment
  * depends only on its own text plus the persisted relations, so the
  * resolved table equals the batch `x_split_leakproof_in` under ANY
  * batching ([[graft.ops.Sampling.splitLeakproofProbe]] is the ONE shared
  * definition; `SplitGateStreamSpec` pins two-batch delivery). The keyed
  * upsert under doc_id keeps checkpoint replay idempotent. */
object SplitGateStream {

  /** Run the split gate to completion over the documents table's arriving
    * slice and return the resolved assignment table. */
  def streamedSplitGate(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-ssplit-")
    val (corpusSig, corpusBands) = graft.ops.Dedup.corpusSigIndex(ss, sfDir)
    val labels = graft.ops.Lineage.cut(
      graft.ops.Dedup.standingComponentLabels(ss, sfDir))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % graft.ops.Dedup.newMod === graft.ops.Dedup.newRem)
      .select(col("doc_id"), col("text"))
    val q = ingest.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Sampling.splitLeakproofProbe(
            b.toDF(), corpusSig, corpusBands, labels),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("doc_id"))
      .select(col("doc_id"), col("inherited"), col("split_key"), col("split"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_split_gate_stream" -> ((s, d) => streamedSplitGate(s, d)))

  /** Stateless stream-static probe ⇒ no watermark cut: the oracle is the
    * batch ingest-split form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_split_gate_stream" -> graft.ops.Sampling.oracle("x_split_leakproof_in"))
}
