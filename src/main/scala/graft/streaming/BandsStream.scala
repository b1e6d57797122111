package graft.streaming

import graft.ops.MatView
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The THIRTY-EIGHTH streaming execution: MAINTAINED QUANTILE BANDS — the
  * P50/P95/P99 dashboard (`d_value_bands`) served off a histogram grid
  * that is MAINTAINED at ingest instead of rebuilt per tick, the
  * [[MvStream]] posture applied to the rank member of the mergeable-state
  * family.
  *
  * Shape: the sink is the state. Each micro-batch aggregates its own rows
  * to a |types|×64 bucket-count delta ([[graft.ops.MatView.histState]])
  * and appends it under its batch id (checkpoint replay rewrites the same
  * delta — recovery is a no-op); no streaming aggregation, no state store.
  * The served answer is the readout off the monoid merge of the spilled
  * base grid with every delta ([[UpsertSink.readAll]] +
  * [[graft.ops.MatView.mergeHist]] — bucket-wise addition, the merge a
  * t-digest cannot do engine-exactly), through the SAME
  * [[graft.ops.MatView.bandsReadout]] as the batch form — one readout
  * definition, batch and stream cannot drift.
  *
  * Scale: a trigger pays one pass over its own arrivals plus a ≤64-row
  * append; the dashboard tick pays a ≤64-row-per-type window over the
  * merged grid. Neither ever re-scans the corpus — at 100 TB this is the
  * difference between a live latency board and an hourly batch job.
  *
  * Oracle: the merged grid equals the full-corpus grid under any batching
  * (bucket addition is associative-commutative over a partition of the
  * rows), so the twin is `d_value_bands`'s full-recompute SQL verbatim. */
object BandsStream {

  /** Run the grid-maintenance stream to completion over the events table's
    * increment slice and return the served bands. */
  def streamedBands(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sbands-")
    val q = EventPipeline.fileStream(ss, sfDir)
      .filter(MatView.isDelta)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(MatView.histState(b), id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    MatView.bandsReadout(MatView.mergeHist(
      MatView.baseHist(ss, sfDir),
      UpsertSink.readAll(ss, s"$scratch/sink")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_value_bands_stream" -> ((s, d) => streamedBands(s, d)))

  /** Running fold over the whole increment ⇒ no watermark cut: the oracle
    * is the batch full-recompute twin verbatim. */
  val oracle: Map[String, String] = Map(
    "s_value_bands_stream" -> MatView.oracle("d_value_bands"))
}
