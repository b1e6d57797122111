package graft.streaming


import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** Input row for the lifetime-totals processor: user key + exact cents. */
case class TotalEvent(user_id: Long, value_c: Long)

/** Output row: cumulative per-user totals as of the latest micro-batch. */
case class UserTotals(user_id: Long, n_events: Long, value_c_sum: Long)

/** Persistent per-user state (count + exact integer cents sum). */
case class TotState(n: Long, sum_c: Long)

/** Arbitrary-state processor on Spark 4's `transformWithState` API — the
  * successor to `flatMapGroupsWithState` ([[StatefulDedup]] keeps the
  * legacy API covered): typed per-key state handles (`ValueState` /
  * `ListState` / `MapState`) with store-native TTL, timers, and mandatory
  * RocksDB backing — per-key point lookups instead of loading a whole
  * group's state object per trigger, which is what makes 10⁸-key lifetime
  * state practical on a real cluster.
  *
  * Semantics: one `ValueState[TotState]` per user accumulates (count,
  * exact-cents sum); each batch emits the updated totals for the keys it
  * touched (update mode), so the upsert sink's resolved table after a
  * bounded replay IS the batch aggregate — the oracle-checkable contract.
  * State here is lifetime-KPI state (cardinality-bounded by |users|, no
  * horizon to evict); a TTL horizon is one `TTLConfig` argument away. */
class RunningTotalsProcessor extends StatefulProcessor[Long, TotalEvent, UserTotals] {

  @transient private var tot: ValueState[TotState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tot = getHandle.getValueState[TotState]("tot", Encoders.product[TotState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TotalEvent],
      timers: TimerValues): Iterator[UserTotals] = {
    var n = 0L
    var s = 0L
    rows.foreach { r => n += 1; s += r.value_c }
    val prev = if (tot.exists()) tot.get() else TotState(0L, 0L)
    val next = TotState(prev.n + n, prev.sum_c + s)
    tot.update(next)
    Iterator.single(UserTotals(key, next.n, next.sum_c))
  }
}

/** Driver-facing wrapper: run the [[RunningTotalsProcessor]] query to
  * completion over the events table and resolve the upsert sink. */
object RunningTotals {

  private def rocksProvider = EventPipeline.rocksProvider

  /** `transformWithState` requires the RocksDB state store; the conf is
    * read at query START, so it is set on the throwaway reduced-partition
    * [[EventPipeline.streamingSession]] child (which also carries the
    * stream-width shuffle-partition count) — the caller's session conf is
    * never touched, and concurrent queries are unaffected. */
  def streamedRunningTotals(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s, Some(rocksProvider))
    import ss.implicits._
    val scratch = graft.ops.SpillMemo.scratchDir("graft-tws-")
    val typed = EventPipeline.fileStream(ss, sfDir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_c"))
      .as[TotalEvent]
    val out = typed.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
    val q = out.toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) => UpsertSink.writeBatch(b, id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("value_c_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_running_totals_stream" -> ((s, d) => streamedRunningTotals(s, d)))

  /** Update-mode lifetime totals: the final upserted row per user equals
    * the plain batch aggregate. */
  val oracle: Map[String, String] = Map(
    "s_running_totals_stream" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c_sum
        |FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1""".stripMargin)
}
