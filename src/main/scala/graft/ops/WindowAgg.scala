package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window KPI aggregation — the reference consumer's core operator
  * chain (C4-C8: null-filter → watermark → `window(ts, 10 min, 5 min)` →
  * grouped count → window-struct flatten; see
  * `/root/reference/consumer/consumer.py:111-140`).
  *
  * Batch formulation here; the streaming twin is
  * [[graft.streaming.EventPipeline]], and both delegate to the same
  * `EventPipeline.windowCounts` transform (watermark `None` in batch), so the
  * streaming-vs-batch golden test compares identical lineage.
  * `window()` is a Catalyst built-in that
  * expands each event into its W/S = 2 overlapping windows *before* the
  * aggregation, so the plan is: scan → generate(2 rows) → partial hash agg →
  * shuffle on (window, key) → final hash agg. At 100 TB the shuffle is keyed
  * by (window, entity), which is exactly the output key — no second shuffle,
  * and partial aggregation collapses the fan-out map-side.
  *
  * Scale note: cardinality of the state/result is |windows| × |entities|
  * (bounded, per SURVEY §6 ≤100k entities per window), never |events| — the
  * aggregation is the compaction point, so this holds at 1000 executors.
  */
object WindowAgg {

  /** KPI table keyed by (window_start, window_end, user_id) — reference
    * `user_interactions` (`consumer/consumer.py:116-126`). */
  def userWindows(spark: SparkSession, sfDir: String): DataFrame =
    windowsBy(Tables.events(spark, sfDir), "user_id")

  /** KPI table keyed by event_type — reference `item_interactions`
    * (`consumer/consumer.py:130-140`); our events table's enum column plays
    * the low-cardinality "item" role. */
  def typeWindows(spark: SparkSession, sfDir: String): DataFrame =
    windowsBy(Tables.events(spark, sfDir), "event_type")

  def windowsBy(events: DataFrame, key: String): DataFrame =
    graft.streaming.EventPipeline.windowCounts(events, key, watermark = None)

  /** DuckDB-equivalent SQL. DuckDB has no `window()`; reconstruct the two
    * overlapping epoch-aligned windows per event arithmetically:
    * start ∈ { floor(t/300)·300, floor(t/300)·300 − 300 } for width 600 s.
    * `make_timestamp` takes µs since epoch and is timezone-free, matching
    * Spark's UTC session. */
  def windowsSql(key: String): String =
    s"""SELECT
       |  make_timestamp(((CAST(floor(epoch(ts) / 300) AS BIGINT) - o.k) * 300) * 1000000) AS window_start,
       |  make_timestamp(((CAST(floor(epoch(ts) / 300) AS BIGINT) - o.k) * 300 + 600) * 1000000) AS window_end,
       |  $key,
       |  count(*) AS total_interactions
       |FROM events, (VALUES (0), (1)) AS o(k)
       |WHERE ts IS NOT NULL AND $key IS NOT NULL
       |GROUP BY 1, 2, 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w_user_windows" -> ((s, d) => userWindows(s, d)),
    "w_type_windows" -> ((s, d) => typeWindows(s, d)))

  val oracle: Map[String, String] = Map(
    "w_user_windows" -> windowsSql("user_id"),
    "w_type_windows" -> windowsSql("event_type"))
}
