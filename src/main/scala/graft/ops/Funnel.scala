package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral rollups over the event stream: the conversion funnel and
  * cohort retention — the two dashboard queries every event pipeline grows
  * next after windowed KPIs (the reference's dashboard stops at top-N
  * counts, `/root/reference/reporting/reporting.py:65-66`).
  *
  * Both are one-shuffle plans keyed by `user_id`, the natural partitioning
  * for per-user history walks: the funnel stacks three window aggregates
  * over the SAME partition spec (Catalyst plans one Exchange and three
  * Window nodes), retention reuses the distinct (user, day) relation for
  * both the cohort assignment and the activity join. Nothing is ordered
  * globally; output sizes are |stages| and |cohorts × offsets| — dashboard
  * relations, not data relations.
  *
  * All event-time math is integer microseconds (`unix_micros` ↔ DuckDB
  * `epoch_us`), day arithmetic is integer floor-division — no timezone,
  * calendar, or FP dependence anywhere, so every row is oracle-exact.
  */
object Funnel {

  /** Conversion window: a step counts only within 24 h of the previous one. */
  private val convWindowUs = 24L * 3600 * 1000000

  /** Conversion funnel view → click → purchase, strictly ordered per user
    * with a 24-hour conversion window per step: stage 1 = has a view;
    * stage 2 = has a click within 24 h at-or-after the FIRST view; stage 3 =
    * has a purchase within 24 h at-or-after that first qualifying click.
    * Users whose clicks all precede their first view (or miss the window)
    * stay at stage 1 — the funnel counts ordered, timely journeys, not event
    * presence (`min(t_prev ≤ us ≤ t_prev + 24h)` with a null-rejecting
    * `when` gives exactly that semantics). Output: one row per stage with
    * the user count — the shape a funnel chart reads. */
  def funnel(s: SparkSession, d: String): DataFrame =
    funnelEvents(Tables.events(s, d))

  /** [[funnel]] over any frame with (user_id, event_type, ts). */
  def funnelEvents(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
    val staged = ev
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("us") >= col("t_view") && col("us") <= col("t_view") + convWindowUs,
          col("us"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("us") >= col("t_click") && col("us") <= col("t_click") + convWindowUs,
          col("us"))).over(w))
    staged
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
        max(col("t_purchase")).as("t_purchase"))
      .select(
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .when(col("t_view").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users grouped by their first active day (the cohort),
    * counted on each later day-offset they return. `day` is integer
    * days-since-epoch (µs floor-divided). Plan: ONE shuffle keyed by user
    * builds each user's distinct-day set (`collect_set` — partial
    * aggregation dedups map-side, and the set is bounded by the retention
    * horizon in days, never by event volume), then cohort = array_min and
    * the offset expansion are in-row, leaving only the final dashboard-sized
    * (cohort, offset) aggregation. One fewer exchange than the
    * distinct → window formulation, which shuffles the activity set twice
    * (once on (user, day), again on user). Output: (cohort_day, day_offset,
    * n_users). */
  def retention(s: SparkSession, d: String): DataFrame =
    retentionEvents(Tables.events(s, d))

  /** [[retention]] over any frame with (user_id, ts). */
  def retentionEvents(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("days"))
      .select(array_min(col("days")).as("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_funnel" -> funnel,
    "x_retention" -> retention)

  val oracle: Map[String, String] = Map(
    "x_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |             AND event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM e),
        |v AS (SELECT user_id, min(us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.us) AS t_click
        |      FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.us >= v.t_view
        |        AND e.us <= v.t_view + $convWindowUs GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.us) AS t_purchase
        |      FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.us >= c.t_click
        |        AND e.us <= c.t_click + $convWindowUs GROUP BY 1),
        |st AS (SELECT u.user_id,
        |         CASE WHEN p.user_id IS NOT NULL THEN 3
        |              WHEN c.user_id IS NOT NULL THEN 2
        |              WHEN v.user_id IS NOT NULL THEN 1
        |              ELSE 0 END AS stage
        |       FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |              LEFT JOIN p USING (user_id))
        |SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_users
        |FROM st GROUP BY 1""".stripMargin,
    "x_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
        |       CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin)
}
