package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregates — the third member of the approximate-
  * structure family (Bloom: [[Dedup.decontaminateBloom]]; the two here are
  * HyperLogLog++ distinct counting and t-digest quantiles). At 100 TB these
  * are not a nicety: `count(DISTINCT x)` over a high-cardinality key needs
  * the full key set on one reducer per group, while an HLL register array
  * is a few KB, merges associatively map-side, and turns the job
  * scan-bound; same story for exact percentiles (full sort per group) vs a
  * t-digest. The reference has no distinct-count or quantile surface at
  * all (SURVEY §2.6) — this is the scale path for the capabilities
  * `h_distinct_agg`/`h_quantiles` implement exactly.
  *
  * Oracle strategy: a sketch's raw estimate is engine-specific, so the
  * DuckDB twin cannot hash-match it. What IS portable is the sketch's
  * CONTRACT: the estimate must land inside its published error bound
  * around the exact truth. Each query therefore computes BOTH the exact
  * aggregate (oracle-checkable) and the in-engine sketch, and emits the
  * exact value plus a bound-check flag the oracle pins to `true` — a
  * differential test of the sketch against exact truth that runs on every
  * driver round, not just in the unit suite. The flag is deterministic:
  * Spark's HLL++ and t-digest are hash/order-independent for fixed data,
  * and the margins below are ≥3× the configured error.
  */
object Sketches {

  /** Relative-error target handed to `approx_count_distinct` (HLL++ rsd). */
  private[graft] val hllRsd = 0.05

  /** Accuracy handed to `approx_percentile`: rank error ≤ 1/accuracy. */
  private[graft] val tdigestAccuracy = 1000

  /** HLL++ distinct users per event type vs the exact count. `hll_ok` pins
    * the estimate within 3×rsd of truth (observed error on uniform keys is
    * ≪ rsd; 3× makes the flag stable while still failing on a broken
    * sketch). Plan: the DIFFERENTIAL query pays the exact side's two-phase
    * distinct (pre-aggregate on (type, key), exchange, merge — that cost is
    * the point of computing truth alongside); the HLL side rides it as
    * `partial_approx_count_distinct` register arrays merged map-side from
    * the first phase on. The production form drops `n_exact` and is a
    * single register-only exchange at any key cardinality — the shape
    * `PlanShapeSpec` pins. */
  def hllDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), hllRsd).as("n_hll"))
      .select(
        col("event_type"), col("n_exact"),
        (abs(col("n_hll") - col("n_exact")) <=
          lit(3 * hllRsd) * col("n_exact")).as("hll_ok"))

  /** t-digest median per lineitem return flag vs the exact interpolated
    * percentile pair bracketing it. `approx_percentile` returns an element
    * of the input multiset whose RANK is within n/accuracy of the target;
    * with accuracy=1000 the ±5-percentile exact bracket is ≥50× the
    * guaranteed rank error, so `td_ok` is stable and still meaningful.
    * The exact median is emitted in the `h_quantiles` centi-unit form. */
  def tdigestQuantile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("CAST(round(percentile(l_quantity, 0.5) * 100) AS BIGINT)").as("p50_qty_c"),
        expr(s"approx_percentile(l_quantity, 0.5, $tdigestAccuracy)").as("td"),
        expr("percentile(l_quantity, 0.45)").as("lo"),
        expr("percentile(l_quantity, 0.55)").as("hi"))
      .select(
        col("l_returnflag"), col("p50_qty_c"),
        (col("td") >= col("lo") && col("td") <= col("hi")).as("td_ok"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_sketch_distinct" -> hllDistinct,
    "x_sketch_quantile" -> tdigestQuantile)

  /** The oracle computes the exact side and pins each bound flag to true —
    * DuckDB cannot reproduce the sketch, but it can (exactly) reproduce the
    * truth the sketch is contractually tied to. */
  val oracle: Map[String, String] = Map(
    "x_sketch_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS hll_ok
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1""".stripMargin,
    "x_sketch_quantile" ->
      """SELECT l_returnflag,
        |       CAST(round(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS p50_qty_c,
        |       true AS td_ok
        |FROM lineitem GROUP BY 1""".stripMargin)
}
