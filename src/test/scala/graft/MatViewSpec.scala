package graft

import graft.ops.MatView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance's one theorem: merging partial states is
  * indistinguishable from recomputing — on the driver fixture (against the
  * same full recompute the oracle runs) and on adversarial slicings of a
  * synthetic corpus (empty delta, everything-delta, singleton delta), where
  * the fold must degrade to passthrough without special-casing. */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic events: 3 types × 4 days × mixed users, values chosen so
    * min/max/avg differ per group. */
  private lazy val ev = spark.range(600).select(
    col("id").as("event_id"),
    expr("timestamp '2024-03-01 00:00:00' + make_interval(0, 0, 0, CAST(id % 4 AS INT), 0, 0, id)").as("ts"),
    (col("id") % 37).as("user_id"),
    concat(lit("t"), col("id") % 3).as("event_type"),
    (col("id") % 101 * 0.37 + 0.01).as("value"),
    lit("{}").as("props"))

  /** Mergeable measures + the sketch estimate, comparable across plans. */
  private def flat(states: DataFrame): Set[(String, String, Long, Long, Long, Long, Long)] =
    states.select(
      col("event_type"), col("day").cast("string"), col("n"), col("sum_vc"),
      col("min_vc"), col("max_vc"),
      expr("CAST(round(hll_sketch_estimate(users_hll)) AS BIGINT)"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet

  test("merge(state(base), state(delta)) == state(all) under adversarial slicings") {
    val whole = flat(MatView.state(ev))
    // slice predicates: ~half, empty delta, everything delta, singleton delta
    val slicers: Seq[org.apache.spark.sql.Column] = Seq(
      col("event_id") % 2 === 0,
      lit(false),
      lit(true),
      col("event_id") === 17)
    slicers.foreach { isDelta =>
      val merged = flat(MatView.mergeStates(
        MatView.state(ev.filter(!isDelta)), MatView.state(ev.filter(isDelta))))
      assert(merged == whole, s"merge != recompute for delta slice $isDelta")
    }
  }

  test("histogram quantile: merge == recompute; estimate within one bucket of the true median") {
    val whole = MatView.histState(ev)
    val wholeSet = whole.as[(String, Long, Long)].collect().toSet
    Seq(col("event_id") % 2 === 0, lit(false), col("event_id") === 17)
      .foreach { isDelta =>
        val merged = MatView.mergeHist(
          MatView.histState(ev.filter(!isDelta)),
          MatView.histState(ev.filter(isDelta)))
          .as[(String, Long, Long)].collect().toSet
        assert(merged == wholeSet, s"hist merge != recompute for $isDelta")
      }
    // accuracy: the midpoint estimate sits within one bucket width (x100
    // cents) of the interpolated true median, per type
    val est = MatView.histMedian(whole)
      .select(col("event_type"), col("p50_est_c"))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5) * 100").as("p50_c"))
      .as[(String, Double)].collect().toMap
    exact.foreach { case (t, p50c) =>
      assert(math.abs(est(t) - p50c) <= MatView.histW * 100L,
        s"estimate ${est(t)} vs exact $p50c for $t") }
    // fixture run: oracle-shaped output is non-empty and n totals match
    val out = MatView.mvQuantile(spark, sf)
      .select(col("event_type"), col("n")).as[(String, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._2).sum == Tables.events(spark, sf).count())
  }

  test("fixture refresh matches the full recompute and holds hll_ok") {
    val out = MatView.mvRefresh(spark, sf)
    val got = out.select(col("event_type"), col("day").cast("string"),
      col("n"), col("sum_vc"), col("min_vc"), col("max_vc"), col("avg_vc"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_vc"),
        min(expr("CAST(round(value * 100) AS BIGINT)")).as("min_vc"),
        max(expr("CAST(round(value * 100) AS BIGINT)")).as("max_vc"))
      .select(col("event_type"), col("day").cast("string"), col("n"),
        col("sum_vc"), col("min_vc"), col("max_vc"),
        floor(col("sum_vc").cast("double") / col("n")).cast("bigint"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(out.filter(!col("hll_ok")).count() == 0)
    assert(out.filter(col("n_users") <= 0).count() == 0)
  }
}
