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

  test("KPI-grain MV: window-count merge == recompute under adversarial slicings") {
    // the sliding expansion commutes with slicing: each event contributes
    // its 2 window rows in whichever slice it lands, so partial window
    // counts merge by plain addition — including the degenerate slicings
    def kpiFlat(states: DataFrame): Set[(String, String, Long, Long)] =
      states.select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("user_id"), col("n"))
        .as[(String, String, Long, Long)].collect().toSet
    val whole = kpiFlat(MatView.kpiState(ev))
    assert(whole.nonEmpty)
    Seq(col("event_id") % 2 === 0, lit(false), lit(true), col("event_id") === 17)
      .foreach { isDelta =>
        val merged = MatView.mergeKpi(
          MatView.kpiState(ev.filter(!isDelta)), MatView.kpiState(ev.filter(isDelta)))
          .select(col("window_start").cast("string"),
            col("window_end").cast("string"), col("user_id"),
            col("total_interactions"))
          .as[(String, String, Long, Long)].collect().toSet
        assert(merged == whole, s"KPI merge != recompute for delta slice $isDelta")
      }
    // the refreshed fixture view IS the live query's relation
    val refreshed = MatView.mvKpiRefresh(spark, sf)
      .select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("user_id"),
        col("total_interactions"))
      .as[(String, String, Long, Long)].collect().toSet
    val live = graft.ops.WindowAgg.userWindows(spark, sf)
      .select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("user_id"),
        col("total_interactions"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(refreshed == live, "refreshed KPI MV diverged from the live query")
    // the reference's SECOND maintained KPI grain (event_type — r15
    // verdict #6): same definitions parameterized by key, so one
    // merge≡recompute probe + the live-query identity pin it
    val typeWhole = MatView.kpiState(ev, "event_type")
      .select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("event_type"), col("n"))
      .as[(String, String, String, Long)].collect().toSet
    val typeMerged = MatView.mergeKpi(
      MatView.kpiState(ev.filter(col("event_id") % 2 === 0), "event_type"),
      MatView.kpiState(ev.filter(col("event_id") % 2 =!= 0), "event_type"),
      "event_type")
      .select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("event_type"),
        col("total_interactions"))
      .as[(String, String, String, Long)].collect().toSet
    assert(typeMerged == typeWhole, "type-grain KPI merge != recompute")
    val typeRefreshed = MatView.mvKpiTypeRefresh(spark, sf)
      .select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("event_type"),
        col("total_interactions"))
      .as[(String, String, String, Long)].collect().toSet
    val typeLive = graft.ops.WindowAgg.typeWindows(spark, sf)
      .select(col("window_start").cast("string"),
        col("window_end").cast("string"), col("event_type"),
        col("total_interactions"))
      .as[(String, String, String, Long)].collect().toSet
    assert(typeRefreshed == typeLive,
      "refreshed type-grain KPI MV diverged from the live query")
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

  test("fixture refresh matches the full recompute; merged sketch within 9 sigma") {
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
    assert(out.filter(col("n_users") <= 0).count() == 0)
    // Sketch accuracy lives HERE, not in the hashed query output (round-14
    // lesson: a 3.1σ gate over 150 groups flips a bit-exact hash with
    // double-digit probability per sweep even when the merge is correct).
    // hllMargin = 0.15 ≈ 9σ at lgK=12 (rsd ≈ 1.6%): P(any one group out)
    // ≈ 150 · P(|Z| > 9) ≈ 1e-17 — effectively a broken-merge detector.
    val acc = MatView.hllAccuracy(spark, sf)
      .select(col("n_users").cast("double"), col("est"))
      .as[(Double, Double)].collect()
    assert(acc.nonEmpty)
    acc.foreach { case (exactN, est) =>
      assert(math.abs(est - exactN) <= MatView.hllMargin * exactN,
        s"merged HLL estimate $est beyond ${MatView.hllMargin} of exact $exactN")
    }
  }

  test("value bands: p50 row IS histMedian; cuts monotone; within a bucket of the truth") {
    val bands = MatView.valueBandsEvents(ev)
      .select(col("event_type"), col("n"), col("q_bp"), col("est_c"))
      .as[(String, Long, Long, Long)].collect()
    assert(bands.nonEmpty)
    // the q=5000 readout must BE the single-quantile view's lower median
    val p50 = MatView.histMedian(MatView.histState(ev))
      .select(col("event_type"), col("p50_est_c")).as[(String, Long)].collect().toMap
    bands.filter(_._3 == 5000L).foreach { case (t, _, _, est) =>
      assert(est == p50(t), s"band p50 diverged from histMedian for $t") }
    // estimates are monotone in the cut and within one bucket width of the
    // exact lower quantile, per type
    bands.groupBy(_._1).foreach { case (t, rows) =>
      val byCut = rows.sortBy(_._3).map(_._4).toSeq
      assert(byCut == byCut.sorted, s"band estimates not monotone for $t")
    }
    val values = ev.select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    bands.foreach { case (t, n, q, est) =>
      val vs = values(t)
      assert(n == vs.length)
      val rank = ((n * q + 9999) / 10000).toInt // ceil(n*q/1e4), 1-based
      val truthC = vs(rank - 1) * 100
      assert(math.abs(est - truthC) <= MatView.histW * 100L,
        s"band estimate $est vs exact $truthC for ($t, q=$q)")
    }
  }

  test("rollup chain: every grain equals the direct aggregation from raw events") {
    // the monoid law across grains: folding hourly states to day/week must
    // be indistinguishable from aggregating raw events at that grain —
    // ⌊⌊x/a⌋/b⌋ == ⌊x/(a·b)⌋ holds for ALL integers under FLOOR division
    // (MatView.floorDiv), which truncating `div` violates on negatives, so
    // a third of the fixture sits PRE-1970 (negative epoch micros: the
    // ADVICE-r14 truncate-vs-floor asymmetry, now exercised, not assumed);
    // the positive span covers 2 weeks / 9 days / ~150 hours so every fold
    // combines multiple finer buckets
    val evG = spark.range(600).select(
      expr("timestamp '2024-03-01 00:00:00' + make_interval(0, 0, 0, " +
        "CAST(id % 9 AS INT) - CAST(id % 3 AS INT) * 22000, " +
        "CAST(id % 17 AS INT), 0, id)").as("ts"),
      concat(lit("t"), col("id") % 3).as("event_type"),
      (col("id") % 101 * 0.37 + 0.01).as("value"))
    val chain = MatView.rollupChainEvents(evG)
      .select(col("grain"), col("event_type"), col("bucket"), col("n"),
        col("sum_vc"), col("min_vc"), col("max_vc"), col("avg_vc"))
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    // independent floor-division (double floor, not MatView.floorDiv, so
    // the expectation doesn't share the implementation's arithmetic)
    def direct(grain: String, usPerBucket: Long) = evG
      .select(col("event_type"),
        expr(s"CAST(floor(unix_micros(ts) / $usPerBucket) AS BIGINT)").as("bucket"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_vc"),
        min(col("vc")).as("min_vc"), max(col("vc")).as("max_vc"))
      .select(lit(grain).as("grain"), col("event_type"), col("bucket"),
        col("n"), col("sum_vc"), col("min_vc"), col("max_vc"),
        floor(col("sum_vc").cast("double") / col("n")).cast("bigint"))
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    val want = direct("hour", 3600000000L) ++
      direct("day", 86400000000L) ++ direct("week", 604800000000L)
    assert(chain == want)
    // the fixture must actually exercise multi-row folds at the top grain
    assert(chain.count(_._1 == "week") < chain.count(_._1 == "day"))
    assert(chain.count(_._1 == "day") < chain.count(_._1 == "hour"))
  }
}
