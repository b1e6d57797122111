package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** The sketch pack's contract: estimates land inside their published error
  * bounds around exact truth — checked on the driver fixture (same flags
  * the oracle pins) and on synthetic data big enough to push HLL++ out of
  * its exact sparse mode. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("both sketch queries hold their bound flags on the fixture") {
    val hll = Sketches.hllDistinct(spark, sf)
    assert(hll.filter(!col("hll_ok")).count() == 0)
    assert(hll.filter(col("n_exact") <= 0).count() == 0)
    val td = Sketches.tdigestQuantile(spark, sf)
    assert(td.filter(!col("td_ok")).count() == 0)
  }

  test("KMV: exact below k, within 3/sqrt(k) above it, deterministic across repartitions") {
    // fixture differential: groups under k distinct must report exactly
    val fix = Sketches.kmvDistinct(spark, sf)
      .select($"n_exact", $"n_kmv").as[(Long, Long)].collect()
    assert(fix.nonEmpty)
    fix.foreach { case (exact, est) =>
      if (exact < 64) assert(est == exact, s"sub-k group must be exact: $est vs $exact")
      else assert(math.abs(est - exact).toDouble / exact <= 3.0 / math.sqrt(64),
        s"KMV $est vs exact $exact out of bound") }
    // synthetic: 50k distinct keys, one group — and the estimate must be
    // byte-stable under repartitioning (pure function of the key set)
    val n = 50000L
    def pairs(parts: Int) = spark.range(n)
      .select(lit("g").as("event_type"), $"id".as("user_id"))
      .repartition(parts)
    val a = Sketches.kmvOf(pairs(3)).select($"n_kmv").as[Long].head()
    val b = Sketches.kmvOf(pairs(7)).select($"n_kmv").as[Long].head()
    assert(a == b, "KMV estimate must not depend on partitioning")
    assert(math.abs(a - n).toDouble / n <= 3.0 / math.sqrt(64),
      s"KMV $a vs exact $n out of bound")
  }

  test("HLL++ stays within 3×rsd on 200k distinct keys (dense-mode territory)") {
    val n = 200000L
    val est = spark.range(n)
      .agg(approx_count_distinct(col("id"), Sketches.hllRsd).as("e"))
      .as[Long].head()
    assert(math.abs(est - n).toDouble / n <= 3 * Sketches.hllRsd,
      s"HLL estimate $est vs exact $n exceeds 3×rsd")
  }

  test("t-digest median respects its rank bound on a skewed distribution") {
    // 10k rows of a Zipf-ish value column: rank error ≤ n/accuracy = 10.
    val df = spark.range(10000)
      .select((floor(pow(col("id") % 100 + 1, 2.0)) % 97).as("v"))
    val Array(lo, hi) = df
      .select(expr("percentile(v, 0.45)"), expr("percentile(v, 0.55)"))
      .as[(Double, Double)].head() match { case (a, b) => Array(a, b) }
    val td = df
      .select(expr(s"approx_percentile(v, 0.5, ${Sketches.tdigestAccuracy})"))
      .as[Long].head()
    assert(td >= lo && td <= hi, s"approx median $td outside exact [$lo, $hi]")
  }
}
