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
