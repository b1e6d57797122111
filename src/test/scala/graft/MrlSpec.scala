package graft

import graft.functions.{CosinePrefixSims, GraftFunctions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Pins for the fused prefix-cosine kernel and the Matryoshka recall eval:
  * each prefix output must be bit-equal to `cosine_sim` over the slice (the
  * DuckDB-oracle contract), the codegen path must agree with interpreted
  * eval, and the recall table's full-dimension row must be structurally
  * perfect recall. */
class MrlSpec extends SparkSpec {
  import spark.implicits._

  private def lit2(xs: Seq[Double]) = Literal.create(xs, ArrayType(DoubleType))

  private def evalPrefix(a: Seq[Double], b: Seq[Double], dims: Seq[Int]): Seq[Double] = {
    val got = CosinePrefixSims(lit2(a), lit2(b), dims).eval()
    got.asInstanceOf[ArrayData].toDoubleArray().toSeq
  }

  test("interpreted eval equals per-slice cosine at every checkpoint (bit-exact)") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
    val b = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
    val dims = Seq(2, 5, 11, 16)
    val got = evalPrefix(a, b, dims)
    dims.zipWithIndex.foreach { case (m, j) =>
      val want = graft.functions.CosineSimilarity(lit2(a.take(m)), lit2(b.take(m)))
        .eval().asInstanceOf[Double]
      assert(got(j) == want, s"prefix $m differs from sliced cosine_sim")
    }
  }

  test("checkpoints past the vector length record the full-length value") {
    val a = Seq(1.0, 2.0)
    val b = Seq(3.0, 4.0)
    val got = evalPrefix(a, b, Seq(1, 2, 8))
    assert(got(1) == got(2), "over-length checkpoint must equal full cosine")
    val full = graft.functions.CosineSimilarity(lit2(a), lit2(b)).eval().asInstanceOf[Double]
    assert(got(2) == full)
  }

  test("ragged pairs follow the per-slice contract: valid to the shorter length, null past it") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(4.0, 5.0)
    val got = CosinePrefixSims(lit2(a), lit2(b), Seq(1, 2, 3)).eval()
      .asInstanceOf[ArrayData].toObjectArray(org.apache.spark.sql.types.DoubleType)
    // m <= min length: both slices have length m — bit-equal to the sliced cosine
    (1 to 2).foreach { m =>
      val want = graft.functions.CosineSimilarity(lit2(a.take(m)), lit2(b.take(m))).eval()
      assert(got(m - 1) == want, s"checkpoint $m diverges from the sliced cosine")
    }
    // m past the shorter of two UNEQUAL vectors clamps the slices to
    // different lengths — the per-slice cosine is null, so the entry is
    assert(got(2) == null, "checkpoint past the shorter ragged side must be null")
  }

  test("dims must be strictly ascending positive") {
    intercept[IllegalArgumentException] { CosinePrefixSims(lit2(Seq(1.0)), lit2(Seq(1.0)), Seq(2, 2)) }
    intercept[IllegalArgumentException] { CosinePrefixSims(lit2(Seq(1.0)), lit2(Seq(1.0)), Seq(0, 1)) }
  }

  test("codegen path is bit-equal to per-slice cosine_sim over random data") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (1 to 64).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1), Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      $"id",
      expr("cosine_prefix(a, b, array(4, 8, 16))").as("fused"),
      array(
        expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 4))"),
        expr("cosine_sim(slice(a, 1, 8), slice(b, 1, 8))"),
        expr("cosine_sim(a, b)")).as("sliced"))
    assert(both.filter($"fused" =!= $"sliced").isEmpty)
    assert(both.filter($"fused".isNull).isEmpty)
  }

  test("mrlRecall: full-dimension row is perfect recall, shorter prefixes bounded") {
    val out = ops.Similarity.mrlRecall(spark, sf)
      .select($"m", $"n_common", $"n_truth", $"recall_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == ops.Similarity.mrlDims.map(_.toLong))
    val full = out.last
    assert(full._2 == full._3 && full._4 == 10000L,
      "full-dimension ranking must recall itself perfectly")
    out.foreach { case (m, common, truth, bp) =>
      assert(common >= 0 && common <= truth, s"m=$m common out of range")
      assert(bp >= 0 && bp <= 10000, s"m=$m recall_bp out of range")
    }
  }
}
