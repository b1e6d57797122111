package graft

import graft.functions.{CosinePrefixSims, CosineSimilarity, GraftFunctions}
import graft.plans.FusePrefixCosines
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Slice
import org.apache.spark.sql.functions._

/** The kernel-fusion optimizer rule: several per-slice cosines over one
  * vector pair must collapse into one `cosine_prefix` call, results must
  * stay bit-identical to the unfused plan, and shapes outside the
  * contract (single depth, different pairs, non-literal bounds) must be
  * left alone. */
class PlanFusionSpec extends SparkSpec {
  import spark.implicits._

  /** Parquet-backed pair frame — a local Seq would be collapsed into a
    * LocalRelation by ConvertToLocalRelation before the fusion rule's
    * output could be observed in the optimized plan. */
  private def vectors: DataFrame = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"),
        expr("transform(reverse(embedding), x -> CAST(x AS DOUBLE))").as("b"))
  }

  private def withRule[T](body: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ FusePrefixCosines
    try body finally spark.experimental.extraOptimizations = before
  }

  private def slicedCosines(df: DataFrame): DataFrame = df.select(
    $"id",
    expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 4))").as("c4"),
    expr("cosine_sim(slice(a, 1, 8), slice(b, 1, 8))").as("c8"),
    expr("cosine_sim(slice(a, 1, 16), slice(b, 1, 16))").as("c16"))

  private def countNodes(df: DataFrame, pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Int =
    df.queryExecution.optimizedPlan.expressions.map(_.collect { case e if pred(e) => e }.size).sum

  test("three prefix depths over one pair fuse into a shared kernel call") {
    withRule {
      val df = slicedCosines(vectors)
      assert(countNodes(df, _.isInstanceOf[CosinePrefixSims]) == 3,
        "each occurrence must read from the shared fused kernel")
      assert(countNodes(df, {
        case CosineSimilarity(_: Slice, _: Slice) => true
        case _ => false
      }) == 0, "no per-slice cosine may survive fusion")
    }
  }

  test("fused results are bit-identical to the unfused plan") {
    val unfused = slicedCosines(vectors).as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    val fused = withRule {
      slicedCosines(vectors).as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    }
    assert(fused.toSeq == unfused.toSeq, "fusion changed a result bit")
  }

  test("out-of-contract shapes are left alone") {
    withRule {
      // single depth: nothing to share, keep the simpler plan
      val single = vectors.select(expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 4))"))
      assert(countNodes(single, _.isInstanceOf[CosinePrefixSims]) == 0)
      // different pairs: (a,b) and (b,a) must not be merged
      val pairs = vectors.select(
        expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 4))"),
        expr("cosine_sim(slice(b, 1, 8), slice(a, 1, 8))"))
      assert(countNodes(pairs, _.isInstanceOf[CosinePrefixSims]) == 0)
      // mismatched depths on the two sides are not a prefix cosine
      val skew = vectors.select(
        expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 8))"),
        expr("cosine_sim(slice(a, 1, 8), slice(b, 1, 16))"))
      assert(countNodes(skew, _.isInstanceOf[CosinePrefixSims]) == 0)
    }
  }

  test("fusion preserves ragged-pair null semantics bit-for-bit") {
    // even ids: len(a)=8 vs len(b)=16 — depth 12 clamps the slices to
    // different lengths, so the per-slice cosine (and the fused entry) is
    // null; odd ids keep 16/16 and stay finite at every depth
    val ragged = vectors.select($"id",
      expr("slice(a, 1, CAST(CASE WHEN id % 2 = 0 THEN 8 ELSE 16 END AS INT))").as("a"),
      $"b")
    def q(df: DataFrame) = df.select($"id",
      expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 4))").as("c4"),
      expr("cosine_sim(slice(a, 1, 12), slice(b, 1, 12))").as("c12"))
    val unfused = q(ragged).as[(Long, Option[Double], Option[Double])].collect().sortBy(_._1)
    val fused = withRule {
      assert(countNodes(q(ragged), _.isInstanceOf[CosinePrefixSims]) == 2, "rule must fire")
      q(ragged).as[(Long, Option[Double], Option[Double])].collect().sortBy(_._1)
    }
    assert(fused.toSeq == unfused.toSeq, "fusion changed a ragged-pair result")
    assert(unfused.exists(_._3.isEmpty), "test data must exercise the null edge")
    assert(unfused.forall(_._2.nonEmpty), "depth within both lengths must stay finite")
  }

  test("full-vector cosine alongside sliced ones is preserved, sliced ones fuse") {
    withRule {
      val df = vectors.select(
        expr("cosine_sim(a, b)").as("full"),
        expr("cosine_sim(slice(a, 1, 4), slice(b, 1, 4))").as("c4"),
        expr("cosine_sim(slice(a, 1, 8), slice(b, 1, 8))").as("c8"))
      assert(countNodes(df, _.isInstanceOf[CosinePrefixSims]) == 2)
      assert(countNodes(df, {
        case CosineSimilarity(_: Slice, _: Slice) => true
        case _ => false
      }) == 0)
      assert(countNodes(df, _.isInstanceOf[CosineSimilarity]) == 1,
        "the full-vector cosine must survive untouched")
    }
  }
}
