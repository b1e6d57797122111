package graft

import graft.functions.{CosineSimilarity, GraftFunctions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Semantics pins for the native `cosine_sim` expression: bit-equality with
  * the higher-order-function formulation it replaced (the DuckDB-matching
  * contract), interpreted-vs-codegen agreement, and the null/NaN edges. */
class CosineSpec extends SparkSpec {
  import spark.implicits._

  private def lit2(xs: Seq[Double]) = Literal.create(xs, ArrayType(DoubleType))

  test("interpreted eval matches a hand computation") {
    val got = CosineSimilarity(lit2(Seq(1.0, 2.0, 3.0)), lit2(Seq(4.0, 5.0, 6.0)))
      .eval().asInstanceOf[Double]
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(got == want)
  }

  test("null inputs and length mismatch yield null; zero vector yields NaN") {
    assert(CosineSimilarity(Literal.create(null, ArrayType(DoubleType)), lit2(Seq(1.0))).eval() == null)
    assert(CosineSimilarity(lit2(Seq(1.0, 2.0)), lit2(Seq(1.0))).eval() == null)
    val z = CosineSimilarity(lit2(Seq(0.0, 0.0)), lit2(Seq(1.0, 2.0))).eval().asInstanceOf[Double]
    assert(z.isNaN)
  }

  test("codegen path is bit-equal to the aggregate/zip_with formulation") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 64).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1), Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      $"id",
      expr("cosine_sim(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)" +
        " / (sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))" +
        " * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))").as("hof"))
    // bit-equality, not tolerance: same fold order must give the same double
    assert(both.filter($"native" =!= $"hof").isEmpty)
    assert(both.filter($"native".isNull).isEmpty)
  }

  test("cosine_sim accepts float arrays via implicit cast (embeddings schema)") {
    GraftFunctions.register(spark)
    val out = Tables.embeddings(spark, sf)
      .limit(8)
      .select(expr("cosine_sim(embedding, embedding)").as("self"))
      .as[Double].collect()
    // self-similarity is 1 up to rounding in the norm product
    assert(out.nonEmpty && out.forall(v => math.abs(v - 1.0) < 1e-12))
  }
}
