package graft

import graft.functions.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The bounded-heap top-k Aggregator must be exactly equivalent to the
  * window-function formulation `row_number() OVER (PARTITION BY g ORDER BY
  * score DESC, id ASC) <= k` — checked on randomized inputs including
  * duplicate scores (tie-break by id) and groups smaller than k. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  private val rowGen = for {
    g <- Gen.choose(0, 3)
    id <- Gen.choose(0L, 500L)
    score <- Gen.oneOf(Gen.choose(0, 20).map(_.toDouble / 4), Gen.choose(-1e9, 1e9).map(_ / 1e6))
  } yield (g.toLong, id, score)

  test("TopK aggregator ≡ row_number window on randomized inputs") {
    val prop = Prop.forAll(Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, rowGen))) { rows =>
      // one candidate per (group, id): dedup ids so ranking is well-defined
      val data = rows.distinctBy(r => (r._1, r._2))
        .toDF("query_id", "neighbor_id", "score")
      val got = TopK.topK(data, "query_id", "score", "neighbor_id", 10)
        .as[(Long, Long, Long)].collect().toSet
      val want = viaWindow(data, 10).as[(Long, Long, Long)].collect().toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("score-preserving TopK ≡ window keeping the score, on randomized inputs") {
    val prop = Prop.forAll(Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, rowGen))) { rows =>
      val data = rows.distinctBy(r => (r._1, r._2))
        .toDF("query_id", "neighbor_id", "score")
      val got = TopK.topKScored(data, "query_id", "score", "neighbor_id", 10)
        .select("query_id", "neighbor_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val want = data.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select("query_id", "neighbor_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("groups with fewer than k candidates emit all of them, ranked") {
    val data = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("query_id", "neighbor_id", "score")
    val got = TopK.topK(data, "query_id", "score", "neighbor_id", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 11L, 1L), (1L, 10L, 2L)))
  }

  test("equal scores break ties by ascending id") {
    val data = Seq((1L, 30L, 1.0), (1L, 20L, 1.0), (1L, 10L, 1.0))
      .toDF("query_id", "neighbor_id", "score")
    val got = TopK.topK(data, "query_id", "score", "neighbor_id", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 20L, 2L)))
  }

  test("dedup TopK ≡ distinct-then-TopK on duplicate-carrying inputs (the navGraph contract)") {
    // duplicates of a (group, id) pair carry EQUAL scores — the navGraph
    // precondition (score is a pure function of the pair); replication
    // count is random so dedup has real work at every heap site
    val dupGen = for {
      rows <- Gen.choose(1, 80).flatMap(n => Gen.listOfN(n, rowGen))
      reps <- Gen.listOfN(rows.length, Gen.choose(1, 4))
    } yield rows.distinctBy(r => (r._1, r._2)).zip(reps).flatMap {
      case (r, c) => List.fill(c)(r)
    }
    val prop = Prop.forAll(dupGen) { rows =>
      val data = rows.toDF("query_id", "neighbor_id", "score")
      val got = TopK.topKDistinct(data, "query_id", "score", "neighbor_id", 10)
        .as[(Long, Long, Long)].collect().toSet
      val want = TopK.topK(data.distinct(), "query_id", "score", "neighbor_id", 10)
        .as[(Long, Long, Long)].collect().toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedup TopK keeps the best-scored copy when duplicate ids differ in score") {
    // beyond the navGraph precondition: keep-best-per-id is the general
    // contract (a dropped worse copy can never re-enter — the compaction
    // monotonicity TopKOrder.bestDistinct's scaladoc states)
    val data = Seq(
      (1L, 10L, 0.2), (1L, 10L, 0.9), (1L, 10L, 0.5),
      (1L, 20L, 0.7), (1L, 30L, 0.1))
      .toDF("query_id", "neighbor_id", "score")
    val got = TopK.topKDistinct(data, "query_id", "score", "neighbor_id", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 20L, 2L)))
  }
}
