package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** SemDeDup's cluster count is a real tunable (r6 VERDICT #4): the n²/k
  * candidate bound only exists if k can actually vary. These tests run the
  * operator at TWO k values and differential-check each against an all-pairs
  * reference computed outside the bucketed path — if the parameter were
  * cosmetic (or the bucketing lost pairs within a cluster), the reference
  * would disagree. Also pins [[Similarity.kmeansConverged]]'s contract: the
  * returned assignment is a Lloyd fixpoint (one more step changes nothing),
  * which is the property that lets its fixed-round unrolled DuckDB oracle
  * match an early-stopping engine. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** All-pairs reference: for assignment A, a vector is dropped iff some
    * lower-id vector in the SAME cluster has cosine ≥ the threshold.
    * Computed via a plain collect-side double loop over the (tiny) sf0.001
    * corpus — deliberately not the operator's join. */
  private def referenceKept(k: Int): Map[Long, Boolean] = {
    val assign = Similarity.kmeansIter(spark, sf, k)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.map { case (id, v) =>
      id -> !vecs.exists { case (id2, v2) =>
        id2 < id && assign(id2) == assign(id) && cos(v2, v) >= 0.3
      }
    }.toMap
  }

  for (k <- Seq(3, 8)) test(s"semanticDedup at k=$k matches the all-pairs reference") {
    val out = Dedup.semanticDedup(spark, sf, k)
      .select($"vec_id", $"cluster", $"is_kept").as[(Long, Long, Boolean)].collect()
    assert(out.length == Tables.embeddings(spark, sf).count())
    assert(out.forall { case (_, c, _) => c >= 0 && c < k })
    val expected = referenceKept(k)
    out.foreach { case (id, _, kept) =>
      assert(kept == expected(id), s"vec $id kept=$kept, reference says ${expected(id)}")
    }
    // the tunable must bite: both verdicts occur
    assert(out.exists(_._3) && out.exists(!_._3))
  }

  test("k values give different clusterings — the parameter is not cosmetic") {
    val a3 = Dedup.semanticDedup(spark, sf, 3).select($"cluster").distinct().count()
    val a8 = Dedup.semanticDedup(spark, sf, 8).select($"cluster").distinct().count()
    assert(a3 <= 3 && a8 <= 8 && a3 != a8)
  }

  test("kmeansConverged returns a Lloyd fixpoint (one more step is the identity)") {
    val conv = Similarity.kmeansConverged(spark, sf)
      .select($"vec_id", $"cluster", $"dist2").as[(Long, Long, Long)].collect().toSet
    assert(conv.size == Tables.embeddings(spark, sf).count().toInt)
    // Re-run one Lloyd step seeded from the converged assignment via the
    // public surface: centroids from the converged clusters, reassign, and
    // the assignment (and dist2) must reproduce itself.
    val e = Tables.embeddings(spark, sf).select($"vec_id",
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("q"))
    val assign = conv.toSeq.map { case (id, c, _) => (id, c) }.toDF("vec_id", "cluster")
    val cents = e.join(assign, "vec_id")
      .select($"cluster", posexplode($"q").as(Seq("dim", "x")))
      .groupBy($"cluster", $"dim")
      .agg(expr("CAST(floor(CAST(sum(x) AS DOUBLE) / count(1)) AS BIGINT)").as("c"))
      .groupBy($"cluster")
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)").as("cv"))
    val stepped = e.crossJoin(broadcast(cents))
      .withColumn("dist2",
        expr("aggregate(zip_with(q, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
      .groupBy($"vec_id")
      .agg(min(struct($"dist2", $"cluster")).as("m"))
      .select($"vec_id", $"m.cluster", $"m.dist2")
      .as[(Long, Long, Long)].collect().toSet
    assert(stepped == conv, "converged assignment must be a fixpoint")
  }
}
