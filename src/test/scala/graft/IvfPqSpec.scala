package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-5 additions: IVF-PQ asymmetric-distance search,
  * LSH-candidate exact-Jaccard verification, and streaming exact dedup. */
class IvfPqSpec extends SparkSpec {

  test("ivfpq top-k: ranks contiguous from 1, neighbors come from the query's IVF list") {
    val res = ops.Similarity.queries("x_sim_topk_ivfpq")(spark, sf)
      .join(Tables.embeddings(spark, sf).select(col("vec_id").as("neighbor_id"), col("label")),
        "neighbor_id")
      .join(Tables.embeddings(spark, sf)
          .select(col("vec_id").as("query_id"), col("label").as("qlabel")),
        "query_id")
      .collect()
    assert(res.nonEmpty)
    // IVF routing: every returned neighbor shares the query's coarse cell
    assert(res.forall(r =>
      r.getAs[Number]("label").longValue == r.getAs[Number]("qlabel").longValue))
    val ranks = res.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")))
      .groupBy(_._1).values.map(_.map(_._2).sorted.toSeq)
    ranks.foreach(rs => assert(rs == (1L to rs.length)))
  }

  test("ivfpq scan joins the corpus against a BROADCAST lut — no corpus-side shuffle join") {
    val plan = ops.Similarity.queries("x_sim_topk_ivfpq")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast LUT join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$plan")
  }

  test("lsh_verified exact Jaccard matches a brute-force shingle-set computation") {
    import spark.implicits._
    val verified = ops.Dedup.queries("x_dedup_lsh_verified")(spark, sf)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b").as[(Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(verified.nonEmpty)
    // independent recomputation: explode shingles, count intersections per pair
    val shingles = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))))")).as("sh"))
    val counts = shingles.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val byDoc = shingles.as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    verified.foreach { case (a, b, inter, na, nb) =>
      assert(na == counts(a) && nb == counts(b))
      assert(inter == (byDoc(a) & byDoc(b)).size.toLong, s"pair ($a,$b)")
    }
  }

  test("streaming dedup of the doubled source recovers each event exactly once") {
    val out = streaming.EventPipeline.streamedDedup(spark, sf)
    val n = out.count()
    val expected = Tables.events(spark, sf)
      .filter(col("event_id").isNotNull && col("ts").isNotNull).count()
    assert(n == expected)
    assert(out.select("event_id").distinct().count() == n)
  }
}
