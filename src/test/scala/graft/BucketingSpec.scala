package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-location story: tables bucketed on the join key join with
  * ZERO exchanges — the shuffle is paid once at write time and amortized over
  * every subsequent join. This is the layout a lakehouse deployment of this
  * engine would use for the orders⋈lineitem family of queries. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without an Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so the assert targets bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(spark, sf)
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      // exact integer sum so bucketed and plain plans cannot drift on FP order
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy("o_orderpriority").agg(sum($"l_quantity".cast("long")).as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must need no shuffle; the only exchange allowed is
      // the 5-group aggregation on top
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected at most the post-join agg exchange, got $exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin"), "bucketed join should be sort-merge")
      // and it computes the same result as the plain parquet join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
        .groupBy("o_orderpriority").agg(sum($"l_quantity".cast("long")).as("qty"))
        .as[(String, Long)].collect().toMap
      assert(joined.as[(String, Long)].collect().toMap == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("positional postings bucketed by doc_id intersect phrases without a join shuffle") {
    // The persisted-index layout for the phrase workload
    // (Search.phraseIndexSearch): positional postings written once,
    // bucketed on doc_id, make the consecutive-position self-join
    // co-located — the shuffle is paid at index-build time and amortized
    // over every phrase query. The adjacency check is written as a
    // residual condition (r_pos - pos = 1) so the equi key is doc_id
    // alone, exactly the bucket key.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_postings")
      Tables.documents(spark, sf)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "token")))
        .filter(length($"token") > 0)
        .select($"doc_id", $"token", ($"p0" + 1).cast("long").as("pos"))
        .write.bucketBy(4, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_postings")
      val post = spark.table("b_postings")
      // deterministic phrase: the corpus's top bigram, recomputed in-driver
      val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
      val (w1, w2) = texts.flatMap(_.split(" ", -1).sliding(2).collect {
          case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        })
        .groupBy(identity).map { case (p, g) => (p, g.length) }
        .toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
      val left = post.filter($"token" === w1)
        .select($"doc_id", $"pos")
      val right = post.filter($"token" === w2)
        .select($"doc_id".as("r_doc"), $"pos".as("r_pos"))
      val m = left.join(right,
          $"doc_id" === $"r_doc" && $"r_pos" - $"pos" === 1)
        .groupBy($"doc_id").agg(count(lit(1)).as("n_occ"), min($"pos").as("first_pos"))
      val plan = m.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1,
        s"expected at most the post-join agg exchange, got $exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"bucketed join should be sort-merge:\n$plan")
      // equals the engine's broadcast-pruned intersection for this phrase
      val got = m.as[(Long, Long, Long)].collect().toSet
      val want = graft.ops.Search.phraseIndexSearch(spark, sf)
        .filter($"w1" === w1 && $"w2" === w2)
        .select("doc_id", "n_occ", "first_pos")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, "bucketed intersection diverged from the engine form")
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_postings")
    }
  }
}
