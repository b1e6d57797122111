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
}
