package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution behavior the 100 TB design leans on: skewed
  * shuffle-join partitions split at runtime (the no-code-change alternative
  * to manual salting — `functions/Skew.scala` is the explicit fallback), and
  * tiny shuffle outputs coalesced instead of running one task per configured
  * partition. Asserted on the FINAL adaptive plan after execution, because
  * AQE decisions only exist post-runtime. */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // collect() drives THIS Dataset's QueryExecution (a sink write would
    // clone it, leaving df.queryExecution at the initial, pre-AQE plan)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE splits a skewed sort-merge-join partition at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // keep the join a shuffle join so skew handling (not broadcast) engages
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 200k rows, ~90% landing on key 0 = one hot shuffle partition
      val left = spark.range(200000)
        .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("key"),
          concat(lit("padpadpadpadpadpad-"), $"id").as("payload"))
      val right = spark.range(64).select($"id".as("key"), lit("dim").as("rv"))
      val plan = finalPlan(left.join(right, "key").select(count(lit(1)).as("n")))
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan:\n$plan")
    }
  }

  test("AQE coalesces undersized shuffle partitions") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true") {
      // a tiny aggregation output across the configured partition width
      val plan = finalPlan(
        spark.range(1000).groupBy(($"id" % 7).as("k")).agg(count(lit(1)).as("n")))
      assert(plan.contains("coalesced") || plan.contains("AQEShuffleRead"),
        s"expected a coalesced shuffle read in the adaptive plan:\n$plan")
    }
  }
}
