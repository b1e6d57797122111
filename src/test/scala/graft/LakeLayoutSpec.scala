package graft

import java.nio.file.Files

import graft.functions.Skew
import org.apache.spark.sql.functions._

/** Lake-layout and skew behaviors that only matter at scale but must be
  * provably wired: partition-pruned scans on a date-partitioned layout, and
  * exactness of the salted-aggregation rewrite. */
class LakeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned lake writes prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-lake-").toFile.getAbsolutePath
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts".cast("date").as("event_date"))
    events.write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val day = events.select(min($"event_date")).as[java.sql.Date].head()
    val pruned = spark.read.parquet(dir).filter($"event_date" === lit(day))
    val plan = pruned.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(plan.contains("event_date"), "pruning predicate must reach the scan")
    // pruned read returns exactly the rows of that day
    assert(pruned.count() == events.filter($"event_date" === lit(day)).count())
    // and the scan only touched that day's directory (partition count = 1)
    val touched = pruned.select(input_file_name()).distinct()
      .as[String].collect().map(_.split("/").init.last).toSet
    assert(touched == Set(s"event_date=$day"))
  }

  test("filters and projections reach the parquet scan (PushedFilters + pruned ReadSchema)") {
    // A 2-column projection with a selective predicate must not read the
    // whole schema: the predicate shows under PushedFilters and ReadSchema
    // carries only the referenced columns — the difference between scanning
    // 2 columns and scanning 100 TB.
    val q = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderpriority")
    val full = q.queryExecution.executedPlan.toString
    assert(full.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]"),
      s"predicate must push to the scan:\n$full")
    val readSchema = full.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_orderpriority"),
      readSchema)
    assert(!readSchema.contains("o_totalprice") && !readSchema.contains("o_custkey"),
      s"unreferenced columns must prune from the read schema: $readSchema")
  }

  test("salted aggregation is exactly equivalent to the direct groupBy") {
    val events = Tables.events(spark, sf)
    val direct = events.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCount(events, "user_id", "n")
      .as[(Long, Long)].collect().toMap
    assert(salted == direct)

    val directSum = events.groupBy($"event_type").agg(sum($"user_id").as("s"))
      .as[(String, Long)].collect().toMap
    val saltedSum = Skew.saltedSum(events, "event_type", $"user_id", "s", salts = 7)
      .as[(String, Long)].collect().toMap
    assert(saltedSum == directSum)
  }

  test("zone-map pruning: linear layout prunes only its own column; normalization restores sk pruning") {
    val rows = ops.Relational.zonemapPrune(spark, sf)
      .select($"layout", $"probe_col", $"n_files", $"n_scanned", $"skip_bp")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(rows.size == 6, "three layouts x two probe columns")
    rows.foreach { case ((lay, c), (nf, ns, bp)) =>
      assert(bp >= 0 && bp <= 10000, s"$lay/$c skip_bp out of range")
      assert(ns >= 0 && ns <= nf * 8, s"$lay/$c scanned count out of range")
    }
    // a single-column sort cannot narrow the other column's zone maps
    assert(rows(("linear_pk", "sk"))._3 == 0, "linear layout must not prune sk")
    assert(rows(("linear_pk", "pk"))._3 > 0, "linear layout must prune its own column")
    // the unequal-domain fix: min-max normalization before interleaving
    // must strictly improve the narrow column over the raw Morton key
    assert(rows(("zorder_norm", "sk"))._3 > rows(("zorder", "sk"))._3,
      "normalized interleave must out-prune raw z-order on the narrow column")
    assert(rows(("zorder_norm", "pk"))._3 > 0)
  }

  test("zone-map file assignment is deterministic across executions") {
    val a = ops.Relational.zonemapPrune(spark, sf).collect().map(_.toString).sorted.toSeq
    val b = ops.Relational.zonemapPrune(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(a == b, "re-running the layout simulation changed the pruning table")
  }
}
