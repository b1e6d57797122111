package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventPipeline

/** Streaming decontamination (`streamedDecontam`): stream-static LEFT ANTI
  * join against a holdout set, then an unwindowed rollup. Pins batch-twin
  * equality and that the anti join is load-bearing (holdout users'
  * events are really gone, and some events were really dropped).
  */
class DecontamStreamSpec extends SparkSpec {

  test("stream-static anti join drops holdout users and matches the batch rollup") {
    val streamed = EventPipeline.streamedDecontam(spark, sf).collect().toSet

    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    val holdout = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 20 === 0).select(col("c_custkey"))
    val batch = ev
      .join(holdout, col("user_id") === col("c_custkey"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_c_sum"))
      .collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)

    // The join must actually have dropped something: the unfiltered rollup
    // is strictly larger for at least one type (sf0.001 has holdout users).
    val survivors = streamed.map(r => r.getLong(r.fieldIndex("n_events"))).sum
    val all = ev.count()
    assert(survivors < all, "holdout events should have been dropped")
  }
}
