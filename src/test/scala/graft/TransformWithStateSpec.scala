package graft

import org.apache.spark.sql.functions._

/** `transformWithState` (Spark 4's arbitrary-state API) must reproduce the
  * batch aggregate after a bounded replay, and must not leak its RocksDB
  * state-store requirement into the shared session. */
class TransformWithStateSpec extends SparkSpec {

  test("running totals via transformWithState equal the batch aggregate (sf0.001)") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(confKey)
    val streamed = streaming.RunningTotals.streamedRunningTotals(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_c_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch, "transformWithState totals diverged from batch")
    assert(spark.conf.getOption(confKey) === before,
      "state-store provider conf leaked into the shared session")
  }
}
