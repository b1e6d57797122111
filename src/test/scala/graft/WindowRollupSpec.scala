package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventPipeline

/** Chained window aggregations (`streamedWindowRollup`): 10-minute
  * tumbling counts re-rolled into 1-hour tumbling peak/total in one
  * streaming query. Pins batch-twin equality under the append-mode
  * watermark cut, including that `window(col("window"), "1 hour")`
  * nests aligned tumbling windows exactly (hour = floor(inner_start/1h)).
  */
class WindowRollupSpec extends SparkSpec {

  test("window→window chain equals the batch rollup under the watermark cut") {
    val streamed = EventPipeline.streamedWindowRollup(spark, sf).collect().toSet

    val ev = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
    val wmUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000 * 1000
    val batch = ev
      .select(expr("(unix_micros(ts) div 600000000) * 600000000").as("ws"),
        col("event_type"))
      .groupBy(col("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(expr("(ws div 3600000000) * 3600000000").as("hour_start_us"),
        col("event_type"), col("n"))
      .groupBy(col("hour_start_us"), col("event_type"))
      .agg(max(col("n")).as("peak_10m"), sum(col("n")).as("n_events"))
      .filter(col("hour_start_us") + 3600000000L <= wmUs)
      .collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
