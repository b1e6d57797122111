package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventPipeline

/** Chained stateful operators — streaming dedup feeding a streaming
  * windowed aggregation in one query (`streamedDedupWindows`). Pins:
  * the chain's output equals the batch twin (windowed counts over the
  * deduped set) under the append-mode watermark cut, and the dedup stage
  * is load-bearing (the doubled input would exactly double every count
  * without it).
  */
class ChainedStatefulSpec extends SparkSpec {

  test("dedup → window agg chain equals batch windows under the watermark cut") {
    val streamed = EventPipeline.streamedDedupWindows(spark, sf).collect().toSet

    val ev = Tables.events(spark, sf)
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    // ms-floored zero-delay watermark: max event time at stream end.
    val wmUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000 * 1000
    val batch = EventPipeline
      .windowCounts(ev, "event_type", watermark = None)
      .select(unix_micros(col("window_start")).as("window_start_us"),
        unix_micros(col("window_end")).as("window_end_us"),
        col("event_type"), col("total_interactions").as("n_events"))
      .filter(col("window_end_us") <= wmUs)
      .collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "chain output must equal batch windowed counts over the deduped set " +
        "(a doubled count means the dedup stage didn't run)")
  }
}
