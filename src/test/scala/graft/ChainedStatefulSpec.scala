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

  test("chain recovers BOTH state stores across a mid-ingest restart") {
    // Events split by TIME (first half ≤ midpoint): the second half arrives
    // while the query is down, so nothing is late under the recovered
    // watermark, run 1 emits only windows its watermark closed, and run 2
    // must finish the rest from recovered dedup + aggregation state —
    // append-mode exactly-once across a restart, two stores in one query.
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-chain-restart-").toFile.getAbsolutePath
    val src = s"$scratch/src"
    val ev = Tables.events(spark, sf)
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"))
    val Array(loUs, hiUs) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val midUs = loUs + (hiUs - loUs) / 2

    ev.filter(unix_micros(col("ts")) <= midUs)
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      def half = spark.readStream.schema(schema).parquet(src)
      val q = half.union(half)
        .withWatermark("ts", "0 seconds")
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n_events"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          graft.streaming.UpsertSink.writeBatch(b, id, s"$scratch/sink"))
        .start()
      q.awaitTermination()
    }
    run() // drains the first half, emits only watermark-closed windows
    ev.filter(unix_micros(col("ts")) > midUs)
      .coalesce(1).write.mode("append").parquet(src)
    run() // restart: recovered watermark + both stores, only the new file

    val streamed = graft.streaming.UpsertSink
      .resolve(spark, s"$scratch/sink", Seq("window_start_us", "event_type"))
      .select(col("window_start_us"), col("event_type"), col("n_events"))
      .collect().toSet
    val wmUs = hiUs / 1000 * 1000
    val batch = ev
      .select(expr("(unix_micros(ts) div 600000000) * 600000000").as("window_start_us"),
        col("event_type"))
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("window_start_us") + 600000000L <= wmUs)
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
