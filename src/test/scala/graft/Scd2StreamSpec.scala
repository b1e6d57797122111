package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Temporal
import graft.streaming.{Scd2Event, Scd2Stream}

/** Streaming SCD2 maintenance (`transformWithState` + event-time timers).
  * Pins: end-to-end equality with the batch SCD2 twin under the
  * closed-run watermark cut, and — on a hand-driven MemoryStream — that
  * out-of-order events fold in event order, a run emits only once the
  * watermark passes its CLOSING event, and a key with no new input still
  * folds when other keys advance the watermark (the timer re-arm). */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed SCD2 equals the batch twin's closed runs under the cut (sf0.001)") {
    val streamed = Scd2Stream.streamedScd2(spark, sf)
      .collect().map(_.toSeq).toSet

    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
    val wmUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000 * 1000
    val batch = Temporal.scd2Events(ev.filter(unix_micros(col("ts")) < wmUs))
      .filter(col("valid_to_us").isNotNull)
      .select(col("user_id"), col("run_id"), col("event_type"),
        col("valid_from_us"), col("n_events"), col("valid_to_us"))
      .collect().map(_.toSeq).toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streaming SCD2 must equal batch closed runs over the folded prefix")
  }

  test("streamed PIT enrichment equals the batch PIT join (sf0.001)") {
    val streamed = Scd2Stream.streamedPit(spark, sf).collect().map(_.toSeq).toSet
    val batch = Temporal.pitState(spark, sf)
      .filter(col("event_id").isNotNull) // the streamed form's upsert key
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "stateless stream-static PIT join must emit the full batch contract")
  }

  test("runs fold in event order and emit only when the watermark closes them") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(confKey)
    spark.conf.set(confKey, graft.streaming.EventPipeline.rocksProvider)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scd2spec-").toFile.getAbsolutePath
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val typed = mem.toDF().toDF("user_id", "ts_s", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("ts_s")).as("ts"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[Scd2Event]
    val q = Scd2Stream.runsOf(typed).toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("scd2mem")
      .start()
    def emitted(): Set[(Long, Long, String, Long, Long, Long)] =
      spark.table("scd2mem")
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    try {
      val us = (s: Long) => s * 1000000L
      // b1: u1's first two events arrive OUT of event order in one batch.
      mem.addData((1L, 1000L, 1L, "A"), (1L, 400L, 2L, "A"))
      q.processAllAvailable()
      assert(emitted().isEmpty, "nothing is closed while the run is open")
      // b2: the closing B arrives; watermark (1000s) hasn't passed it yet.
      mem.addData((1L, 1500L, 3L, "B"))
      q.processAllAvailable()
      assert(emitted().isEmpty, "the closing event itself is not yet below the watermark")
      // b3: an unrelated key drives the watermark past u1's closing event;
      // u1 gets NO new rows — only the re-armed timer can fold it.
      mem.addData((3L, 10000L, 9L, "A"))
      q.processAllAvailable()
      // b4: one more advance lets the timer from b3 observe wm=10000s.
      mem.addData((3L, 20000L, 10L, "A"))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 1L, "A", us(400), 2L, us(1500))),
        "exactly the closed run emits: A [400s,1500s) with both A events folded in order")
    } finally {
      q.stop()
      before.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    }
  }
}
