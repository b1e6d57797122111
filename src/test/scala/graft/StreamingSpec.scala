package graft

import java.nio.file.Files

import graft.ops.WindowAgg
import graft.streaming.{EventPipeline, KafkaBridge, LagMonitor, RateEvents, Shutdown, UpsertSink}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Evt(user_id: String, event_type: String, ts: java.sql.Timestamp)

/** Structured Streaming semantics (SURVEY §2.2 C5–C10, §5.2 items 2+4):
  * append-mode emit-on-watermark-close, late-data drop, upsert-sink
  * idempotency under replay, and the streaming-vs-batch golden equivalence.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  // ---------------------------------------------------------------- C5 + C9

  test("append mode emits a window only after the watermark passes its end; late rows drop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Evt]
    val out = EventPipeline.windowCounts(ms.toDF(), "user_id", watermark = Some("10 minutes"))
    val q = out.writeStream.format("memory").queryName("append_t")
      .outputMode("append").start()
    try {
      // Batch 0: watermark is unset — nothing can close, nothing emits.
      ms.addData(Evt("u1", "click", ts("2026-01-01 00:07:00")))
      q.processAllAvailable()
      assert(spark.table("append_t").isEmpty,
        "no window may emit before the watermark passes its end")

      // Advance event time to 01:00 → watermark becomes 00:50: u1's windows
      // [00:00,00:10) and [00:05,00:15) close and must emit exactly once.
      ms.addData(Evt("adv1", "click", ts("2026-01-01 01:00:00")))
      ms.addData(Evt("adv2", "click", ts("2026-01-01 01:00:01")))
      q.processAllAvailable()
      val afterClose = spark.table("append_t")
        .filter($"user_id" === "u1")
        .select("window_start", "window_end", "user_id", "total_interactions")
        .collect().toSet
      assert(afterClose == Set(
        Row(ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u1", 1L),
        Row(ts("2026-01-01 00:05:00"), ts("2026-01-01 00:15:00"), "u1", 1L)))

      // A row older than the watermark (00:20 < 00:50) is dropped: its
      // windows already closed and it must never surface, even after the
      // watermark advances again.
      ms.addData(Evt("u_late", "click", ts("2026-01-01 00:20:00")))
      ms.addData(Evt("adv3", "click", ts("2026-01-01 02:00:00")))
      ms.addData(Evt("adv4", "click", ts("2026-01-01 02:00:01")))
      q.processAllAvailable()
      assert(spark.table("append_t").filter($"user_id" === "u_late").isEmpty,
        "late row behind the watermark must be dropped (C5)")
      // and u1's closed windows were not re-emitted (append = exactly once)
      assert(spark.table("append_t").filter($"user_id" === "u1").count() == 2)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dupes inside the horizon drop, evicted ids may re-emit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Evt]
    val out = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      // Two arrivals of the same id within the horizon: exactly one emits.
      ms.addData(Evt("a", "click", ts("2026-01-01 00:00:00")))
      q.processAllAvailable()
      ms.addData(Evt("a", "view", ts("2026-01-01 00:05:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").filter($"user_id" === "a").count() == 1,
        "duplicate inside the watermark horizon must drop")

      // Advance the watermark past a's expiry (00:10) → its dedup state is
      // evicted; a re-arrival with a fresh event time emits AGAIN. That leak
      // is the contract: state is bounded by the horizon, and the horizon is
      // the dedup guarantee — not stream-lifetime uniqueness.
      ms.addData(Evt("adv", "click", ts("2026-01-01 01:00:00")))
      q.processAllAvailable()
      ms.addData(Evt("a", "purchase", ts("2026-01-01 01:05:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_wm").filter($"user_id" === "a").count() == 2,
        "an id re-arriving after its state was evicted re-emits (bounded state)")
    } finally q.stop()
  }

  // ------------------------------------------------------------------- S3/S6

  test("upsert sink is idempotent under micro-batch replay and last-write-wins per key") {
    val dir = tmp("graft-upsert-")
    val keys = Seq("window_start", "window_end", "user_id")
    val b0 = Seq(
      (ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u1", 1L),
      (ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u2", 3L))
      .toDF("window_start", "window_end", "user_id", "total_interactions")
    UpsertSink.writeBatch(b0, 0, dir)
    // replay of batch 0 (crash-recovery path) — must leave the sink unchanged
    UpsertSink.writeBatch(b0, 0, dir)
    val once = UpsertSink.resolve(spark, dir, keys).collect().toSet
    assert(once == b0.collect().toSet)

    // batch 1 upserts u1's count and adds u3: last write wins, u2 untouched
    val b1 = Seq(
      (ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u1", 5L),
      (ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u3", 2L))
      .toDF("window_start", "window_end", "user_id", "total_interactions")
    UpsertSink.writeBatch(b1, 1, dir)
    val merged = UpsertSink.resolve(spark, dir, keys)
      .as[(java.sql.Timestamp, java.sql.Timestamp, String, Long)]
      .collect().map(r => r._3 -> r._4).toMap
    assert(merged == Map("u1" -> 5L, "u2" -> 3L, "u3" -> 2L))
  }

  // ----------------------------------------------------- golden (SURVEY §5.2.4)

  test("golden: streamed KPI table equals the batch formulation (sf0.001)") {
    val streamed = EventPipeline.streamedWindows(spark, sf, "user_id").collect().toSet
    val batch = WindowAgg.userWindows(spark, sf)
      .select("window_start", "window_end", "user_id", "total_interactions")
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streaming execution must produce exactly the batch result")
  }

  // -------------------------------------------------------------------- C10

  test("multi-query fan-out: user and type KPI queries run concurrently from one lineage") {
    val base = tmp("graft-fanout-")
    val qs = EventPipeline.startBoth(spark, sf, base)
    try qs.foreach(_.awaitTermination())
    finally qs.foreach(_.stop())
    val user = UpsertSink.resolve(spark, s"$base/user_id/sink",
      Seq("window_start", "window_end", "user_id"))
    val typ = UpsertSink.resolve(spark, s"$base/event_type/sink",
      Seq("window_start", "window_end", "event_type"))
    assert(user.count() > 0 && typ.count() > 0)
    assert(typ.select("event_type").distinct().count() <= 10)
  }

  // ------------------------------------------------------------------ P1/P2

  test("rate-source producer synthesizes the reference event schema deterministically") {
    val shaped = RateEvents.shape(Seq(
      (ts("2026-01-01 00:00:00"), 0L),
      (ts("2026-01-01 00:00:01"), 1L),
      (ts("2026-01-01 00:00:02"), 7L)).toDF("timestamp", "value"))
    assert(shaped.columns.toSeq == Seq("user_id", "item_id", "interaction_type", "ts"))
    val rows = shaped.as[(String, String, String, java.sql.Timestamp)].collect()
    assert(rows(0) == (("user_1", "item_8", "click", ts("2026-01-01 00:00:00"))))
    assert(rows(1)._1 == "user_7920" && rows(1)._3 == "view")
    assert(rows.forall(r => r._1.startsWith("user_") && r._2.startsWith("item_")))
    assert(rows.forall(r => RateEvents.interactionTypes.contains(r._3)))
    // and it actually runs as a stream
    val q = EventPipeline.windowCounts(RateEvents.stream(spark, rowsPerSecond = 500),
        "user_id", watermark = Some("10 minutes"))
      .writeStream.format("noop").outputMode("update").start()
    try {
      q.processAllAvailable()
      assert(q.isActive)
    } finally q.stop()
  }

  // -------------------------------------------------------------------- C11

  test("lag monitor parses both offset shapes and clamps at zero") {
    assert(LagMonitor.partitionLags(
      """{"t":{"0":100,"1":50}}""", """{"t":{"0":90,"1":60}}""") ==
      Map("t/0" -> 10L, "t/1" -> 0L))
    // partition absent from processed = fully lagging
    assert(LagMonitor.partitionLags("""{"t":{"0":5}}""", """{}""") == Map("t/0" -> 5L))
    // file-source scalar shape
    assert(LagMonitor.partitionLags("""{"logOffset":7}""", """{"logOffset":4}""") ==
      Map("logOffset" -> 3L))
    // malformed input degrades to empty, not an exception (consumer.py:231-236)
    assert(LagMonitor.parseOffsets("not json") == Map.empty)
  }

  test("lag monitor listener observes batches of a live query") {
    val listener = new LagMonitor.Listener(_ => ())
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[Evt]
      ms.addData(Evt("u1", "click", ts("2026-01-01 00:07:00")))
      val q = EventPipeline.windowCounts(ms.toDF(), "user_id", Some("10 minutes"))
        .writeStream.format("noop").outputMode("update").start()
      try {
        q.processAllAvailable()
        // listener bus is async — poll briefly
        val deadline = System.nanoTime() + 10e9.toLong
        while (listener.batchesSeen < 1 && System.nanoTime() < deadline) Thread.sleep(50)
        assert(listener.batchesSeen >= 1)
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }

  // -------------------------------------------------------------------- C12

  test("graceful shutdown stops every active query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Evt]
    val q = EventPipeline.windowCounts(ms.toDF(), "user_id", Some("10 minutes"))
      .writeStream.format("noop").outputMode("update").start()
    assert(spark.streams.active.nonEmpty)
    Shutdown.stopAll(spark)
    assert(spark.streams.active.isEmpty)
    assert(!q.isActive)

    // graceful variant: waits for the trigger gap, stops, and must also
    // terminate promptly on a query with pending work
    val ms2 = MemoryStream[Evt]
    ms2.addData(Evt("u1", "click", ts("2026-01-01 00:00:01")))
    val q2 = EventPipeline.windowCounts(ms2.toDF(), "user_id", Some("10 minutes"))
      .writeStream.format("noop").outputMode("update").start()
    Shutdown.stopAllGraceful(spark, quiesceMs = 5000)
    assert(spark.streams.active.isEmpty)
    assert(!q2.isActive)
  }

  // ---------------------------------------------------------------- S1/S2/S5

  test("Kafka wire format round-trips and drops malformed rows permissively") {
    val events = Seq(
      ("user_1", "item_2", "click", ts("2026-01-01 00:07:00")),
      ("user_3", "item_4", "purchase", ts("2026-01-01 00:08:30")))
      .toDF("user_id", "item_id", "interaction_type", "timestamp")
    val wire = KafkaBridge.toWire(events)
    assert(wire.columns.toSeq == Seq("value"))
    val back = KafkaBridge.parseWire(wire)
      .as[(String, String, String, java.sql.Timestamp)].collect().toSet
    assert(back == events.as[(String, String, String, java.sql.Timestamp)].collect().toSet)

    // malformed JSON and null-field rows degrade to null then get filtered (C4)
    val dirty = Seq("not json at all", """{"user_id":"u9"}""").toDF("value")
    assert(KafkaBridge.parseWire(dirty).isEmpty)

    // reader/writer builders configure without a broker (connector is a
    // deployment dependency; .load()/.start() are intentionally not called).
    // sinkWriter needs a *streaming* frame — shape one from the rate source.
    KafkaBridge.sourceReader(spark, "broker:9092", "test-topic")
    assert(spark.conf.get("spark.sql.streaming.kafka.commitOffsetsOnStop") == "true")
    val streamingWire = KafkaBridge.toWire(RateEvents.stream(spark))
    assert(streamingWire.isStreaming)
    KafkaBridge.sinkWriter(streamingWire, "broker:9092", "test-topic", tmp("graft-kafka-ckpt-"))
  }
}
