package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming FULL OUTER interval-join semantics the DuckDB oracle can only
  * check in aggregate — the per-side outer-row timing is ASYMMETRIC:
  * an unmatched click's null row waits for the watermark to pass the END of
  * its attribution window (click_ts + 1 h), while an unmatched purchase's
  * null row emits as soon as the watermark passes its own event time
  * (future clicks can only match purchases at-or-after the watermark). */
class FullJoinSpec extends SparkSpec {
  import spark.implicits._

  test("right-outer join: only purchases get outer rows, on the purchase-side cut") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[JEvt]
    val purchases = MemoryStream[JEvt]
    val out = EventPipeline.rightOuterJoin(clicks.toDF(), purchases.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("rj_t")
      .outputMode("append").start()
    try {
      // c1 matches p1; c2 is an unmatched CLICK (must never appear);
      // p2 (u3) is an unmatched PURCHASE (emits once its cut passes).
      clicks.addData(
        JEvt(1L, "u1", "click", ts("2026-01-01 00:00:00")),
        JEvt(2L, "u2", "click", ts("2026-01-01 00:05:00")))
      purchases.addData(
        JEvt(10L, "u1", "purchase", ts("2026-01-01 00:30:00")),
        JEvt(11L, "u3", "purchase", ts("2026-01-01 00:10:00")))
      q.processAllAvailable()
      assert(spark.table("rj_t").select($"purchase_id", $"click_id")
        .as[(Option[Long], Option[Long])].collect().toSet ==
        Set((Some(10L), Some(1L))), "only the match emits before the cut")

      // watermark 00:50 > p2's 00:10 → its null-click row emits.
      clicks.addData(JEvt(90L, "adv", "click", ts("2026-01-01 01:00:00")))
      purchases.addData(JEvt(91L, "adv", "purchase", ts("2026-01-01 01:00:00")))
      q.processAllAvailable()
      val rows = spark.table("rj_t").select($"purchase_id", $"click_id")
        .as[(Option[Long], Option[Long])].collect()
      assert(rows.count(r => r._1.contains(11L) && r._2.isEmpty) == 1,
        "expired unmatched purchase emits exactly one outer row")
      assert(!rows.exists(r => r._1.isEmpty),
        "a right-outer join must never emit a null-purchase row")
    } finally q.stop()
  }

  test("full-outer join: matches emit on join; each side's outer rows follow its own cut") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[JEvt]
    val purchases = MemoryStream[JEvt]
    val out = EventPipeline.fullOuterJoin(clicks.toDF(), purchases.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("fj_t")
      .outputMode("append").start()
    try {
      // c1 matches p1; c2 has no purchase; p2 (u3) has no click.
      clicks.addData(
        JEvt(1L, "u1", "click", ts("2026-01-01 00:00:00")),
        JEvt(2L, "u2", "click", ts("2026-01-01 00:05:00")))
      purchases.addData(
        JEvt(10L, "u1", "purchase", ts("2026-01-01 00:30:00")),
        JEvt(11L, "u3", "purchase", ts("2026-01-01 00:10:00")))
      q.processAllAvailable()
      val afterMatch = spark.table("fj_t")
        .select($"click_id", $"purchase_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(afterMatch == Set((Some(1L), Some(10L))),
        "only the match may emit in its batch; both unmatched rows are held")

      // Advance both inputs to 01:00 → watermark 00:50: past p2's event time
      // (00:10) so its null-click row emits, but NOT past c2's window end
      // (01:05) so the unmatched click stays held.
      clicks.addData(JEvt(90L, "adv", "click", ts("2026-01-01 01:00:00")))
      purchases.addData(JEvt(91L, "adv", "purchase", ts("2026-01-01 01:00:00")))
      q.processAllAvailable()
      val mid = spark.table("fj_t")
        .select($"click_id", $"purchase_id")
        .as[(Option[Long], Option[Long])].collect()
      assert(mid.count(r => r._1.isEmpty && r._2.contains(11L)) == 1,
        "expired unmatched purchase must emit exactly one null-click row")
      assert(!mid.exists(r => r._1.contains(2L) && r._2.isEmpty),
        "the unmatched click's window end is still ahead of the watermark")

      // Advance to 02:30 → watermark 02:20 passes c2's window end: its null
      // row emits; matched rows never produce outer duplicates.
      clicks.addData(JEvt(92L, "adv", "click", ts("2026-01-01 02:30:00")))
      purchases.addData(JEvt(93L, "adv", "purchase", ts("2026-01-01 02:30:00")))
      q.processAllAvailable()
      val rows = spark.table("fj_t")
        .select($"click_id", $"purchase_id")
        .as[(Option[Long], Option[Long])].collect()
      assert(rows.count(r => r._1.contains(2L) && r._2.isEmpty) == 1,
        "expired unmatched click must emit exactly one null-purchase row")
      assert(!rows.exists(r => r._1.contains(1L) && r._2.isEmpty) &&
        !rows.exists(r => r._1.isEmpty && r._2.contains(10L)),
        "matched rows must never emit outer duplicates on either side")
    } finally q.stop()
  }

  test("outer cuts are STRICT: a row exactly AT the watermark boundary is still held") {
    // Pins the `<` (not `≤`) in both oracle cuts — the sf fixtures have no
    // boundary ties, so only this test distinguishes the strictness.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[JEvt]
    val purchases = MemoryStream[JEvt]
    val out = EventPipeline.fullOuterJoin(clicks.toDF(), purchases.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("fjb_t")
      .outputMode("append").start()
    def outers = spark.table("fjb_t")
      .select($"click_id", $"purchase_id")
      .as[(Option[Long], Option[Long])].collect()
      .filter(r => r._1.isEmpty || r._2.isEmpty)
    try {
      // Unmatched on both sides: click c2 at 00:00:00 (window end 01:00:00),
      // purchase p2 (other user) at 00:50:00.
      clicks.addData(JEvt(2L, "u2", "click", ts("2026-01-01 00:00:00")))
      purchases.addData(JEvt(20L, "u3", "purchase", ts("2026-01-01 00:50:00")))
      q.processAllAvailable()

      // Advance both maxima to 01:00:00 → wm = 00:50:00 == p2's event time:
      // exactly at the boundary, p2 must still be held.
      clicks.addData(JEvt(90L, "adv", "click", ts("2026-01-01 01:00:00")))
      purchases.addData(JEvt(91L, "adv", "purchase", ts("2026-01-01 01:00:00")))
      q.processAllAvailable()
      assert(!outers.exists(_._2.contains(20L)),
        "purchase exactly at the watermark must not emit its outer row yet")

      // One millisecond past → p2 emits.
      clicks.addData(JEvt(92L, "adv", "click", ts("2026-01-01 01:00:00.001")))
      purchases.addData(JEvt(93L, "adv", "purchase", ts("2026-01-01 01:00:00.001")))
      q.processAllAvailable()
      assert(outers.count(_._2.contains(20L)) == 1,
        "one ms past the boundary the purchase outer row must emit exactly once")

      // Advance to 01:10:00 → wm = 01:00:00 == c2's window end: still held.
      clicks.addData(JEvt(94L, "adv", "click", ts("2026-01-01 01:10:00")))
      purchases.addData(JEvt(95L, "adv", "purchase", ts("2026-01-01 01:10:00")))
      q.processAllAvailable()
      assert(!outers.exists(_._1.contains(2L)),
        "click whose window end equals the watermark must not emit yet")

      // One millisecond past the window end → c2 emits.
      clicks.addData(JEvt(96L, "adv", "click", ts("2026-01-01 01:10:00.001")))
      purchases.addData(JEvt(97L, "adv", "purchase", ts("2026-01-01 01:10:00.001")))
      q.processAllAvailable()
      assert(outers.count(_._1.contains(2L)) == 1,
        "one ms past its window end the click outer row must emit exactly once")
    } finally q.stop()
  }
}
