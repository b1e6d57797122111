package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class JEvt(event_id: Long, user_id: String, event_type: String,
    ts: java.sql.Timestamp)

/** Streaming left-outer interval-join semantics the DuckDB oracle can only
  * check in aggregate: matched rows emit as they join; an unmatched click's
  * null row is HELD until the global watermark (min across both inputs)
  * passes the end of its attribution window, and a matched click never
  * produces a null row even after expiry. */
class LeftJoinSpec extends SparkSpec {
  import spark.implicits._

  test("left-outer join: matches emit on join, outer rows only on watermark expiry") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[JEvt]
    val purchases = MemoryStream[JEvt]
    val out = EventPipeline.leftOuterJoin(clicks.toDF(), purchases.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("lj_t")
      .outputMode("append").start()
    try {
      // c1 matches p1 inside the 1 h window; c2 has no purchase.
      clicks.addData(
        JEvt(1L, "u1", "click", ts("2026-01-01 00:00:00")),
        JEvt(2L, "u2", "click", ts("2026-01-01 00:05:00")))
      purchases.addData(JEvt(10L, "u1", "purchase", ts("2026-01-01 00:30:00")))
      q.processAllAvailable()
      val afterMatch = spark.table("lj_t")
        .select($"click_id", $"purchase_id", $"gap_us")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(afterMatch == Set((1L, Some(10L), Some(30L * 60 * 1000000))),
        "the match must emit in its batch; the unmatched click must still be held")

      // Advance BOTH event times to 02:00 → global watermark 01:50 passes
      // c2's window end (01:05): exactly one null row for c2 emits, and the
      // matched c1 must NOT gain one.
      clicks.addData(JEvt(90L, "adv", "click", ts("2026-01-01 02:00:00")))
      purchases.addData(JEvt(91L, "adv", "purchase", ts("2026-01-01 02:00:00")))
      q.processAllAvailable()
      val rows = spark.table("lj_t")
        .select($"click_id", $"purchase_id").as[(Long, Option[Long])].collect()
      assert(rows.count(r => r._1 == 2L && r._2.isEmpty) == 1,
        "expired unmatched click must emit exactly one null row")
      assert(!rows.exists(r => r._1 == 1L && r._2.isEmpty),
        "a matched click must never emit a null row")
    } finally q.stop()
  }
}
