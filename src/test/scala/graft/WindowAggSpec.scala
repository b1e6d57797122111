package graft

import graft.ops.WindowAgg
import org.apache.spark.sql.Row

/** Sliding-window semantics (SURVEY §2.2 C6–C8): epoch-aligned 10-minute
  * windows sliding by 5 — every event lands in exactly two windows,
  * [floor(t/5m)·5m − 5m, +10m) and [floor(t/5m)·5m, +10m). */
class WindowAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(rows: Seq[(String, java.sql.Timestamp)]) =
    WindowAgg.windowsBy(rows.toDF("user_id", "ts"), "user_id")
      .select("window_start", "window_end", "user_id", "total_interactions")

  test("each event lands in exactly its two enclosing windows") {
    val out = agg(Seq(("u1", ts("2026-01-01 00:07:00")))).collect().toSet
    assert(out == Set(
      Row(ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u1", 1L),
      Row(ts("2026-01-01 00:05:00"), ts("2026-01-01 00:15:00"), "u1", 1L)))
  }

  test("events 5 minutes apart share exactly one window") {
    val out = agg(Seq(
      ("u1", ts("2026-01-01 00:07:00")),
      ("u1", ts("2026-01-01 00:12:00")))).collect().toSet
    assert(out == Set(
      Row(ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), "u1", 1L),
      Row(ts("2026-01-01 00:05:00"), ts("2026-01-01 00:15:00"), "u1", 2L),
      Row(ts("2026-01-01 00:10:00"), ts("2026-01-01 00:20:00"), "u1", 1L)))
  }

  test("boundary event belongs to [start, end) — half-open windows") {
    // exactly on a 5-minute boundary: windows starting at 00:05 and 00:10
    val out = agg(Seq(("u1", ts("2026-01-01 00:10:00")))).collect().toSet
    assert(out == Set(
      Row(ts("2026-01-01 00:05:00"), ts("2026-01-01 00:15:00"), "u1", 1L),
      Row(ts("2026-01-01 00:10:00"), ts("2026-01-01 00:20:00"), "u1", 1L)))
  }

  test("null key and null ts rows are rejected (C4)") {
    val rows = Seq(
      ("u1", ts("2026-01-01 00:07:00")),
      (null.asInstanceOf[String], ts("2026-01-01 00:07:00")))
      .toDF("user_id", "ts")
      .union(Seq(("u2", null.asInstanceOf[java.sql.Timestamp])).toDF("user_id", "ts"))
    val out = WindowAgg.windowsBy(rows, "user_id")
    assert(out.select("user_id").distinct().as[String].collect().toSeq == Seq("u1"))
    assert(out.count() == 2)
  }

  test("keys aggregate independently") {
    val out = agg(Seq(
      ("u1", ts("2026-01-01 00:07:00")),
      ("u2", ts("2026-01-01 00:07:00")),
      ("u2", ts("2026-01-01 00:08:00"))))
    val byUser = out.groupBy("user_id").sum("total_interactions")
      .as[(String, Long)].collect().toMap
    assert(byUser == Map("u1" -> 2L, "u2" -> 4L))
  }
}
