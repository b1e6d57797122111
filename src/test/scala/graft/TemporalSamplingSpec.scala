package graft

import graft.ops.{Sampling, Temporal}
import org.apache.spark.sql.functions._

/** Edge-semantics pins for the temporal-join and sampling packs — the cases
  * the DuckDB oracle gate exercises only incidentally: as-of inclusivity and
  * the no-prior-click null, RANGE-frame boundary behavior at exactly the
  * span edge, pivot zero-fill, and quota/uniform sample determinism. */
class TemporalSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, String)*) =
    rows.toDF("event_id", "user_id", "ts_s", "event_type")
      .select($"event_id", $"user_id", to_timestamp($"ts_s").as("ts"), $"event_type")

  test("asofJoin matches the latest prior click, inclusively at equal ts") {
    val events = ev(
      (1L, "u1", "2024-01-01 10:00:00", "click"),
      (2L, "u1", "2024-01-01 10:05:00", "purchase"), // → click at 10:00
      (3L, "u1", "2024-01-01 10:06:00", "click"),
      (4L, "u1", "2024-01-01 10:06:00", "purchase"), // equal ts: inclusive → 10:06
      (5L, "u2", "2024-01-01 09:00:00", "purchase"), // no prior click → null
      (6L, "u2", "2024-01-01 09:30:00", "view"))     // other types ignored
    val out = Temporal.asofJoinEvents(events)
      .select($"event_id", $"click_ts_us", $"gap_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, c, g) => (k, (c, g)) }.toMap
    val us = (s: String) => java.sql.Timestamp.valueOf(s).getTime * 1000L
    assert(out(2L) == ((Some(us("2024-01-01 10:00:00")), Some(300000000L))))
    assert(out(4L) == ((Some(us("2024-01-01 10:06:00")), Some(0L))))
    assert(out(5L) == ((None, None)))
    assert(out.size == 3) // one row per purchase, views never surface
  }

  test("range frame includes the 5-minute boundary and same-instant clicks") {
    val events = ev(
      (1L, "u1", "2024-01-01 09:55:00", "click"),    // exactly ts-5min → in
      (2L, "u1", "2024-01-01 09:54:59", "click"),    // 1s beyond span → out
      (3L, "u1", "2024-01-01 10:00:00", "click"),    // same instant → in (peer)
      (4L, "u1", "2024-01-01 10:00:00", "purchase"),
      (5L, "u2", "2024-01-01 10:00:00", "purchase")) // no clicks → 0
    val out = Temporal.clicksBeforePurchaseEvents(events)
      .select($"event_id", $"n_recent_clicks").as[(Long, Long)].collect().toMap
    assert(out == Map(4L -> 2L, 5L -> 0L))
  }

  test("pitState attaches exactly the run containing the purchase instant") {
    val events = ev(
      (1L, "u1", "2024-01-01 09:00:00", "view"),     // run 1: view [09:00, 10:10)
      (2L, "u1", "2024-01-01 09:30:00", "view"),
      (3L, "u1", "2024-01-01 10:05:00", "purchase"), // inside run 1
      (4L, "u1", "2024-01-01 10:10:00", "click"),    // run 2: click [10:10, ∞)
      (5L, "u1", "2024-01-01 10:10:00", "purchase"), // ON the boundary → run 2 (half-open)
      (6L, "u1", "2024-01-01 11:00:00", "purchase"), // open current run → run 2
      (7L, "u2", "2024-01-01 08:00:00", "purchase"), // before any state → NULL
      (8L, "u2", "2024-01-01 09:00:00", "signup"))
    val rows = Temporal.pitStateEvents(events)
      .select($"event_id", $"state_type", $"state_run")
      .as[(Long, Option[String], Option[Long])].collect()
    assert(rows.length == 4, "one row per purchase — disjoint ranges cannot fan out")
    val out = rows.map { case (k, t, r) => (k, (t, r)) }.toMap
    assert(out(3L) == ((Some("view"), Some(1L))))
    assert(out(5L) == ((Some("click"), Some(2L)))) // valid_from inclusive, valid_to exclusive
    assert(out(6L) == ((Some("click"), Some(2L)))) // NULL-open current run matches
    assert(out(7L) == ((None, None)))              // purchase before first state: honest NULL
  }

  test("eventPivot zero-fills absent types and counts per user") {
    val events = ev(
      (1L, "u1", "2024-01-01 10:00:00", "click"),
      (2L, "u1", "2024-01-01 10:01:00", "click"),
      (3L, "u1", "2024-01-01 10:02:00", "error"),
      (4L, "u2", "2024-01-01 10:00:00", "view"))
    val out = Temporal.eventPivotEvents(events)
      .select($"user_id", $"n_click", $"n_view", $"n_purchase", $"n_signup", $"n_error")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(("u1", 2L, 0L, 0L, 0L, 1L), ("u2", 0L, 1L, 0L, 0L, 0L)))
  }

  test("cdcMergeApply: last change per key wins, D drops, I adds, others pass through") {
    val base = Seq(
      (1L, "en", "web", "keep me"),
      (2L, "en", "web", "update me"),
      (3L, "en", "web", "delete me"),
      (4L, "en", "web", "update then delete")).toDF("doc_id", "lang", "source", "text")
    val changes = Seq(
      (2L, 1L, "U", "en", "cdc", "v1"),
      (2L, 2L, "U", "en", "cdc", "v2"),     // higher seq wins
      (3L, 1L, "D", null, null, null),
      (4L, 1L, "U", "en", "cdc", "ghost"),
      (4L, 2L, "D", null, null, null),      // delete supersedes the update
      (9L, 1L, "I", "xx", "cdc", "new row")
    ).toDF("doc_id", "seq", "op", "c_lang", "c_source", "c_text")
    val got = Temporal.cdcMergeApply(base, changes)
      .select($"doc_id", $"lang", $"source", $"text_h")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def h(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Map(
      1L -> (("en", "web", h("keep me"))),
      2L -> (("en", "cdc", h("v2"))),
      9L -> (("xx", "cdc", h("new row")))))
  }

  test("quota sample caps each stratum exactly and keeps short strata whole") {
    val docs = ((1L to 10L).map(i => (i, "en", "srcA")) ++
      Seq((11L, "en", "srcB"), (12L, "en", "srcB")))
      .toDF("doc_id", "lang", "source")
    val out = Sampling.quotaSampleDocs(docs, 5)
    val byStratum = out.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(byStratum == Map("srcA" -> 5L, "srcB" -> 2L))
    // deterministic: a rerun draws the identical sample
    val again = Sampling.quotaSampleDocs(docs, 5)
    assert(out.collect().toSet == again.collect().toSet)
  }

  test("hash sample is a deterministic subset on real data") {
    val a = Sampling.hashSample(spark, sf).select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(spark, sf).select($"doc_id").as[Long].collect().toSet
    val all = Tables.documents(spark, sf).select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.subsetOf(all) && a.nonEmpty && a.size < all.size)
  }
}
