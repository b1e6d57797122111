package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming left-semi interval-join semantics the DuckDB oracle can only
  * check as a set: a click emits EXACTLY ONCE on its first match — a second
  * matching purchase (same or later micro-batch) must not re-emit it — and
  * an unmatched click never emits at all. */
class SemiJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semi join: exactly-once on first match, no re-emit, no unmatched rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[JEvt]
    val purchases = MemoryStream[JEvt]
    val out = EventPipeline.semiJoin(clicks.toDF(), purchases.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("sj_t")
      .outputMode("append").start()
    try {
      clicks.addData(
        JEvt(1L, "u1", "click", ts("2026-01-01 00:00:00")),
        JEvt(2L, "u2", "click", ts("2026-01-01 00:05:00")))
      purchases.addData(JEvt(10L, "u1", "purchase", ts("2026-01-01 00:20:00")))
      q.processAllAvailable()
      assert(spark.table("sj_t").select($"click_id").as[Long].collect().toSeq == Seq(1L),
        "first match emits the click once; the unmatched click emits nothing")

      // A second matching purchase for u1 (still inside c1's window) must
      // not re-emit c1; u2 stays unmatched forever.
      purchases.addData(JEvt(11L, "u1", "purchase", ts("2026-01-01 00:40:00")))
      q.processAllAvailable()
      val rows = spark.table("sj_t").select($"click_id").as[Long].collect().toSeq
      assert(rows == Seq(1L), s"a second match must not re-emit (got $rows)")
    } finally q.stop()
  }
}
