package graft

import graft.ops.Parse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DLEvt(event_id: Option[Long], ts: Option[java.sql.Timestamp],
    user_id: Option[Long], event_type: Option[String], value: Option[Double])

/** The streaming dead-letter rollup on inputs the sf fixtures can't express
  * (they contain no nulls): multi-reason classification with first-null-wins
  * precedence, counts accumulating ACROSS micro-batches in update mode. */
class DeadLetterStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-reason counts accumulate across micro-batches with first-null precedence") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DLEvt]
    val agg = Parse.deadLetterRollup(
      in.toDF().withColumn("reason", Parse.deadLetterReason))
    val q = agg.writeStream.format("memory").queryName("dl_t")
      .outputMode("complete").start()
    def stateOf(): Map[String, (Long, Option[Long], Option[Long])] =
      spark.table("dl_t")
        .select($"reason", $"n_rows", $"min_event_id", $"max_event_id")
        .as[(String, Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    try {
      val t = ts("2026-01-01 00:00:00")
      in.addData(
        DLEvt(Some(1L), Some(t), Some(10L), Some("click"), Some(1.0)),     // ok
        DLEvt(None, None, Some(10L), Some("click"), Some(1.0)),            // null_event_id (wins over null ts)
        DLEvt(Some(3L), None, Some(10L), Some("click"), Some(1.0)))        // null_ts
      q.processAllAvailable()
      assert(stateOf() == Map(
        "ok" -> ((1L, Some(1L), Some(1L))),
        "null_event_id" -> ((1L, None, None)),
        "null_ts" -> ((1L, Some(3L), Some(3L)))))

      // Second micro-batch: existing reasons accumulate, a new one appears,
      // and min/max track across batches.
      in.addData(
        DLEvt(Some(9L), Some(t), Some(10L), Some("view"), Some(2.0)),      // ok
        DLEvt(Some(4L), Some(t), None, Some("click"), Some(1.0)))          // null_user_id
      q.processAllAvailable()
      assert(stateOf() == Map(
        "ok" -> ((2L, Some(1L), Some(9L))),
        "null_event_id" -> ((1L, None, None)),
        "null_ts" -> ((1L, Some(3L), Some(3L))),
        "null_user_id" -> ((1L, Some(4L), Some(4L)))))
    } finally q.stop()
  }
}
