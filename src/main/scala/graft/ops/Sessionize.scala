package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the event stream — the standard
  * user-behavior rollup a pipeline builds on top of raw interactions (the
  * reference stops at fixed sliding windows; sessions are the natural next
  * analytics surface, and the batch twin of Spark's streaming
  * `session_window`).
  *
  * Plan shape: one shuffle on `user_id`, then a per-user ordered walk (lag →
  * gap flag → running sum) and a per-(user, session) aggregation that reuses
  * the same partitioning — Catalyst plans the window functions and the final
  * aggregate without a second exchange. At 100 TB this scales with the user
  * count: partition-local sorts, no global ordering anywhere.
  *
  * Determinism: events are ordered by (ts, event_id) within a user so ties on
  * ts cannot flip `lag`; the gap test is exact integer micros.
  */
object Sessionize {

  private val gapMicros = 30L * 60 * 1000000 // 30-minute inactivity gap

  def sessions(s: SparkSession, d: String): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_sess",
        (col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapMicros).cast("long"))
      .withColumn("sess_id", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_sessionize" -> sessions)

  val oracle: Map[String, String] = Map(
    "x_sessionize" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, ts,
         |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |flagged AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > $gapMicros
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM o),
         |numbered AS (
         |  SELECT user_id, ts,
         |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged)
         |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
         |       min(ts) AS session_start, max(ts) AS session_end,
         |       count(*) AS n_events
         |FROM numbered GROUP BY 1, 2""".stripMargin)
}
