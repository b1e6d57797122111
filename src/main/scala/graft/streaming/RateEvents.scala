package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Producer equivalent (SURVEY §2.4 P1+P2): the reference's synthetic event
  * generator with rate limiting (`/root/reference/producer/producer.py:15-23`
  * for the event shape, `:61-85` for the paced send loop). Spark's `rate`
  * source subsumes the hand-rolled pacing — `rowsPerSecond` IS the rate
  * limiter, implemented in the engine rather than with `sleep` arithmetic.
  *
  * Column synthesis is a deterministic function of the rate source's
  * monotonic `value` (streaming transforms must be replay-stable, so no
  * `rand()`): uniform-ish user/item ids over the reference's cardinalities
  * (100k users, 10k items) and a cycling choice of the 5 interaction types.
  */
object RateEvents {

  /** `producer/producer.py:15`. */
  val interactionTypes: Seq[String] =
    Seq("click", "view", "purchase", "like", "add_to_cart")

  /** P1+P2: rate-limited synthetic stream in the §1.1 event schema. */
  def stream(s: SparkSession, rowsPerSecond: Int = 1000): DataFrame =
    shape(
      s.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString)
        .load())

  /** Deterministic event synthesis from a (`timestamp`, `value`) frame —
    * factored out so tests can drive it with a batch frame. Multipliers are
    * coprime to the moduli so ids don't correlate across columns. */
  def shape(rate: DataFrame): DataFrame =
    rate.select(
      concat(lit("user_"), pmod(col("value") * 7919, lit(100000)) + 1).as("user_id"),
      concat(lit("item_"), pmod(col("value") * 31 + 7, lit(10000)) + 1).as("item_id"),
      element_at(
        typedLit(interactionTypes),
        (pmod(col("value"), lit(5)) + 1).cast("int")).as("interaction_type"),
      col("timestamp").cast("timestamp").as("ts"))
}
