package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (the "one user is 10% of traffic"
  * problem): a single hot key funnels all its rows to one reducer, so the
  * stage runs at the speed of that straggler. Salting splits each key into
  * `salts` sub-groups for a first-stage aggregation, then merges the partial
  * results — both stages shuffle, but no reducer ever sees more than
  * ~1/salts of a hot key's rows.
  *
  * Only algebraic (mergeable) aggregates can be rewritten this way — sum,
  * count, min, max — which is also why Spark's own partial aggregation and
  * AQE skew-join splitting work the same way. The rewrite is exact: results
  * are identical to the direct groupBy, just computed on a flattened
  * distribution.
  */
object Skew {

  /** `df.groupBy(key).agg(sum(value))`, salted. The salt is derived from
    * `monotonically_increasing_id` — evenly spread, no RNG, and merged away
    * by the second stage so the result is deterministic. */
  def saltedSum(df: DataFrame, key: String, value: Column, out: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))

  /** `df.groupBy(key).count()`, salted. */
  def saltedCount(df: DataFrame, key: String, out: String, salts: Int = 16): DataFrame =
    saltedSum(df, key, lit(1L), out, salts)
}
