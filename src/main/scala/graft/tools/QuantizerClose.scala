package graft.tools

import graft.ops.{IndexStore, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EPOCH CLOSE for the maintained quantizer — the write half of the
  * versioned `quantizer_state` contract ([[graft.ops.IndexStore]]):
  * fold the corpus dir's arriving split into the store's LATEST epoch
  * (exactly [[graft.ops.Similarity.quantizerUpdate]]'s merge, on the
  * mergeable (Σ, n) form) and APPEND the result as epoch e+1. Serving
  * ([[graft.ops.Similarity.standingQuantizerState]]) flips to the new
  * epoch on its next read with no conf change; every prior epoch stays
  * readable for audit/rollback. This is the maintenance job a deployment
  * schedules at window close — promote only after reading
  * `x_quantizer_route_churn` (the migration cost) against
  * `x_quantizer_drift` (the faithfulness gain).
  *
  * Usage: `runMain graft.tools.QuantizerClose <sfDir> <storeDir>` —
  * the store must already carry `quantizer_state` (built by
  * [[IndexBuild]]). */
object QuantizerClose {

  /** Library form (what `QuantizerSpec` drives): fold `sfDir`'s arrivals
    * into `storeDir`'s latest epoch and append epoch+1. Returns the new
    * epoch number. */
  def close(s: SparkSession, sfDir: String, storeDir: String): Long = {
    val path = s"$storeDir/${IndexStore.quantizerState}"
    val all = s.read.parquet(path)
    val latest = all.agg(max(col("epoch"))).head.getLong(0)
    val st = all.filter(col("epoch") === latest)
      .select(col("cluster"), col("dim"), col("q_sum0"), col("n0"), col("c0"))
    val cents = Similarity.quantizerCentroidPanel(st)
    val deltas = Similarity.quantizerDeltasOf(
      Similarity.arrivingQuantized(s, sfDir), cents)
    // next epoch's state IN STATE FORM (merged sums/counts + recomputed
    // floored means) — what the next close folds into
    val next = st.join(deltas, Seq("cluster", "dim"), "left")
      .na.fill(0L, Seq("q_suma", "na"))
      .select(col("cluster"), col("dim"),
        (col("q_sum0") + col("q_suma")).as("q_sum0"),
        (col("n0") + col("na")).as("n0"))
      .withColumn("c0", expr("CAST(floor(CAST(q_sum0 AS DOUBLE) / n0) AS BIGINT)"))
      .withColumn("epoch", lit(latest + 1))
    next.write.mode("append").parquet(path)
    latest + 1
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: runMain graft.tools.QuantizerClose <sfDir> <storeDir>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietBenignWarnings()
    try {
      val e = close(spark, args(0), args(1))
      println(s"[quantizer-close] appended epoch $e to ${args(1)}")
    } finally spark.stop()
  }
}
