package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative and multiply-referenced relations.
  *
  * Local mode (default): `localCheckpoint` — blocks live on executor storage
  * (MEMORY_AND_DISK), zero external I/O, the right cut for `local[n]` and
  * short-lived jobs. NOT fault-tolerant: localCheckpoint discards the lineage
  * needed to recompute lost blocks, so on a real cluster one lost executor
  * mid-job fails every job reading them — fatal for an O(log n)-round
  * iterative algorithm ([[Dedup.components]]) that would run for hours at
  * 100 TB.
  *
  * Cluster mode (`spark.graft.reliableCheckpoints=true` plus
  * `SparkContext.setCheckpointDir(<lake path>)`): reliable `checkpoint()` —
  * every cut is written to the checkpoint directory, so the job survives
  * executor loss and restarts resume from durable state. Cost: Spark writes
  * checkpoint files in a second pass over the RDD (the documented
  * recompute-on-checkpoint behavior), i.e. each cut relation is computed
  * twice — the standard price of durability, paid only on the small
  * already-reduced relations these operators cut (signatures, adjacency,
  * per-round labels — never the corpus). Contract documented in SCALE.md.
  */
object Lineage {

  /** Conf key selecting reliable checkpoints (cluster mode). */
  val reliableConf = "spark.graft.reliableCheckpoints"

  private def reliable(df: DataFrame): Boolean = {
    val s = df.sparkSession
    val on = s.conf.getOption(reliableConf).exists(_.toBoolean)
    require(!on || s.sparkContext.getCheckpointDir.isDefined,
      s"$reliableConf=true requires SparkContext.setCheckpointDir (the lake path on a cluster)")
    on
  }

  /** Eager cut: materializes now; the returned plan is truncated to the
    * result (a `LogicalRDD` over the materialized blocks/files). */
  def cut(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)

  /** Cut whose materialization is FUSED into the caller's next action over
    * the returned frame (the action must cover all partitions — e.g. a
    * count): in local mode the lazy `localCheckpoint` persists blocks during
    * that action, so one job both materializes the round and reads its
    * convergence metric. Reliable mode stays eager (checkpoint files are
    * written under the scheduler's doCheckpoint hook at materialization
    * time); the caller's action then re-reads the checkpoint files — a cheap
    * columnar scan, not a recompute. */
  def cutFused(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true) else df.localCheckpoint(eager = false)
}
