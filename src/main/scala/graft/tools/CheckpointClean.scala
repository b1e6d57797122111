package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Retention cleaner for Structured Streaming checkpoint directories — the
  * engine's port of the reference's standalone cleanup utility
  * (`clean_checkpoint/cleanup_checkpoints.py:29-116`): keep the last N
  * commit-log entries, offset-log entries, and state-store batches; delete
  * everything older, including Hadoop's `.<name>.crc` siblings.
  *
  * Layout note: the reference walks `state/0/<n>` and deletes the numbered
  * directories as "batches" — but in Spark's HDFS-backed state store those
  * are PARTITION directories (`state/<operatorId>/<partitionId>/
  * <batchId>.delta|.snapshot`), so deleting them drops live partitions.
  * This port keeps the reference's retention INTENT (last N batches) against
  * the real layout: per operator, the cutoff is computed over all
  * partitions' batch files, and only `.delta`/`.snapshot` files at or below
  * it are removed. `_metadata` and non-numeric entries are never touched.
  *
  * Production note (same warning the reference prints): run ONLY while the
  * streaming query is stopped — and prefer the engine-native retention confs
  * (`spark.sql.streaming.minBatchesToRetain`, set by the reference's own
  * consumer) for steady-state cleanup; this tool is for reclaiming space
  * from checkpoints of stopped/retired queries. After cleaning, recovery is
  * bounded to the retained tail.
  */
object CheckpointClean {

  case class Summary(commitFiles: Int, offsetFiles: Int, stateFiles: Int) {
    def total: Int = commitFiles + offsetFiles + stateFiles
  }

  private def numeric(name: String): Option[Long] =
    if (name.nonEmpty && name.forall(_.isDigit)) Some(name.toLong) else None

  /** Batch id of a state file name: `12.delta` / `12.snapshot` → 12. */
  private def batchOf(name: String): Option[Long] = {
    val dot = name.indexOf('.')
    if (dot <= 0) None
    else if (name.substring(dot + 1) == "delta" || name.substring(dot + 1) == "snapshot")
      numeric(name.substring(0, dot))
    else None
  }

  private def list(p: Path): Seq[Path] =
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    } else Seq.empty

  /** Delete `f` and its `.<name>.crc` sibling; returns files removed. */
  private def deleteWithCrc(f: Path): Int = {
    var n = 0
    if (Files.deleteIfExists(f)) n += 1
    if (Files.deleteIfExists(f.resolveSibling("." + f.getFileName.toString + ".crc"))) n += 1
    n
  }

  /** Metadata log (commits/ or offsets/): plain numeric file per batch; keep
    * the last `keep` below the latest, exactly like the reference's
    * `latest - KEEP` cutoff. */
  private def cleanLog(dir: Path, keep: Int): Int = {
    val entries = list(dir)
      .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("."))
      .flatMap(f => numeric(f.getFileName.toString).map(_ -> f))
    if (entries.isEmpty) 0
    else {
      val cutoff = entries.map(_._1).max - keep
      entries.filter(_._1 <= cutoff).map { case (_, f) => deleteWithCrc(f) }.sum
    }
  }

  /** State store: per operator, batch cutoff over ALL partitions, then
    * delete `.delta`/`.snapshot` files at or below it. */
  private def cleanState(stateRoot: Path, keep: Int): Int =
    list(stateRoot).filter(Files.isDirectory(_)).map { op =>
      val partFiles = for {
        part <- list(op) if Files.isDirectory(part) && numeric(part.getFileName.toString).isDefined
        f <- list(part) if Files.isRegularFile(f)
        b <- batchOf(f.getFileName.toString)
      } yield (b, f)
      if (partFiles.isEmpty) 0
      else {
        val cutoff = partFiles.map(_._1).max - keep
        partFiles.filter(_._1 <= cutoff).map { case (_, f) => deleteWithCrc(f) }.sum
      }
    }.sum

  /** Clean one checkpoint directory; returns per-section deleted-file counts. */
  def clean(checkpointDir: Path, keepCommits: Int = 10, keepOffsets: Int = 10,
      keepStateBatches: Int = 20): Summary =
    Summary(
      cleanLog(checkpointDir.resolve("commits"), keepCommits),
      cleanLog(checkpointDir.resolve("offsets"), keepOffsets),
      cleanState(checkpointDir.resolve("state"), keepStateBatches))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CheckpointClean <checkpointDir> [keepCommits keepOffsets keepStateBatches]")
    val dir = Paths.get(args(0))
    require(Files.isDirectory(dir), s"not a directory: $dir")
    val s = clean(dir,
      if (args.length > 1) args(1).toInt else 10,
      if (args.length > 2) args(2).toInt else 10,
      if (args.length > 3) args(3).toInt else 20)
    println(s"[checkpoint-clean] $dir: removed ${s.commitFiles} commit, " +
      s"${s.offsetFiles} offset, ${s.stateFiles} state files (${s.total} total)")
    println("[checkpoint-clean] run only while the streaming query is STOPPED; " +
      "recovery is bounded to the retained tail")
  }
}
