package graft

import graft.streaming.{RunningTotals, UpsertSink}

/** In-place sink compaction ([[graft.streaming.UpsertSink.compactInPlace]],
  * r14 verdict #5): folding every settled delta into one must leave the
  * resolved relation bit-identical (compaction is layout maintenance, not
  * semantics), bound the delta count, exclude the in-flight batch so
  * checkpoint replay stays idempotent, and hold end-to-end through a real
  * multi-batch stream that compacts inside foreachBatch. */
class CompactSinkSpec extends SparkSpec {
  import spark.implicits._

  test("compactInPlace: resolve unchanged, delta count folds to 1, replay is a no-op") {
    val dir = graft.ops.SpillMemo.scratchDir("graft-cmp-")
    def delta(rows: Seq[(Long, Long)], id: Long): Unit =
      UpsertSink.writeBatch(rows.toDF("k", "v"), id, dir)
    def resolved: Set[(Long, Long)] =
      UpsertSink.resolve(spark, dir, Seq("k")).as[(Long, Long)].collect().toSet
    def deltaDirs: Int = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("b"))
    delta(Seq((1L, 10L), (2L, 20L)), 0)
    delta(Seq((2L, 21L), (3L, 30L)), 1)
    delta(Seq((3L, 31L), (4L, 40L)), 2)
    val want = resolved
    UpsertSink.compactInPlace(spark, dir, Seq("k"))
    assert(deltaDirs == 1, "three deltas must fold to one")
    assert(resolved == want, "compaction changed the resolved relation")
    // compacting a single delta is a no-op (also the replay path)
    UpsertSink.compactInPlace(spark, dir, Seq("k"))
    assert(deltaDirs == 1 && resolved == want)
    // mid-stream: compact EXCLUDING the in-flight batch, then the batch
    // writes its own delta — and a crash-replay of that batch (same
    // compact, same write) must change nothing (the exceptBatch contract)
    delta(Seq((4L, 41L), (5L, 50L)), 3)
    UpsertSink.compactInPlace(spark, dir, Seq("k"), exceptBatch = Some(4L))
    delta(Seq((5L, 51L)), 4)
    val after = resolved
    assert(after == Set((1L, 10L), (2L, 21L), (3L, 31L), (4L, 41L), (5L, 51L)))
    UpsertSink.compactInPlace(spark, dir, Seq("k"), exceptBatch = Some(4L))
    delta(Seq((5L, 51L)), 4)
    assert(resolved == after, "batch replay after compact changed the view")
    assert(deltaDirs == 2, "post-compact sink must hold fold + in-flight only")
  }

  test("crash windows: a marked stage is preferred (sole copy of folded keys); an unmarked stage is discarded") {
    import org.apache.spark.sql.functions.lit
    // --- window A: crash AFTER the stage committed (marker present) and
    // AFTER the old b<maxId> was deleted — the stage is the ONLY durable
    // copy of b2's keys; recovery must install it, never refold
    val dirA = graft.ops.SpillMemo.scratchDir("graft-cmpcrashA-")
    def delta(dir: String)(rows: Seq[(Long, Long)], id: Long): Unit =
      UpsertSink.writeBatch(rows.toDF("k", "v"), id, dir)
    delta(dirA)(Seq((1L, 10L)), 0)
    delta(dirA)(Seq((1L, 11L), (2L, 20L)), 1)
    delta(dirA)(Seq((3L, 30L)), 2)
    val wantA = UpsertSink.resolve(spark, dirA, Seq("k"))
      .as[(Long, Long)].collect().toSet
    // hand-build the crash state: complete marked stage, b2 already gone
    val stageA = new java.io.File(dirA, "compact-stage.tmp")
    UpsertSink.resolve(spark, dirA, Seq("k"))
      .withColumn("_batch_id", lit(2L))
      .write.parquet(stageA.getAbsolutePath)
    java.nio.file.Files.writeString(
      new java.io.File(stageA, "_STAGE_BATCH_ID").toPath, "2")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    rmTree(new java.io.File(dirA, "b2"))
    // re-entry (the replay path) must finish the install
    UpsertSink.compactInPlace(spark, dirA, Seq("k"))
    val dirsA = new java.io.File(dirA).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b")).map(_.getName)
    assert(dirsA.toSet == Set("b2"), s"recovery must install the stage at its recorded id: ${dirsA.toSeq}")
    assert(UpsertSink.resolve(spark, dirA, Seq("k"))
      .as[(Long, Long)].collect().toSet == wantA,
      "recovered fold lost keys (b2's rows existed only in the stage)")

    // --- window B: crash MID-STAGE-WRITE (no marker) — every input dir
    // still exists; recovery must discard the junk stage and refold
    val dirB = graft.ops.SpillMemo.scratchDir("graft-cmpcrashB-")
    delta(dirB)(Seq((1L, 10L)), 0)
    delta(dirB)(Seq((2L, 20L)), 1)
    val wantB = UpsertSink.resolve(spark, dirB, Seq("k"))
      .as[(Long, Long)].collect().toSet
    val stageB = new java.io.File(dirB, "compact-stage.tmp")
    stageB.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stageB, "part-junk.parquet").toPath, "torn write")
    UpsertSink.compactInPlace(spark, dirB, Seq("k"))
    assert(!stageB.exists(), "unmarked stage must be discarded")
    val dirsB = new java.io.File(dirB).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b")).map(_.getName)
    assert(dirsB.toSet == Set("b1"), s"refold must still fold to one delta: ${dirsB.toSeq}")
    assert(UpsertSink.resolve(spark, dirB, Seq("k"))
      .as[(Long, Long)].collect().toSet == wantB)
  }

  test("golden: the compacted multi-batch twin equals the uncompacted stream") {
    val a = RunningTotals.streamedRunningTotals(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val b = RunningTotals.streamedRunningTotalsCompacted(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(a.nonEmpty)
    assert(a == b, "resolve-after-compact diverged from resolve-without")
  }
}
