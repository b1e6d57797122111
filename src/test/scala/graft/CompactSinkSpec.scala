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

  test("golden: the compacted multi-batch twin equals the uncompacted stream") {
    val a = RunningTotals.streamedRunningTotals(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val b = RunningTotals.streamedRunningTotalsCompacted(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(a.nonEmpty)
    assert(a == b, "resolve-after-compact diverged from resolve-without")
  }
}
