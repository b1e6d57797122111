package graft

import graft.ops.Dedup

/** Hand-computed fixed-point PageRank on a 3-node path graph (1—2—3),
  * pinning the integer arithmetic the oracle unrolls: contributions are
  * `rank div degree`, the damping step is `teleport + (85·acc) div 100`,
  * all floor divisions on positive longs. */
class PagerankSpec extends SparkSpec {
  import spark.implicits._

  test("three rounds on a path graph match the by-hand fixed-point values") {
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Dedup.pagerankOf(adj)
      .as[(Long, Long)].collect().toMap
    // r0 = 1e9 each; deg = [1, 2, 1]
    // r1: ends 150e6 + 85%·(1e9/2)  = 575_000_000, hub 150e6 + 85%·2e9 = 1_850_000_000
    // r2: ends 936_250_000, hub 1_127_500_000
    // r3: ends 629_187_500, hub 1_741_625_000
    assert(got == Map(
      1L -> 629187500L,
      2L -> 1741625000L,
      3L -> 629187500L))
    // the hub out-centralities its leaf variants in every round
    assert(got(2L) > got(1L))
  }

  test("a regular graph is a fixed point up to the damping floor (symmetry holds)") {
    // 4-cycle: every node degree 2 — ranks must stay equal across nodes.
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val ranks = Dedup.pagerankOf(adj).as[(Long, Long)].collect().map(_._2).distinct
    assert(ranks.length == 1, s"regular graph must stay uniform, got ${ranks.toSeq}")
  }
}
