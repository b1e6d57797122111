package graft

import graft.ops.Dedup

/** Hand-computed triangle counts / LCC on small graphs, pinning the
  * degree-oriented enumeration (each triangle found exactly once, at its
  * lowest-(deg,id) vertex) and the floor-division basis-point LCC. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Dedup.trianglesOf(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("diamond graph: two triangles sharing an edge, by-hand LCC") {
    // 1-2, 1-3, 2-3, 2-4, 3-4: triangles {1,2,3} and {2,3,4}.
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(got == Map(
      1L -> ((2L, 1L, 10000L)),             // 2*1*10000 / (2*1)
      2L -> ((3L, 2L, 6666L)),              // 40000 // 6
      3L -> ((3L, 2L, 6666L)),
      4L -> ((2L, 1L, 10000L))))
  }

  test("star graph: hub degree without closure means zero LCC everywhere") {
    val got = run(Seq((10L, 11L), (10L, 12L), (10L, 13L)))
    assert(got == Map(
      10L -> ((3L, 0L, 0L)),
      11L -> ((1L, 0L, 0L)),
      12L -> ((1L, 0L, 0L)),
      13L -> ((1L, 0L, 0L))))
  }

  test("K4: every vertex closes all wedges (LCC = 10000 bp)") {
    val got = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // 4 triangles, each vertex in 3 of them; deg 3 → 2*3*10000/(3*2) = 10000.
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.toSet == Set((3L, 3L, 10000L)))
  }
}
