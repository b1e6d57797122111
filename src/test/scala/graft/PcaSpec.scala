package graft

import graft.ops.Similarity

/** Fixed-point power iteration (`x_embed_pca`): the distributed
  * Gram-then-matvec pipeline must equal a sequential driver-side reference
  * bit-for-bit — the same differential style as the PageRank and CDC
  * specs. Constants (milli quantization, 1e5 vector scale, 3 rounds) are
  * deliberately restated here: a drive-by retune of the operator that
  * forgets its oracle would fail this spec too. */
class PcaSpec extends SparkSpec {

  test("pcaPower equals the sequential fixed-point reference (sf0.001)") {
    val got = Similarity.pcaPower(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    assert(vecs.nonEmpty)
    val dims = vecs.head.length
    def q(x: Float): Long = // Spark/DuckDB round(): HALF_UP away from zero
      BigDecimal(x.toDouble * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val gram = Array.ofDim[Long](dims, dims)
    vecs.foreach { v =>
      val qs = v.map(q)
      var i = 0
      while (i < dims) {
        var j = 0
        while (j < dims) { gram(i)(j) += qs(i) * qs(j); j += 1 }
        i += 1
      }
    }
    var vv = Array.fill(dims)(100000L)
    for (_ <- 1 to 3) {
      val u = Array.tabulate(dims)(i => (0 until dims).map(j => gram(i)(j) * vv(j)).sum)
      val ds = math.max(1L, u.map(math.abs).max / 100000L)
      vv = u.map(Math.floorDiv(_, ds))
    }
    val expected = vv.indices.map(i => i.toLong -> vv(i)).toMap
    assert(got == expected, "distributed iterate diverged from the sequential fold")
    assert(got.values.map(math.abs).max <= 200000L,
      "rescale must keep the iterate near the fixed-point scale")
  }
}
