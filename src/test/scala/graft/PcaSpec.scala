package graft

import graft.ops.{Similarity, TextAnalysis}

/** Fixed-point power iteration (`x_embed_pca`): the distributed
  * Gram-then-matvec pipeline must equal a sequential driver-side reference
  * bit-for-bit — the same differential style as the PageRank and CDC
  * specs. Constants (milli quantization, 1e5 vector scale, 3 rounds) are
  * deliberately restated here: a drive-by retune of the operator that
  * forgets its oracle would fail this spec too. */
class PcaSpec extends SparkSpec {

  /** Sequential reference: quantize HALF_UP, exact Gram, max-abs rescale of
    * the GRAM to 1e9 (eigenvector-preserving — the corpus-independence
    * device), then per component 3 matvec+rescale rounds with per-round
    * modified Gram-Schmidt against earlier components. Constants restated
    * deliberately (see class scaladoc). */
  /** The rescaled Gram of the sequential reference (shared by the basis
    * fold and the variance test). */
  private def sequentialGram(): Array[Array[Long]] = {
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
    val gds = math.max(1L, gram.flatten.map(math.abs).max / 1000000000L)
    for (i <- 0 until dims; j <- 0 until dims) gram(i)(j) = Math.floorDiv(gram(i)(j), gds)
    gram
  }

  private def sequentialBasis(k: Int): IndexedSeq[Array[Long]] = {
    val gram = sequentialGram()
    val dims = gram.length
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val comps = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (_ <- 1 to k) {
      var vv = Array.fill(dims)(100000L)
      for (_ <- 1 to 3) {
        val u = Array.tabulate(dims)(i => (0 until dims).map(j => gram(i)(j) * vv(j)).sum)
        val ds = math.max(1L, u.map(math.abs).max / 100000L)
        vv = u.map(Math.floorDiv(_, ds))
        comps.foreach { w =>
          val den = dot(w, w)
          val num = dot(vv, w)
          vv = Array.tabulate(dims)(i => vv(i) - Math.floorDiv(num * w(i), den))
        }
      }
      comps += vv
    }
    comps.toIndexedSeq
  }

  test("pcaPower equals the sequential fixed-point reference (sf0.001)") {
    val got = Similarity.pcaPower(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vv = sequentialBasis(1).head
    val expected = vv.indices.map(i => i.toLong -> vv(i)).toMap
    assert(got == expected, "distributed iterate diverged from the sequential fold")
    assert(got.values.map(math.abs).max <= 200000L,
      "rescale must keep the iterate near the fixed-point scale")
  }

  test("pcaPowerK equals the sequential Gram-Schmidt fold, and component 1 matches pcaPower") {
    val got = Similarity.pcaPowerK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val basis = sequentialBasis(Similarity.pcaK)
    val expected = (for {
      (v, c) <- basis.zipWithIndex
      (x, i) <- v.zipWithIndex
    } yield (c + 1L, i.toLong) -> x).toMap
    assert(got == expected, "k-direction iterate diverged from the sequential fold")
    // the learned directions must be pairwise near-orthogonal relative to
    // their norms (integer rounding leaves a small residual)
    for (a <- basis.indices; b <- 0 until a) {
      val na = math.sqrt(basis(a).map(x => x.toDouble * x).sum)
      val nb = math.sqrt(basis(b).map(x => x.toDouble * x).sum)
      val cos = basis(a).indices.map(i => basis(a)(i).toDouble * basis(b)(i)).sum / (na * nb)
      assert(math.abs(cos) < 0.01, s"components ${a + 1} and ${b + 1} not orthogonal: cos=$cos")
    }
  }

  test("pcaVariance equals the sequential BigInt Rayleigh fold, shares sum to ~100%") {
    val got = Similarity.pcaVariance(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gram = sequentialGram()
    val dims = gram.length
    val basis = sequentialBasis(Similarity.pcaK)
    def fdiv(a: BigInt, b: BigInt): BigInt = (a - ((a % b + b) % b)) / b
    val lams = basis.map { v =>
      var num = BigInt(0)
      var den = BigInt(0)
      for (i <- 0 until dims) {
        for (j <- 0 until dims) num += BigInt(gram(i)(j)) * v(i) * v(j)
        den += BigInt(v(i)) * v(i)
      }
      fdiv(num, den)
    }
    val total = lams.sum
    val expected = lams.zipWithIndex.map { case (lam, c) =>
      (c + 1L, lam.toLong, fdiv(lam * 10000, total).toLong)
    }.toSet
    assert(got == expected, "variance split diverged from the sequential fold")
    // floor rounding loses at most 1 bp per component
    val shares = got.toSeq.map(_._3)
    assert(shares.sum <= 10000L && shares.sum >= 10000L - Similarity.pcaK)
    // the power method orders the spectrum: component 1 dominates
    val byComp = got.toSeq.sortBy(_._1).map(_._2)
    assert(byComp.head == byComp.max, "component 1 must carry the largest Rayleigh quotient")
  }

  test("modelTrain rounds equal a sequential batch-perceptron fold") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // Stopword-free words, controlled punctuation: features are exactly
    // (stop_pm=0, punct_pm, len_c) with y = +1 iff lang == en.
    val docs = Seq(
      ("en", "aaa bbb"),      // y=+1, punct_pm=0,   len_c=2
      ("de", "xxx yyy zzz"),  // y=-1, punct_pm=0,   len_c=3
      ("en", "a.b ccc"))      // y=+1, punct_pm=500, len_c=2
      .toDF("lang", "text")
    val got = TextAnalysis.modelTrainDocs(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    val feats = Seq((1L, 0L, 0L, 2L), (-1L, 0L, 0L, 3L), (1L, 0L, 500L, 2L))
    var w = (0L, 0L, 0L, 0L) // (ws, wp, wl, wb)
    val expected = (1 to 3).map { r =>
      val mis = feats.filter { case (y, s, p, l) =>
        y * (w._1 * s + w._2 * p + w._3 * l + w._4) <= 0 }
      w = (w._1 + mis.map(f => f._1 * f._2).sum, w._2 + mis.map(f => f._1 * f._3).sum,
        w._3 + mis.map(f => f._1 * f._4).sum, w._4 + mis.map(_._1).sum)
      r.toLong -> ((mis.size.toLong, w._1, w._2, w._3, w._4))
    }.toMap
    assert(got == expected, "training trajectory diverged from the sequential fold")
    assert(got(1L)._1 == 3L, "round 1 misclassifies everything under zero weights")
  }
}
