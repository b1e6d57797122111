package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-9 verdict #3: `oovVocabSize` (16) and `bpeTopN` (20) were toy
  * constants that couldn't distinguish a bounded heap from a global sort in
  * practice. These tests re-run both cuts at 4096 — larger than the whole
  * distinct-key universe at sf0.001, and far past any "small top-N" special
  * case — against independent Scala-side references, and pin the
  * TakeOrderedAndProject physical shape at BOTH sizes (the plan must stay a
  * bounded per-partition heap no matter the cut width; a regression to a
  * single-partition WindowExec sort fails here before it fails at 100 TB). */
class BoundedHeapSpec extends SparkSpec {

  private val bigN = 4096

  private def docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test(s"oov at vocab=$bigN equals the sequential reference; plan is TakeOrderedAndProject at both sizes") {
    val got = TextAnalysis.oov(spark, sf, vocabSize = bigN)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val toks = docs.flatMap { case (id, t) => t.split(" ").filter(_.nonEmpty).map(id -> _) }
    val tf = toks.groupBy(_._2).map { case (tok, xs) => tok -> xs.size.toLong }
    val vocab = tf.toSeq.sortBy { case (tok, n) => (-n, tok) }.take(bigN).map(_._1).toSet
    val expected = toks.groupBy(_._1).map { case (id, xs) =>
      val n = xs.size.toLong
      val oov = xs.count(x => !vocab(x._2)).toLong
      id -> ((n, oov,
        BigDecimal(oov.toDouble * 10000 / n).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
    assert(got == expected, "wide-vocab OOV diverged from the sequential reference")

    for (size <- Seq(TextAnalysis.oovVocabSize, bigN)) {
      val p = TextAnalysis.oov(spark, sf, size).queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        s"vocab cut at $size must be a bounded heap, not a sort:\n$p")
    }
  }

  test(s"bpePairs at topN=$bigN equals the sequential reference; plan is TakeOrderedAndProject at both sizes") {
    val got = TextAnalysis.bpePairs(spark, sf, topN = bigN)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val pairs = docs.map(_._2).flatMap { t =>
      val ws = t.split(" ")
      if (ws.length < 2) Seq.empty else ws.sliding(2).map(_.mkString(" ")).toSeq
    }
    val counts = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(bigN)
      .zipWithIndex.map { case ((p, n), i) => (p, n, i + 1L) }.toSet
    assert(got == expected, "wide-cut BPE pair ranks diverged from the sequential reference")

    for (size <- Seq(TextAnalysis.bpeTopN, bigN)) {
      val p = TextAnalysis.bpePairs(spark, sf, size).queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        s"pair cut at $size must be a bounded heap, not a sort:\n$p")
      // the only window ranks the ≤topN survivors — never the full
      // aggregated relation (the cut runs BEFORE the rank)
      val winIdx = p.indexOf("Window")
      val topIdx = p.indexOf("TakeOrderedAndProject")
      assert(winIdx < topIdx, s"rank window must sit above the bounded cut:\n$p")
    }
  }
}
