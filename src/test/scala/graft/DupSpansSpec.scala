package graft

import org.apache.spark.sql.functions._

/** Pins for cross-document repeated-span detection (`x_dedup_spans`):
  * recall of long shared runs, the island-merge geometry, and the
  * structural invariants every emitted cut range must satisfy. L = 8
  * (Dedup.dupSpanLen) throughout. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val L = ops.Dedup.dupSpanLen

  private def spans(docs: (Long, String)*): Map[Long, Seq[(Long, Long)]] =
    ops.Dedup.dupSpansOf(docs.toSeq.toDF("doc_id", "text"))
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(t => (t._2, t._3)).sorted.toSeq
      }

  private def toks(xs: Range, tag: String = "t"): String =
    xs.map(i => s"$tag$i").mkString(" ")

  test("a shared >=L-token run is cut in both documents; unique text is not") {
    val shared = toks(1 to 10, "s") // 10 shared tokens
    val out = spans(
      (1L, s"${toks(1 to 5, "a")} $shared ${toks(1 to 4, "b")}"),
      (2L, s"${toks(1 to 3, "c")} $shared"),
      (3L, toks(1 to 20, "u"))) // all unique
    // doc 1: shared run occupies tokens 6..15; windows start at 6,7,8
    assert(out(1L) == Seq((6L, 15L)))
    // doc 2: shared run occupies tokens 4..13
    assert(out(2L) == Seq((4L, 13L)))
    assert(!out.contains(3L), "document with no repeated window must emit nothing")
  }

  test("two repeats separated by more than L novel tokens stay separate spans") {
    val r1 = toks(1 to L, "x")
    val r2 = toks(1 to L, "y")
    val gap = toks(1 to (L + 2), "g1") // > L novel tokens between matched windows
    val out = spans(
      (1L, s"$r1 $gap $r2"),
      (2L, r1),
      (3L, r2))
    assert(out(1L).size == 2, s"expected two islands, got ${out(1L)}")
    assert(out(1L) == Seq((1L, L.toLong), (2L * L + 3L, 3L * L + 2L)))
  }

  test("a 1-token novel gap keeps runs in separate spans; a contiguous run merges fully") {
    val r1 = toks(1 to L, "x")
    val r2 = toks(1 to L, "y")
    val out = spans(
      (1L, s"$r1 g $r2"), // 1 novel token between — window distance L+1 > L? start of r2 = L+2
      (2L, r1),
      (3L, r2))
    // matched window starts: 1 (r1) and L+2 (r2); distance L+1 = 9 > L = 8, so
    // the runs stay in SEPARATE spans and the novel token 9 stays uncovered
    // (end 8, start 10) — spans are the exact union of matched-window coverage.
    assert(out(1L) == Seq((1L, L.toLong), (L + 2L, 2L * L + 1L)))
    val merged = spans(
      (1L, s"${toks(1 to (L + L), "x")}"), // one 16-token run
      (2L, toks(1 to (L + L), "x")))
    // every window matches; islands merge into one full-cover span
    assert(merged(1L) == Seq((1L, 2L * L.toLong)))
  }

  test("fixture corpus invariants: spans ordered, disjoint, >= L tokens, in bounds") {
    val docs = Tables.documents(spark, sf)
    val lens = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val out = ops.Dedup.dupSpans(spark, sf)
      .join(lens, Seq("doc_id"))
      .select($"doc_id", $"span_start", $"span_end", $"n_dup_tokens", $"n")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "fixture corpus contains near-duplicates; spans expected")
    out.foreach { case (id, s0, s1, n, len) =>
      assert(s0 >= 1 && s1 <= len, s"doc $id span [$s0,$s1] out of bounds (len $len)")
      assert(n == s1 - s0 + 1 && n >= L, s"doc $id span length wrong")
    }
    out.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 > a._3 + 1, s"doc $id spans ${a._2}-${a._3} and ${b._2}-${b._3} not separated")
        case _ =>
      }
    }
  }

  test("span strip: ledger covers every document, cut + kept conserve, sums match the cut list") {
    val strip = ops.Dedup.dupSpanStrip(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_spans", $"n_cut", $"n_kept")
      .as[(Long, Long, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(strip.length == nDocs, "every document must get a ledger row")
    strip.foreach { case (id, tok, ns, cut, kept) =>
      assert(kept + cut == tok, s"doc $id tokens not conserved")
      assert(cut >= 0 && cut <= tok, s"doc $id cut out of range")
      assert((ns == 0) == (cut == 0), s"doc $id span/cut count mismatch")
    }
    val fromSpans = ops.Dedup.dupSpans(spark, sf)
      .groupBy($"doc_id").agg(sum($"n_dup_tokens").as("c"))
      .select($"doc_id", $"c").as[(Long, Long)].collect().toMap
    strip.filter(_._4 > 0).foreach { case (id, _, _, cut, _) =>
      assert(fromSpans(id) == cut, s"doc $id strip total diverges from the span list")
    }
  }
}
