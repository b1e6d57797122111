package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** Pins the BPE trainer's merge semantics on a hand-computed corpus —
  * overlap counting in selection, left-greedy non-overlapping application,
  * lexicographic tie-breaks, and merged symbols merging again in later
  * rounds. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("three rounds on 'a a a b': overlap counts, left-greedy, merged symbols remerge") {
    val docs = Seq((1L, "en", "s", "a a a b")).toDF("doc_id", "lang", "source", "text")
    val out = Bpe.bpeMergesDocs(docs)
      .select($"round", $"merged_tok", $"n_occ", $"n_tokens_after")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      // (a,a) counted twice (overlap); left-greedy merges pos 0, absorbs 1,
      // leaves pos 2 alone -> [a a, a, b]
      (1L, "a a", 2L, 3L),
      // counts now {(a a, a): 1, (a, b): 1}; tie-break: "a" < "a a"
      (2L, "a b", 1L, 2L),
      (3L, "a a a b", 1L, 1L)))
  }

  test("left-greedy inside a 4-run: positions 0 and 2 merge, 1 and 3 absorb") {
    val docs = Seq((1L, "en", "s", "x x x x")).toDF("doc_id", "lang", "source", "text")
    val out = Bpe.bpeMergesDocs(docs)
      .select($"round", $"merged_tok", $"n_occ", $"n_tokens_after")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // round 1: (x,x) x3 (overlaps), merges at 0 and 2 -> [x x, x x]
    assert(out.head == ((1L, "x x", 3L, 2L)))
    // round 2: the two merged symbols pair up -> one 4-gram
    assert(out(1) == ((2L, "x x x x", 1L, 1L)))
  }

  /** Plain-Scala ground truth: one BPE round — count all adjacent pairs,
    * pick (max count, lexicographic) — then the left-greedy rewrite as the
    * obvious sequential while-loop. */
  private def refRounds(docs0: Map[Long, Vector[String]], rounds: Int)
      : Seq[(Long, String, Long, Long)] = {
    var docs = docs0
    (1 to rounds).flatMap { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      docs.values.foreach(_.sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) += 1
        case _ =>
      })
      if (counts.isEmpty) None
      else {
        val ((a, b), n) = counts.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head
        docs = docs.map { case (id, toks) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += s"$a $b"; i += 2
            } else { out += toks(i); i += 1 }
          }
          id -> out.result()
        }
        Some((r.toLong, s"$a $b", n, docs.values.map(_.size.toLong).sum))
      }
    }
  }

  test("differential: random small-alphabet corpora match the sequential reference") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "c", "d")
    (1 to 2).foreach { trial =>
      val corpus = (1L to 25L).map { id =>
        id -> Vector.fill(rnd.nextInt(13))(alphabet(rnd.nextInt(alphabet.size)))
      }.toMap
      val docs = corpus.toSeq.map { case (id, toks) =>
        (id, "en", "s", toks.mkString(" "))
      }.toDF("doc_id", "lang", "source", "text")
      val got = Bpe.bpeMergesDocs(docs)
        .select($"round", $"merged_tok", $"n_occ", $"n_tokens_after")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      // empty-text docs tokenize to zero rows; the reference drops them too
      val exp = refRounds(corpus.filter(_._2.nonEmpty), 3)
      assert(got == exp, s"trial $trial diverged: got $got, expected $exp")
    }
  }

  test("encode profile: token budget, merge counts, and the character invariant") {
    val docs = Seq(
      (1L, "en", "s", "a a a b"),
      (2L, "en", "s", "b c"),
      (3L, "en", "s", "zz")).toDF("doc_id", "lang", "source", "text")
    val (_, toks) = Bpe.train(docs)
    val got = Bpe.bpeEncodeDocs(toks)
      .select($"doc_id", $"n_tokens", $"n_merged", $"n_chars")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // rounds on this corpus: (a,a) -> (a,b) -> (a a, a b); doc 1 collapses
    // to one 4-gram token, doc 2 keeps [b, c], doc 3 passes through.
    assert(got == Seq((1L, 1L, 1L, 4L), (2L, 2L, 0L, 2L), (3L, 1L, 0L, 2L)))
    // invariant: merging rearranges token boundaries, never characters —
    // per doc, n_chars must equal the pre-merge non-space character count.
    val pre = docs.select($"doc_id",
      length(translate($"text", " ", "")).cast("long").as("pre_chars"))
    val mismatches = Bpe.bpeEncodeDocs(toks).join(pre, "doc_id")
      .filter($"n_chars" =!= $"pre_chars").count()
    assert(mismatches == 0L)
  }

  test("non-adjacent candidates merge independently; singleton docs pass through") {
    val docs = Seq(
      (1L, "en", "s", "p q r p q"),
      (2L, "en", "s", "lonely")).toDF("doc_id", "lang", "source", "text")
    val r1 = Bpe.bpeMergesDocs(docs).filter($"round" === 1)
      .select($"merged_tok", $"n_occ", $"n_tokens_after")
      .as[(String, Long, Long)].head()
    // (p,q) appears twice, non-adjacent starts -> both merge; corpus shrinks
    // by exactly 2 (5 + 1 tokens -> 3 + 1)
    assert(r1 == (("p q", 2L, 4L)))
  }

  test("fertility: per-lang rollup conserves the encode profile and the merge bound") {
    val rows = Bpe.bpeFertility(spark, sf)
      .select($"lang", $"n_docs", $"n_words", $"n_tokens", $"fertility_bp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // doc coverage is total (zero-token docs included via the left join)
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    // conservation: per-lang token totals equal the encode profile's
    val enc = Bpe.bpeEncode(spark, sf)
      .join(Tables.documents(spark, sf).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (lang, _, nw, nt, bp) =>
      assert(nt == enc.getOrElse(lang, 0L))
      // this trainer seeds from words and merges only fuse: tokens <= words
      assert(nt <= nw, s"$lang: post-merge tokens exceed non-empty words")
      assert(bp == nt * 10000 / nw)
    }
  }
}
