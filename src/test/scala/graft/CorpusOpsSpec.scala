package graft

import graft.ops.{Dedup, Sampling, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge-semantics pins for the round-6 corpus-assembly ops — the cases the
  * DuckDB oracle gate exercises only incidentally: chunk geometry at the
  * single/multi-chunk boundary and the short tail, document-frequency (not
  * occurrence) counting in the n-gram top-k, segment-tail drop and
  * cross-document dup attribution, shuffle-shard permutation completeness
  * and determinism, the exact-half percentile cut on odd strata, and SCD2
  * run splitting on A-B-A interleaves with an open final range. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "lang", "source", "text")

  test("chunks: one full chunk at/below chunkLen, overlapping tail above it") {
    val d = docs(
      (1L, "en", "s", (1 to 32).map(i => s"w$i").mkString(" ")), // exactly chunkLen
      (2L, "en", "s", (1 to 33).map(i => s"w$i").mkString(" ")), // one word over
      (3L, "en", "s", "a b c"))                                  // tiny doc
    val out = TextAnalysis.chunksDocs(d)
      .select($"doc_id", $"chunk_id", $"start_w", $"len_w")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, 32L),
      (2L, 0L, 0L, 32L), (2L, 1L, 24L, 9L), // stride 24, short tail
      (3L, 0L, 0L, 3L)))
  }

  test("chunks: chunk hash commits to the exact word window") {
    val d = docs((7L, "en", "s", (1 to 40).map(i => s"w$i").mkString(" ")))
    val out = TextAnalysis.chunksDocs(d)
      .select($"chunk_id", $"chunk_h").as[(Long, String)].collect().toMap
    val exp0 = (1 to 32).map(i => s"w$i").mkString(" ")
    val exp1 = (25 to 40).map(i => s"w$i").mkString(" ")
    val md5s = (t: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out == Map(0L -> md5s(exp0), 1L -> md5s(exp1)))
  }

  test("surprisal quantizes -log2 p to bit lengths, exactly") {
    // Corpus: 6 tokens total → bitlen(6)=3; tf(a)=5 (bitlen 3), tf(b)=1
    // (bitlen 1). So s(a)=0 bits, s(b)=2 bits.
    val d = docs((1L, "en", "s", "a a a a"), (2L, "en", "s", "a b"))
    val out = TextAnalysis.surprisalDocs(d)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((4L, 0L, 0L)),
      2L -> ((2L, 2L, 100L)))) // (100*2) div 2
  }

  test("ngramTopK counts document frequency, not occurrences") {
    graft.functions.GraftFunctions.register(spark)
    // doc 1 repeats "x y z" twice but contributes the shingle ONCE; the
    // shingle "x y z" appears in 2 docs while "p q r" appears in 1.
    val d = docs(
      (1L, "en", "s", "x y z x y z"),
      (2L, "en", "s", "x y z"),
      (3L, "en", "s", "p q r"))
    val out = TextAnalysis.ngramTopKDocs(d)
      .select($"sh", $"df").as[(String, Long)].collect().toMap
    assert(out("x y z") == 2L && out("p q r") == 1L)
  }

  test("PMI ranks the exclusive collocation above the promiscuous pair") {
    // "a b" co-occurs 3× and both words appear ONLY together (perfect
    // collocation); "c d" co-occurs 2× but c and d also roam (c: 4, d: 4).
    // PMI must rank (a,b) first even though raw counts favor neither;
    // the support filter (>= 2) must drop the singletons (c,x)/(d,y)/(y,d).
    val d = docs(
      (1L, "en", "s", "a b a b a b"),
      (2L, "en", "s", "c d c d c x"),
      (3L, "en", "s", "d y d c"))
    val out = TextAnalysis.pmiDocs(d)
      .select($"w1", $"w2", $"c12", $"c1", $"c2", $"pmi_fp")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    assert(byPair.contains(("a", "b")) && byPair(("a", "b"))._3 == 3L)
    assert(byPair(("a", "b"))._4 == 3L && byPair(("a", "b"))._5 == 3L)
    assert(byPair.contains(("c", "d")) && byPair(("c", "d"))._3 == 2L)
    assert(!byPair.contains(("c", "x")) && !byPair.contains(("d", "y")),
      "support-1 pairs must be cut")
    assert(byPair(("a", "b"))._6 > byPair(("c", "d"))._6,
      "exclusive collocation must out-PMI the promiscuous pair")
    // fixed-point spot check: pmi(a,b) defined as the log2fp sum; with
    // c12=3, c1=c2=3, N_uni=16, N_bi=13: log2fp(3)+2*log2fp(16)
    // -log2fp(3)-log2fp(3)-log2fp(13) = 1536+8192-1536-1536-3712 = 2944
    assert(byPair(("a", "b"))._6 == 2944L,
      s"got ${byPair(("a", "b"))._6}")
  }

  test("segmentDedup drops the short tail and attributes cross-doc dups") {
    // segLen = 4: doc 1 = segments [a b c d][e f g h] + dropped tail "t";
    // doc 2 shares [a b c d] exactly; doc 3 is too short to segment.
    val d = docs(
      (1L, "en", "s", "a b c d e f g h t"),
      (2L, "en", "s", "a b c d"),
      (3L, "en", "s", "x y z"))
    val out = Dedup.segmentDedupDocs(d)
      .select($"doc_id", $"n_segs", $"n_dup_segs", $"dup_seg_bp")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L, 5000L), (2L, 1L, 1L, 10000L)))
  }

  test("shuffleShard is a complete deterministic permutation with dense positions") {
    val d = docs((0L until 64L).map(i => (i, "en", "s", "t")): _*)
    val run = () => Sampling.shuffleShardDocs(d)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect().toSet
    val out = run()
    assert(out.map(_._1) == (0L until 64L).toSet)         // every doc exactly once
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    out.groupBy(_._2).foreach { case (_, rows) =>          // dense rank per shard
      assert(rows.map(_._3) == (1L to rows.size).toSet)
    }
    assert(run() == out)                                   // reproducible
  }

  test("percentileGate keeps the exact upper half per stratum, ties by doc_id") {
    // stratum of 5: keep 2 (2*rnk <= 5); equal lengths break by doc_id.
    val d = docs(
      (1L, "en", "s", "a b c"), (2L, "en", "s", "a b c d"),
      (3L, "en", "s", "a b c d"), (4L, "en", "s", "a"), (5L, "en", "s", "a b"),
      (6L, "fr", "s", "a b"), (7L, "fr", "s", "a"))  // stratum of 2: keep 1
    val out = Sampling.percentileGateDocs(d)
      .select($"doc_id", $"rnk").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L), (3L, 2L), (6L, 1L)))
  }

  test("bpePairs counts every occurrence (not document frequency), ties break by pair") {
    // "a b" occurs 3× across 2 docs (twice in doc 1 — both count);
    // "b a" and "b c" occur once each → tie broken lexicographically.
    val d = docs(
      (1L, "en", "s", "a b a b"),
      (2L, "en", "s", "a b c"))
    val out = TextAnalysis.bpePairsDocs(d)
      .select($"pair", $"n", $"rnk").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a b", 3L, 1L), ("b a", 1L, 2L), ("b c", 1L, 3L)))
  }

  test("curateShard shards exactly the curated survivors with their token counts") {
    val sf001 = "/root/testdata/sf0.001"
    val curatedIds = graft.ops.TextAnalysis.curatedDocs(spark, sf001)
      .select($"doc_id").as[Long].collect().toSet
    val out = Sampling.curateShard(spark, sf001)
      .select($"doc_id", $"shard", $"pos", $"n_words")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == curatedIds, "shard set must equal the curated set")
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSet == (1L to rows.size).toSet, "dense per-shard positions")
    }
    assert(out.forall(_._4 >= 20), "every sharded doc passed the quality gate")
  }

  test("scd2 splits A-B-A into three runs and leaves the last range open") {
    val ev = Seq(
      (1L, "u1", "2024-01-01 10:00:00", "click"),
      (2L, "u1", "2024-01-01 10:01:00", "click"),
      (3L, "u1", "2024-01-01 10:02:00", "view"),
      (4L, "u1", "2024-01-01 10:03:00", "click"), // back to A → NEW run
      (5L, "u2", "2024-01-01 09:00:00", "view"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .select($"event_id", $"user_id", to_timestamp($"ts_s").as("ts"), $"event_type")
    val us = (s: String) => java.sql.Timestamp.valueOf(s).getTime * 1000L
    val out = Temporal.scd2Events(ev)
      .select($"user_id", $"run_id", $"event_type", $"valid_from_us", $"valid_to_us", $"n_events")
      .as[(String, Long, String, Long, Option[Long], Long)].collect().toSet
    assert(out == Set(
      ("u1", 1L, "click", us("2024-01-01 10:00:00"), Some(us("2024-01-01 10:02:00")), 2L),
      ("u1", 2L, "view", us("2024-01-01 10:02:00"), Some(us("2024-01-01 10:03:00")), 1L),
      ("u1", 3L, "click", us("2024-01-01 10:03:00"), None, 1L),
      ("u2", 1L, "view", us("2024-01-01 09:00:00"), None, 1L)))
  }

  test("entropy: hand values on degenerate and uniform token distributions") {
    val out = graft.ops.TextAnalysis.entropyOf(docs(
      (1L, "en", "s", "a a a a"),          // degenerate: H = 0
      (2L, "en", "s", "a b c d"),          // uniform over 4: H = 2 bits
      (3L, "en", "s", "a a b b c c d d"))) // uniform over 4 again: H = 2 bits
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // log2fp is exact at powers of two, so these are exact: 0 and 2048.
    assert(out(1L) == ((4L, 1L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 4L, 2048L)), s"got ${out(2L)}")
    assert(out(3L) == ((8L, 4L, 2048L)), s"got ${out(3L)}")
    // and monotone: repeating tokens can only lower entropy below uniform
    val skew = graft.ops.TextAnalysis.entropyOf(docs(
      (4L, "en", "s", "a a a a a b c d")))
      .collect().head.getLong(3)
    assert(skew > 0 && skew < 2048, s"skewed distribution must land strictly between (got $skew)")
  }
}
