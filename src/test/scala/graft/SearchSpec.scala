package graft

import org.apache.spark.sql.functions._

/** BM25 + hybrid-RRF retrieval ([[graft.ops.Search]]): the per-term
  * milli-score arithmetic hand-checked against the Okapi formula, the
  * structural contracts of the member and ingest forms, and the RRF
  * fusion's integer arithmetic. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("hand-checked BM25 milli-scores on a 4-doc corpus") {
    // tf: d0 apple=1 banana=2; d1 apple=1 cherry=2; d2 banana=1 date=2;
    //     d3 banana=2 cherry=1. df: apple 2, banana 3, cherry 2, date 1.
    // dl = 3 everywhere, avgdl = 3.0, n_docs = 4. Query = d0's terms.
    val corpus = docsDf(
      0L -> "apple banana banana", 1L -> "apple cherry cherry",
      2L -> "banana date date", 3L -> "banana banana cherry")
    val idx = graft.ops.Search.bm25IndexDocs(corpus)
    val got = graft.ops.Search.bm25Probe(corpus.filter($"doc_id" === 0L), idx)
      .select("query_id", "neighbor_id", "score_m", "n_terms", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // apple hit on d1: idf (4-2+.5)/(2+.5)=1.0, tf=1 ⇒ tfn=1.0 ⇒ 1000.
    // banana on d3: idf 1.5/3.5, tf=2 ⇒ tfn 4.4/3.2 ⇒ round(589.29)=589.
    // banana on d2: tf=1 ⇒ round(428.57)=429.
    assert(got == Set(
      (0L, 1L, 1000L, 1L, 1L), (0L, 3L, 589L, 1L, 2L), (0L, 2L, 429L, 1L, 3L)))
  }

  test("member search: no self-matches, ranks contiguous from 1, k-bounded") {
    val out = graft.ops.Search.bm25TopK(spark, sf)
      .select("query_id", "neighbor_id", "rnk").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getLong(2)).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq && rnks.length <= graft.ops.Search.topK)
    }
  }

  test("ingest twin: arriving docs query, indexed corpus answers") {
    val out = graft.ops.Search.bm25IngestTopK(spark, sf)
      .select("query_id", "neighbor_id").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 10 == 7), "non-arriving query id")
    assert(out.forall(_.getLong(1) % 10 != 7),
      "an arriving doc surfaced as a neighbor — the standing index must exclude the ingest partition")
  }

  test("hybrid RRF: every fused score is a sum of valid leg contributions") {
    val contribs = (1 to graft.ops.Search.topK)
      .map(r => graft.ops.Search.rrfScale / (graft.ops.Search.rrfK + r)).toSet
    val singles = contribs
    val pairs = for (a <- contribs; b <- contribs) yield a + b
    val out = graft.ops.Search.hybridRrf(spark, sf)
      .select("query_id", "neighbor_id", "rrf", "n_legs", "rnk").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rrf, nLegs) = (r.getLong(2), r.getLong(3))
      assert(nLegs == 1L || nLegs == 2L)
      if (nLegs == 1L) assert(singles.contains(rrf), s"bad 1-leg rrf $rrf")
      else assert(pairs.contains(rrf), s"bad 2-leg rrf $rrf")
    }
    // ranks ordered by (rrf desc, id asc) within each query
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(4)).toSeq
      byRank.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getLong(2) > b.getLong(2) ||
            (a.getLong(2) == b.getLong(2) && a.getLong(1) < b.getLong(1)))
        case _ => ()
      }
    }
  }

  test("hybrid eval: overlap and provenance counts obey their identities") {
    val out = graft.ops.Search.hybridEval(spark, sf)
      .select("query_id", "n_text", "n_dense", "n_common",
        "fused_both", "fused_text_only", "fused_dense_only").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nT, nD, nC) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (fB, fT, fD) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nC <= math.min(nT, nD), "overlap exceeds a leg")
      assert(fB + fT + fD <= graft.ops.Search.topK, "fused counts exceed k")
      assert(fB <= nC, "fused-from-both exceeds the overlap")
      assert(fT <= nT && fD <= nD, "provenance exceeds its leg")
      // RRF ranks every overlap doc above any single-leg doc it dominates;
      // with both legs at k=10, every common doc makes the fused top-k.
      assert(fB == nC, "an overlap doc fell out of the fused top-k")
    }
  }

  test("phrase search finds the top bigram with exact positions on real data") {
    val out = graft.ops.Search.phraseSearch(spark, sf)
      .select("doc_id", "w1", "w2", "n_occ", "first_pos").collect()
    assert(out.nonEmpty)
    // one phrase corpus-wide; every row repeats it
    assert(out.map(r => (r.getString(1), r.getString(2))).toSet.size == 1)
    // re-check every reported occurrence count and first position in-driver
    val (w1, w2) = (out.head.getString(1), out.head.getString(2))
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val w = texts(r.getLong(0)).split(" ", -1)
      val hits = (0 until w.length - 1).filter(i => w(i) == w1 && w(i + 1) == w2)
      assert(hits.length.toLong == r.getLong(3), s"n_occ mismatch for doc ${r.getLong(0)}")
      assert(hits.head + 1L == r.getLong(4), "first_pos must be 1-based first hit")
    }
  }

  test("positional-index phrase search equals the exhaustive scan, completely") {
    val out = graft.ops.Search.phraseIndexSearch(spark, sf)
      .select("w1", "w2", "doc_id", "n_occ", "first_pos").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out.nonEmpty)
    val phrases = out.map(t => (t._1, t._2))
    assert(phrases.size == graft.ops.Search.nPhrases,
      s"expected ${graft.ops.Search.nPhrases} distinct phrases, got $phrases")
    // full in-driver recompute: every (phrase, doc) hit, count and position
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val truth = (for {
      (w1, w2) <- phrases.toSeq
      (id, w) <- texts
      hits = (0 until w.length - 1).filter(i => w(i) == w1 && w(i + 1) == w2)
      if hits.nonEmpty
    } yield (w1, w2, id, hits.length.toLong, hits.head + 1L)).toSet
    assert(out == truth, "indexed intersection diverged from the exhaustive scan")
  }

  test("n-token phrase search: the 2-5 token workload equals the exhaustive scan") {
    val widths = graft.ops.Search.phraseWidths
    val out = graft.ops.Search.phraseIndexSearchN(spark, sf)
      .select("phrase", "n_words", "doc_id", "n_occ", "first_pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out.nonEmpty)
    val lens = out.map(_._2)
    assert(lens == widths.map(_._1.toLong).toSet,
      s"workload must cover every length in $widths, got lengths $lens")
    // phrase token count must match its declared length
    out.foreach { case (p, n, _, _, _) =>
      assert(p.split(" ", -1).length.toLong == n, s"phrase '$p' is not $n tokens")
    }

    // exhaustive in-driver recompute: top n-grams per length (count desc,
    // then token-WISE word order — the engines compare columns, not a
    // joined string), then every (phrase, doc) occurrence list from the
    // raw token arrays
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    def topGrams(n: Int, width: Int): Seq[Seq[String]] = {
      val grams = texts.flatMap { case (_, w) =>
        (0 to w.length - n).map(i => w.slice(i, i + n).toSeq)
          .filter(_.forall(_.nonEmpty))
      }
      def pad(g: Seq[String], i: Int): String = if (g.length > i) g(i) else ""
      grams.groupBy(identity).toSeq
        .map { case (g, xs) => (g, xs.length.toLong) }
        .sortBy { case (g, c) =>
          (-c, g.head, g(1), pad(g, 2), pad(g, 3), pad(g, 4))
        }
        .take(width).map(_._1)
    }
    val truth = (for {
      (n, width) <- widths
      g <- topGrams(n, width)
      (id, w) <- texts
      hits = (0 to w.length - n).filter(i => w.slice(i, i + n).sameElements(g))
      if hits.nonEmpty
    } yield (g.mkString(" "), n.toLong, id, hits.length.toLong, hits.head + 1L)).toSet
    assert(out == truth, "iterated intersection diverged from the exhaustive scan")
  }

  test("n-token phrase plan: one pruned index pass per length, intersection in-row") {
    val plan = graft.ops.Search.phraseIndexSearchN(spark, sf)
      .queryExecution.executedPlan.toString
    // document-at-a-time over posting lists: the index scan reaches the
    // broadcast (slot, token) fan-out pruned, and the ONLY join in a leg
    // is that broadcast — the consecutive-position intersection is in-row
    // arithmetic after the (doc, phrase) pivot, never a per-position
    // shuffled join chain
    assert(plan.contains("BroadcastHashJoin"),
      s"the index scan must be pruned by the broadcast slot fan-out:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no shuffled intersection joins — the pivot is the only exchange:\n$plan")
    // never re-scan text per phrase: no CartesianProduct / NestedLoop
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"phrase matching must stay equi-join shaped:\n$plan")
  }

  test("RM3 expands with feedback terms: wider matches, original ranks perturbed") {
    val r1 = graft.ops.Search.bm25TopK(spark, sf)
      .select("query_id", "neighbor_id", "n_terms", "rnk").collect()
    val r2 = graft.ops.Search.rm3Search(spark, sf)
      .select("query_id", "neighbor_id", "n_terms", "rnk").collect()
    assert(r2.nonEmpty)
    val maxTerms = graft.ops.Search.qTerms + graft.ops.Search.fbTerms
    assert(r2.forall(_.getLong(2) <= maxTerms), "matched terms exceed query + expansion")
    // expansion must actually add matchable terms somewhere
    assert(r2.map(_.getLong(2)).max > r1.map(_.getLong(2)).max ||
      r2.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet !=
        r1.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet,
      "round 2 is identical to round 1 — the expansion did nothing")
    r2.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getLong(3)).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq)
    }
  }

  test("snippets: the reported window is the best (earliest-max) query-term window") {
    val W = graft.ops.Search.snipW
    val out = graft.ops.Search.snippetSearch(spark, sf)
      .select("query_id", "neighbor_id", "rnk", "win_start", "n_win_hits", "snippet")
      .collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    // terms per query, recomputed through the same public pieces
    val docs = Tables.documents(spark, sf)
    val idx = graft.ops.Search.bm25IndexDocs(docs)
    val qd = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 100 === 0)
      .select("doc_id", "text")
    val terms = graft.ops.Search.queryTerms(qd, idx)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }
    out.foreach { r =>
      val (q, d, ws, nh) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      val w = texts(d)
      val qts = terms(q)
      val hits = w.map(t => if (qts.contains(t)) 1 else 0)
      val nWin = math.max(w.length - W + 1, 1)
      val scores = (0 until nWin).map(i => hits.slice(i, i + W).sum)
      val best = scores.max
      assert(nh == best.toLong, s"window hit count wrong for ($q, $d)")
      assert(ws == scores.indexOf(best) + 1L, s"not the earliest max window for ($q, $d)")
      assert(r.getString(5) == w.slice(ws.toInt - 1, ws.toInt - 1 + W).mkString(" "))
    }
  }

  test("boolean retrieval: every reported doc contains ALL selected terms") {
    val docs = Tables.documents(spark, sf)
    val idx = graft.ops.Search.bm25IndexDocs(docs)
    val terms = graft.ops.Search.queryTerms(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 100 === 0)
        .select("doc_id", "text"),
      idx, graft.ops.Search.boolTerms)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap
    val out = graft.ops.Search.booleanSearch(spark, sf)
      .select("query_id", "neighbor_id", "n_matched").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      assert(q != d, "self-match leaked")
      assert(terms(q).subsetOf(texts(d)),
        s"doc $d reported for query $q but lacks a required term")
      assert(r.getLong(2) == terms(q).size.toLong)
    }
    // completeness: a doc containing all of some query's terms must appear
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    terms.foreach { case (q, ts) =>
      texts.foreach { case (d, toks) =>
        if (d != q && ts.subsetOf(toks))
          assert(got.contains((q, d)), s"conjunctive match ($q, $d) missing")
      }
    }
  }

  test("facets: per-query counts sum to that query's hit count") {
    val hits = graft.ops.Search.bm25TopK(spark, sf)
      .groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fc = graft.ops.Search.facetSearch(spark, sf)
      .select("query_id", "n_hits").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).sum }
    assert(fc.nonEmpty)
    assert(fc == hits, "facet counts must partition the hit set exactly")
  }

  test("index-build prune: bounded heap equals the window formulation where the cut bites; no WindowExec in the postings plan") {
    // 600 docs sharing one hot token (df ≫ prunePerTerm = 256) with varying
    // tf, plus a unique token per doc — the prune MUST drop 344 postings of
    // the hot list and keep every unique-token posting.
    val corpus = (0L until 600L).map { id =>
      val reps = 1 + (id % 7).toInt // varied tf ⇒ varied impacts + ties
      (id, (Seq.fill(reps)("hot") :+ s"u$id").mkString(" "))
    }.toDF("doc_id", "text")
    val postings = graft.ops.Search.bm25IndexDocs(corpus).postings
    val got = postings.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // the reference cut, spelled as the row_number window the build replaced
    val tf = corpus.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val dlr = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dlr.agg(sum(col("dl")).as("dl_sum"))
      .crossJoin(corpus.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"), (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("imp_m").desc, col("doc_id").asc)
    val expected = tf.join(dfr, "token").join(dlr, "doc_id").crossJoin(stats)
      .withColumn("imp_m", expr(graft.ops.Search.scoreSql))
      .withColumn("prk", row_number().over(w))
      .filter(col("prk") <= 256)
      .select("token", "doc_id", "imp_m").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.count(_._1 == "hot") == 256, "fixture must make the prune bite")
    assert(got == expected, "bounded-heap prune diverged from the window formulation")

    // the scale pin: the index build must never plan a window sort over the
    // postings relation (the df-partitioned single-task sort this replaced)
    val plan = postings.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"postings build regressed to a window prune:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"postings build must be the partial+final bounded-heap aggregation:\n$plan")
    // the LM index build shares the pin: its tf-ordered prune must be the
    // same bounded heap, never a df-partitioned window sort
    val lmPlan = graft.ops.Search.lmIndexDocs(corpus)
      .postings.queryExecution.executedPlan.toString
    assert(!lmPlan.contains("Window"),
      s"LM postings build regressed to a window prune:\n$lmPlan")
    assert(lmPlan.contains("ObjectHashAggregate"),
      s"LM postings build must be the bounded-heap aggregation:\n$lmPlan")
  }

  test("maxsim rerank: scores equal an independent MessageDigest reference; plan broadcast-only") {
    // independent reference: JDK MessageDigest md5 (not Spark's), the same
    // centered-ascii hash projection, max-over-doc-tokens then
    // sum-over-query-terms — recomputed per output row from raw text
    val md5hex: String => String = { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def vec(tok: String): Seq[Int] =
      md5hex(tok).take(graft.ops.Search.maxsimDims).map(_.toInt - 80)
    def sim(a: String, b: String): Long =
      vec(a).zip(vec(b)).map { case (x, y) => x.toLong * y }.sum

    val docs = Tables.documents(spark, sf)
    val docToks = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).distinct.toSeq }
      .toMap
    val idx = graft.ops.Search.bm25IndexDocs(docs)
    val qterms = graft.ops.Search.queryTerms(
      docs.filter($"doc_id" % graft.ops.Search.searchStride === 0)
        .select($"doc_id", $"text"), idx)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSeq }

    val outDf = graft.ops.Search.maxsimRerank(spark, sf)
    val out = outDf
      .select("query_id", "neighbor_id", "bm25_rnk", "maxsim_score", "mrnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (q, n, _, score, _) =>
      val expected = qterms(q).map(qt => docToks(n).map(dt => sim(qt, dt)).max).sum
      assert(score == expected,
        s"maxsim($q, $n) = $score, reference says $expected")
    }
    out.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1L to rs.size).toSeq, "mrnk not dense from 1")
      assert(byRank.map(r => (-r._4, r._2)).toSeq ==
        byRank.map(r => (-r._4, r._2)).sortBy(identity).toSeq,
        "mrnk disagrees with (score desc, neighbor asc)")
    }
    val p = outDf.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"the candidate side must broadcast onto the forward relation:\n$p")
  }

  test("query terms the corpus never saw retrieve nothing (no crash)") {
    val corpus = docsDf(1L -> "alpha beta", 2L -> "beta gamma")
    val idx = graft.ops.Search.bm25IndexDocs(corpus)
    val q = docsDf(9L -> "zzz qqq")
    assert(graft.ops.Search.bm25Probe(q, idx).count() == 0L)
  }

  test("index merge: stored-base-state fold equals the from-scratch full rebuild") {
    val merged = graft.ops.Search.indexMerge(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = graft.ops.Search
      .bm25IndexDocs(Tables.documents(spark, sf)).postings
      .select("token", "doc_id", "imp_m")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full, "merged index diverged from the full rebuild")
    assert(merged.nonEmpty)
  }

  test("autocomplete: occurrence-ranked completions per prefix, heap cut — no window") {
    // tf: apple=3, ant=2, app=1, b=1. Prefix 'a' ranks by occurrences
    // (apple, ant, app); 'ap' drops ant; 'appl' sees only apple.
    val corpus = docsDf(1L -> "app apple apple ant", 2L -> "apple ant b")
    val df = graft.ops.Search.autocompleteDocs(corpus)
    val out = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byPrefix = out.groupBy(_._1).view.mapValues(
      _.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap
    assert(byPrefix("a") == Seq(("apple", 3L), ("ant", 2L), ("app", 1L)))
    assert(byPrefix("ap") == Seq(("apple", 3L), ("app", 1L)))
    assert(byPrefix("appl") == Seq(("apple", 3L)))
    assert(byPrefix("b") == Seq(("b", 1L)))
    assert(!df.queryExecution.executedPlan.toString.contains("WindowExec"),
      "per-prefix head must be the bounded-heap aggregation, not a window")
  }

  test("spellfix: deletion-neighborhood candidates, exact distance-1 suggestions") {
    // tf: cat=3, car/bat/ca/cart/hello=1. Probes (top-5 >=3-char tokens,
    // 2nd char dropped): ct, bt, cr, crt, hllo. Hand-derived dist-1 sets:
    //   ct  -> cat(3), ca(1)        crt -> cat(3), cart(1)
    //   bt  -> bat                  hllo -> hello
    //   cr  -> ca, car (both n=1; token asc breaks the tie)
    val corpus = docsDf(1L -> "cat cat cat car bat ca cart hello")
    val out = graft.ops.Search.spellfixDocs(corpus)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val byProbe = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap
    assert(byProbe("ct") == Seq(("cat", 1L), ("ca", 1L)))
    assert(byProbe("bt") == Seq(("bat", 1L)))
    assert(byProbe("cr") == Seq(("ca", 1L), ("car", 1L)))
    assert(byProbe("crt") == Seq(("cat", 1L), ("cart", 1L)))
    assert(byProbe("hllo") == Seq(("hello", 1L)))
    assert(out.forall(_._3 <= 1L), "distance-1 contract violated")
  }

  test("nDCG: ideal ordering dominates, basis points bounded and consistent") {
    val rows = graft.ops.Search.ndcgEval(spark, sf)
      .select("dcg_fp", "idcg_fp", "ndcg_bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (dcg, idcg, bp) =>
      assert(dcg <= idcg, "served order cannot beat the ideal order")
      assert(bp >= 0L && bp <= 10000L)
      if (idcg == 0L) assert(bp == 0L && dcg == 0L)
      else assert(bp == dcg * 10000 / idcg)
    }
  }

  test("MRR/P@k: identities per query, consistent with the graded nDCG view") {
    val mrr = graft.ops.Search.mrrEval(spark, sf)
      .select("query_id", "first_rel_rnk", "rr_fp", "n_rel", "p_at_k_bp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(mrr.nonEmpty)
    mrr.foreach { case (_, first, rr, nRel, pk) =>
      assert((first == 0L) == (nRel == 0L), "first-rank/hit-count disagree")
      assert(rr == (if (first == 0L) 0L else 1000000L / first))
      assert(nRel <= graft.ops.Search.topK)
      assert(pk == nRel * 10000 / graft.ops.Search.topK)
      if (first > 0L) assert(first <= graft.ops.Search.topK)
    }
    // a query has a relevant hit (n_rel > 0) exactly when its ideal DCG > 0
    val idcg = graft.ops.Search.ndcgEval(spark, sf)
      .select("query_id", "idcg_fp").as[(Long, Long)].collect().toMap
    mrr.foreach { case (qid, _, _, nRel, _) =>
      assert((nRel > 0L) == (idcg(qid) > 0L), s"binary/graded views disagree for $qid")
    }
  }

  test("hand-checked Dirichlet QL fixed-point scores on a 4-doc corpus") {
    // tf/cf/dl as in the BM25 hand test: C = 12; cf apple 2, banana 5,
    // cherry 3, date 2; dl = 3 everywhere. Query d0 selects {apple, banana}
    // (its only distinct tokens), n_q = 2. Matched contributions
    // log2fp(tf·C + 300·cf) − log2fp(300·cf), length penalty
    // 2·(log2fp(303) − log2fp(300)) — recomputed here with an independent
    // Long-arithmetic log2fp.
    def log2fp(x: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      (bl - 1) * 1024L + x * 1024L / (1L << (bl - 1)) - 1024L
    }
    val corpus = docsDf(
      0L -> "apple banana banana", 1L -> "apple cherry cherry",
      2L -> "banana date date", 3L -> "banana banana cherry")
    val lenPen = 2L * (log2fp(303) - log2fp(300))
    val exp = Map(
      1L -> ((log2fp(1 * 12 + 300 * 2) - log2fp(300 * 2)) - lenPen),  // apple tf=1
      2L -> ((log2fp(1 * 12 + 300 * 5) - log2fp(300 * 5)) - lenPen),  // banana tf=1
      3L -> ((log2fp(2 * 12 + 300 * 5) - log2fp(300 * 5)) - lenPen))  // banana tf=2
    val got = graft.ops.Search.lmqlDocs(corpus, corpus.filter($"doc_id" === 0L))
      .select("neighbor_id", "score_fp", "n_terms")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, s) =>
      assert(got(id) == ((s, 1L)), s"score mismatch for doc $id: got ${got(id)}, want $s")
    }
  }

  test("LMQL ingest twin: neighbors only from the standing corpus") {
    val out = graft.ops.Search.lmqlIngestTopK(spark, sf)
      .select("query_id", "neighbor_id", "rnk").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % graft.ops.Similarity.knnBatchMod == 7),
      "ingest queries must be the arrivals")
    assert(out.forall(_.getLong(1) % graft.ops.Similarity.knnBatchMod != 7),
      "an arrival leaked into the standing index")
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getLong(2)).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq)
    }
  }

  test("LTR features: candidate set is the BM25 top-k; LM leg equals lmqlTopK on shared pairs") {
    val ltr = graft.ops.Search.ltrFeatures(spark, sf)
      .select("query_id", "neighbor_id", "rnk", "score_m", "lm_fp", "lm_terms", "n_q", "rel")
      .collect()
    assert(ltr.nonEmpty)
    // candidate identity: exactly the member BM25 top-k, same ranks/scores
    val bm = graft.ops.Search.bm25TopK(spark, sf)
      .select("query_id", "neighbor_id", "rnk", "score_m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ltr.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet == bm)
    // feature sanity: label domain, matched-term bound
    ltr.foreach { r =>
      assert(Set(0L, 1L, 2L).contains(r.getLong(7)))
      assert(r.getLong(5) <= r.getLong(6), "lm_terms must be bounded by n_q")
    }
    // cross-scorer exactness: where a candidate also appears in the LM
    // top-k, the LTR lm_fp must BE that query's lmql score
    val lm = graft.ops.Search.lmqlTopK(spark, sf)
      .select("query_id", "neighbor_id", "score_fp").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val shared = ltr.flatMap { r =>
      lm.get((r.getLong(0), r.getLong(1))).map(s => (r.getLong(4), s))
    }
    assert(shared.nonEmpty, "expected overlap between BM25 and LM top-k")
    shared.foreach { case (ltrFp, lmFp) => assert(ltrFp == lmFp) }
  }

  test("LTR feature plan: candidates broadcast onto every corpus-sized side") {
    // the scale pin: k-per-query candidates must never shuffle the length,
    // posting or metadata relations into a sort-merge join
    val p = graft.ops.Search.ltrFeatures(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"LTR feature joins must be broadcast-only:\n$p")
  }

  test("LTR pairs: exactly the (better, worse) pairs of the feature relation") {
    val f = graft.ops.Search.ltrFeatures(spark, sf)
      .select("query_id", "neighbor_id", "rel", "score_m", "lm_fp", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val want = f.groupBy(_._1).values.flatMap { g =>
      val rows = g.toSeq
      for (a <- rows; b <- rows if a._3 > b._3)
        yield (a._1, a._2, b._2, a._3, b._3, a._4 - b._4, a._5 - b._5, a._6 - b._6)
    }.toSet
    val got = graft.ops.Search.ltrPairs(spark, sf)
      .select("query_id", "pos_id", "neg_id", "pos_rel", "neg_rel",
        "d_score_m", "d_lm_fp", "d_rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce at least one preference pair")
  }

  test("LM MRR: identities per query, consistent with the LM graded view") {
    val mrr = graft.ops.Search.lmMrrEval(spark, sf)
      .select("query_id", "first_rel_rnk", "rr_fp", "n_rel", "p_at_k_bp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(mrr.nonEmpty)
    mrr.foreach { case (_, first, rr, nRel, pk) =>
      assert((first == 0L) == (nRel == 0L))
      assert(rr == (if (first == 0L) 0L else 1000000L / first))
      assert(nRel <= graft.ops.Search.topK)
      assert(pk == nRel * 10000 / graft.ops.Search.topK)
    }
    val idcg = graft.ops.Search.lmNdcgEval(spark, sf)
      .select("query_id", "idcg_fp").as[(Long, Long)].collect().toMap
    mrr.foreach { case (qid, _, _, nRel, _) =>
      assert((nRel > 0L) == (idcg(qid) > 0L), s"binary/graded LM views disagree for $qid")
    }
  }

  test("LM nDCG: bounds hold; equals the BM25 eval exactly where the rankings agree") {
    val bm = graft.ops.Search.ndcgEval(spark, sf)
      .select("query_id", "ndcg_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lm = graft.ops.Search.lmNdcgEval(spark, sf)
      .select("query_id", "ndcg_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm.nonEmpty)
    lm.values.foreach(v => assert(v >= 0L && v <= 10000L))
    // where the scorer diff reports IDENTICAL rankings (full overlap, zero
    // shift), the two quality numbers must coincide — same labels, same
    // discounts, same cutoff
    val identical = graft.ops.Search.scorerDiff(spark, sf)
      .select("query_id", "n_common", "n_bm_only", "n_lm_only", "max_shift")
      .collect()
      .filter(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
      .map(_.getLong(0))
    identical.foreach { q =>
      assert(bm(q) == lm(q), s"identical rankings scored differently for $q")
    }
  }

  test("scorer diff: identities against independently collected rankings") {
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Map[Long, Long]] =
      df.select("query_id", "neighbor_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val bm = ranks(graft.ops.Search.bm25TopK(spark, sf))
    val lm = ranks(graft.ops.Search.lmqlTopK(spark, sf))
    val got = graft.ops.Search.scorerDiff(spark, sf)
      .select("query_id", "n_common", "n_bm_only", "n_lm_only", "max_shift", "top1_agree")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val qids = bm.keySet ++ lm.keySet
    assert(got.keySet == qids && qids.nonEmpty)
    qids.foreach { q =>
      val b = bm.getOrElse(q, Map.empty)
      val l = lm.getOrElse(q, Map.empty)
      val common = b.keySet.intersect(l.keySet)
      val shift = if (common.isEmpty) 0L
        else common.map(n => math.abs(b(n) - l(n))).max
      val top1 = (for {
        bt <- b.find(_._2 == 1L).map(_._1)
        lt <- l.find(_._2 == 1L).map(_._1)
      } yield if (bt == lt) 1L else 0L).getOrElse(0L)
      assert(got(q) == ((common.size.toLong, (b.keySet -- l.keySet).size.toLong,
        (l.keySet -- b.keySet).size.toLong, shift, top1)), s"diff mismatch for $q")
    }
  }

  test("index stats: hand-checked df bands on a 4-doc corpus") {
    // df: apple 2 (docs 0,1), banana 3 (0,2,3), cherry 2 (1,3), date 1 (2)
    // bands = floor(log2 df): date → 0; apple/cherry (2) and banana (3) → 1
    val corpus = docsDf(
      0L -> "apple banana banana", 1L -> "apple cherry cherry",
      2L -> "banana date date", 3L -> "banana banana cherry")
    val got = graft.ops.Search.indexStatsDocs(corpus)
      .select("band", "n_tokens", "total_postings", "kept_postings", "max_df")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set((0L, 1L, 1L, 1L, 1L), (1L, 3L, 7L, 7L, 3L)))
  }

  test("LMQL member search: no self-matches, ranks contiguous, k-bounded") {
    val out = graft.ops.Search.lmqlTopK(spark, sf)
      .select("query_id", "neighbor_id", "rnk", "n_terms").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    assert(out.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= graft.ops.Search.qTerms))
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getLong(2)).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq && rnks.length <= graft.ops.Search.topK)
    }
  }

  test("rank churn: identities against independently recomputed probes") {
    val docs = Tables.documents(spark, sf)
    val q = docs.filter($"doc_id" % 100 === 0).select($"doc_id", $"text")
    def perQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy($"query_id").count()
        .as[(Long, Long)].collect().toMap
    val oldN = perQuery(graft.ops.Search.bm25Probe(q, graft.ops.Search.ingestIndex(spark, sf)))
    val newN = perQuery(graft.ops.Search.bm25Probe(q, graft.ops.Search.bm25IndexDocs(docs)))
    val churn = graft.ops.Search.rankChurn(spark, sf)
      .select("query_id", "n_common", "n_lost", "n_gained", "max_shift")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(churn.nonEmpty)
    churn.foreach { case (qid, common, lost, gained, shift) =>
      assert(common + lost == oldN.getOrElse(qid, 0L), s"old-side identity broke for $qid")
      assert(common + gained == newN.getOrElse(qid, 0L), s"new-side identity broke for $qid")
      assert(shift >= 0L && shift < graft.ops.Search.topK)
      if (common == 0L) assert(shift == 0L, s"shift without survivors for $qid")
    }
  }

  test("proximity rerank: hand-checked inverse-square pair gaps") {
    // Query d0 (doc_id % 100 == 0) selects terms {apple, banana}. Gaps:
    //  d1 "apple x banana":      apple@1, banana@3   → pair gap 2 → 250000
    //  d2 "banana apple":        banana@1, apple@2   → pair gap 1 → 1000000
    //  d3 "apple x x banana apple": pairs (1,4) gap 3 → 111111, (4,5) gap 1
    //                            → 1000000; sum 1111111, min_gap 1
    // (the 'x' filler is a corpus term but not a query term — its
    // positions must not interrupt the query-term pair walk)
    val corpus = docsDf(
      0L -> "apple banana", 1L -> "apple x banana",
      2L -> "banana apple", 3L -> "apple x x banana apple")
    val out = graft.ops.Search.proximityOn(corpus)
      .select("neighbor_id", "min_gap", "prox_m", "score_m", "final_m", "prnk")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 2L && out(1L)._2 == 250000L)
    assert(out(2L)._1 == 1L && out(2L)._2 == 1000000L)
    assert(out(3L)._1 == 1L && out(3L)._2 == 1111111L)
    // final = score + prox; prnk is the dense re-rank over final desc
    out.values.foreach { case (_, prox, score, fin, _) =>
      assert(fin == score + prox) }
    val byRank = out.toSeq.sortBy(_._2._5).map(_._2._4)
    assert(byRank == byRank.sortBy(-_), "prnk does not follow final_m desc")
  }

  test("proximity rerank on the fixture: ranks contiguous, prox/min_gap consistent") {
    val rows = graft.ops.Search.proximityRerank(spark, sf)
      .select("query_id", "score_m", "min_gap", "prox_m", "final_m", "prnk")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) + r.getLong(3), "final != score + prox")
      assert((r.getLong(2) == 0L) == (r.getLong(3) == 0L),
        "min_gap and prox_m must be zero together") }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getLong(5)).sorted.toSeq
      assert(rnks == (1L to rs.length).toSeq, "prnk not contiguous from 1") }
  }

  test("cross-encoder rerank: permutation of the candidates, head recomputed driver-side, non-degenerate") {
    val rows = graft.ops.Search.ceRerank(spark, sf)
      .select("query_id", "neighbor_id", "bm25_rnk", "score_m", "lm_fp",
        "ce_fp", "ce_rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // the head is exactly the documented stub logit — recomputed here from
    // the feature relation, independently of the SQL text both plans share
    val feat = graft.ops.Search.ltrFeatures(spark, sf)
      .select("query_id", "neighbor_id", "score_m", "lm_fp", "n_terms", "dl")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (3L * math.min(r.getLong(2), 20000L) + 2L * math.max(r.getLong(3), -2000000L)
          + 1000L * r.getLong(4) - 50L * math.min(r.getLong(5), 400L)))
      .toMap
    rows.foreach { case (q, n, _, _, _, ce, _) =>
      assert(ce == feat((q, n)), s"head diverged for ($q, $n)") }
    // per query: the rerank is a PERMUTATION of the BM25 candidates (a
    // second stage reorders, never adds or drops), contiguous from 1,
    // ordered by (ce_fp desc, neighbor_id)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == rs.map(_._7).sorted.toSeq,
        s"rerank not a permutation for query $q")
      val byCe = rs.sortBy(r => (-r._6, r._2)).map(_._7).toSeq
      assert(byCe == (1L to rs.length).toSeq, s"ce_rnk order wrong for $q")
    }
    // non-degenerate: the second stage must actually MOVE something
    assert(rows.exists { case (_, _, bm, _, _, _, ce) => bm != ce },
      "cross-encoder rerank never disagreed with BM25 — head degenerate")
    // the eval row set covers exactly the reranked queries
    val evalQs = graft.ops.Search.ceNdcgEval(spark, sf)
      .select("query_id").collect().map(_.getLong(0)).toSet
    assert(evalQs == rows.map(_._1).toSet)
  }
}
