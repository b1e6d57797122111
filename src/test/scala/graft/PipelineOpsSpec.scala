package graft

import graft.ops.{Analytics, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-6 pipeline ops, beyond what the DuckDB
  * oracle's value-hash asserts: survivor-selection invariants (one survivor
  * per cluster, argmax by length, member conservation), the incremental
  * dedup's asymmetry contract (new docs never match new docs), the weighted
  * sampler's ticket arithmetic and draw determinism, the model gate's
  * decision boundary, and the profile/card cross-checks against
  * independently computed counts. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("keepBest: one survivor per component, argmax by (n_words, doc_id), members conserved") {
    val comp = Dedup.components(spark, sf).withColumnRenamed("comp", "c")
    val best = Dedup.keepBest(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    // every component appears exactly once and membership sums to the corpus
    assert(best.groupBy($"comp").count().filter($"count" > 1).isEmpty)
    assert(best.agg(sum($"n_members")).as[Long].head() == nDocs)
    // the survivor is its component's max-length doc (min doc_id tiebreak)
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("len"))
    val argmax = comp.join(lens, "doc_id")
      .groupBy($"c").agg(
        max(struct($"len", (-$"doc_id").as("negid"))).as("m"))
      .select($"c".as("comp"), $"m.len".as("exp_words"),
        (-$"m.negid").as("exp_id"))
    val joined = best.join(argmax, "comp")
    assert(joined.filter($"keep_id" =!= $"exp_id" || $"keep_words" =!= $"exp_words").isEmpty)
  }

  test("incremental: covers exactly the new batch, matches only corpus docs, verdict consistent") {
    val out = Dedup.incremental(spark, sf).cache()
    val newIds = Tables.documents(spark, sf)
      .filter($"doc_id" % 10 === 7).select($"doc_id").as[Long].collect().toSet
    assert(out.select($"new_id").as[Long].collect().toSet == newIds)
    // dup_of always points INTO the indexed corpus, never at the new batch
    assert(out.filter($"dup_of".isNotNull && $"dup_of" % 10 === 7).isEmpty)
    assert(out.filter($"is_dup" =!= $"dup_of".isNotNull).isEmpty)
    assert(out.filter(!$"is_dup" && $"n_matches" =!= 0).isEmpty)
    out.unpersist()
  }

  test("weightedSample: ticket arithmetic, cap, and draw determinism") {
    val out = Sampling.queries("x_sample_weighted")(spark, sf)
    val rows = out.select($"doc_id", $"n_words", $"weight", $"ticket")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.length == 50)
    rows.foreach { case (id, nw, w, t) =>
      assert(w == math.min(nw / 100 + 1, 8L))
      val exp = (1L to w).map(j => md5hex(s"$id:$j")).min
      assert(t == exp, s"doc $id ticket mismatch")
    }
    // pure function of stable keys: a second run draws the identical sample
    val again = Sampling.queries("x_sample_weighted")(spark, sf)
      .select($"doc_id").as[Long].collect().toSeq
    assert(again == rows.map(_._1).toSeq)
  }

  test("weightedSample: tickets are the 50 smallest in the corpus") {
    val all = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("nw"))
      .as[(Long, Long)].collect()
    val keys = all.map { case (id, nw) =>
      val w = math.min(nw / 100 + 1, 8L)
      ((1L to w).map(j => md5hex(s"$id:$j")).min, id)
    }.sorted.take(50).map(_._2).toSeq
    val got = Sampling.queries("x_sample_weighted")(spark, sf)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == keys)
  }

  test("modelGate: admits exactly score_m >= 0, score matches the published weights") {
    val out = TextAnalysis.modelGate(spark, sf)
    assert(out.filter($"is_admit" =!= ($"score_m" >= 0)).isEmpty)
    val bad = out.filter(
      $"score_m" =!= lit(4L) * $"stop_pm" - lit(3L) * $"punct_pm" +
        lit(2L) * least($"n_words", lit(500L)) - 900L)
    assert(bad.isEmpty)
    // per-mille features are integer division of the raw counts
    assert(out.filter($"stop_pm" =!= expr("n_stop * 1000 div n_words")).isEmpty)
  }

  test("docBase covers zero-token docs: modelGate scores every document") {
    // A doc whose text yields no non-empty tokens has no surprisal row; the
    // base relation must still carry it (left join, counts coalesced to 0)
    // so the map-side consumers score ALL docs like their oracles do, while
    // docFeatures' contract (inner join in its oracle) still excludes it.
    val dir = graft.ops.SpillMemo.scratchDir("graft-docbase-t-")
    Seq(
      (1L, "en", "the quick brown fox"),
      (2L, "en", ""), // splits to [""] → zero non-empty tokens
      (3L, "de", "   ")) // splits to ["","","",""] → zero non-empty tokens
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val gate = TextAnalysis.modelGate(spark, dir)
    assert(gate.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val feats = TextAnalysis.docFeatures(spark, dir)
    assert(feats.select($"doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("packBfd: no document split, capacity respected, remaining exact, deterministic") {
    val out = Sampling.packBfd(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    // whole-document invariant: every doc lands exactly once, in ONE bin
    assert(out.count() == nDocs)
    assert(out.select($"doc_id").distinct().count() == nDocs)
    // capacity: a bin's token total fits the context, unless it holds a
    // single oversize doc (which gets a dedicated bin by construction)
    val bins = out.groupBy($"lang", $"bin_id")
      .agg(sum($"n_tokens").as("tok"), count(lit(1)).as("nd"),
        max($"n_tokens").as("mx"), min($"bin_rem").as("minrem"))
      .collect()
    bins.foreach { r =>
      val (tok, nd, mx, minrem) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(tok <= Sampling.ctxLen || (nd == 1L && mx > Sampling.ctxLen),
        s"overfull multi-doc bin: $r")
      // remaining capacity decreases monotonically, so the per-bin min is
      // the final state and must account for every placed token
      assert(minrem == Sampling.ctxLen - tok, s"bin_rem drifted from token sum: $r")
    }
    // pure function of stable keys: a second run packs identically
    val a = out.collect().map(_.toSeq).toSet
    val b = Sampling.packBfd(spark, sf).collect().map(_.toSeq).toSet
    assert(a == b)
    out.unpersist()
  }

  test("datasetCard: one row, cross-checked against independent counts") {
    val row = TextAnalysis.datasetCard(spark, sf)
    val docs = Tables.documents(spark, sf).cache()
    val nDocs = docs.count()
    val nUnique = docs.select(md5($"text")).distinct().count()
    val nLangs = docs.select($"lang").distinct().count()
    val r = row.select($"n_docs", $"n_unique", $"n_langs", $"n_dup_docs")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((nDocs, nUnique, nLangs, nDocs - nUnique)))
    docs.unpersist()
  }

  test("deadLetter: reasons partition the table, 'ok' equals the C4-filtered row count") {
    val ev = Tables.events(spark, sf).cache()
    val out = graft.ops.Parse.deadLetter(spark, sf)
      .select($"reason", $"n_rows").as[(String, Long)].collect().toMap
    assert(out.values.sum == ev.count(), "every row must land in exactly one reason")
    val okExpected = ev.filter(
      $"event_id".isNotNull && $"ts".isNotNull && $"user_id".isNotNull &&
        $"event_type".isNotNull && $"value".isNotNull).count()
    assert(out("ok") == okExpected)
    // first-null-wins: a row with null event_id lands there even if ts is also null
    val idNull = ev.filter($"event_id".isNull).count()
    assert(out.getOrElse("null_event_id", 0L) == idNull)
    ev.unpersist()
  }

  test("statsProfile: six column rows cross-checked against direct counts") {
    val ev = Tables.events(spark, sf).cache()
    val out = Analytics.statsProfile(spark, sf)
      .select($"col_name", $"n_null", $"n_distinct", $"n_rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    val nRows = ev.count()
    assert(out.values.forall(_._3 == nRows))
    val idNull = ev.filter($"event_id".isNull).count()
    val idDist = ev.filter($"event_id".isNotNull).select($"event_id").distinct().count()
    assert(out("event_id") == ((idNull, idDist, nRows)))
    val etDist = ev.filter($"event_type".isNotNull).select($"event_type").distinct().count()
    assert(out("event_type")._2 == etDist)
    ev.unpersist()
  }

  test("mixEpochs: cap, budget conservation, and shortfall semantics") {
    val rows = Sampling.mixEpochs(spark, sf)
      .select($"n_tokens", $"alloc_tokens", $"epochs_bp", $"shortfall_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // independent recomputation of the shared budget terms
    val tokens = Tables.documents(spark, sf)
      .select($"lang", $"source", size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"lang", $"source").agg(sum($"n").as("nt"))
      .select($"nt").as[Long].collect().toSeq
    val ideal = tokens.sum * 3 / tokens.size
    rows.foreach { case (nt, alloc, bp, short) =>
      assert(alloc <= 4 * nt, "epoch cap violated")
      assert(alloc <= ideal, "allocation exceeds the uniform budget share")
      assert(short >= 0 && short == ideal - alloc)
      assert(bp == alloc * 10000 / nt)
      // a shortfall means the stratum is pinned at the cap; no shortfall
      // means it got its full share
      if (short > 0) assert(bp == 40000, "data-constrained stratum not at cap")
      else assert(alloc == ideal)
    }
    // every budgeted token is either allocated or declared a shortfall
    assert(rows.map(r => r._2 + r._4).sum == ideal * rows.size)
  }

  test("curriculumOrder: offset-sum position equals the global interleave window") {
    import org.apache.spark.sql.expressions.Window
    val out = TextAnalysis.curriculumOrder(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // pos is a permutation of 1..n
    assert(out.select(countDistinct($"pos")).as[Long].head() == n)
    assert(out.agg(min($"pos"), max($"pos")).as[(Long, Long)].head() == ((1L, n)))
    // the broadcast-directory offset formulation must equal the literal
    // global window it exists to avoid
    val ref = out.select($"doc_id", $"wave", $"lang", $"source")
      .withColumn("rpos", row_number()
        .over(Window.orderBy($"wave", $"lang", $"source")).cast("long"))
    assert(out.join(ref.select($"doc_id", $"rpos"), "doc_id")
      .filter($"pos" =!= $"rpos").isEmpty)
    // round-robin interleave: wave 1 of every stratum fills the first
    // |strata| slots
    val nStrata = out.select($"lang", $"source").distinct().count()
    assert(out.filter($"wave" === 1).agg(max($"pos")).as[Long].head() == nStrata)
    out.unpersist()
  }

  test("mixTemperature: sqrt smoothing shrinks big strata, grows small ones, shares conserve") {
    val rows = Sampling.mixTemperature(spark, sf)
      .select($"n_docs", $"share_bp", $"temp_share_bp", $"boost_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // floor-division shares: each sum lands within one rounding unit per stratum
    val shareSum = rows.map(_._2).sum
    val tempSum = rows.map(_._3).sum
    assert(shareSum > 10000 - n && shareSum <= 10000, s"raw shares sum $shareSum")
    assert(tempSum > 10000 - n && tempSum <= 10000, s"temp shares sum $tempSum")
    // α = 1/2 direction: the largest stratum must not gain mass, the
    // smallest must not lose it (up to the ±1 bp floor-rounding of each share)
    val biggest = rows.maxBy(_._1)
    val smallest = rows.minBy(_._1)
    assert(biggest._3 <= biggest._2 + 1, s"largest stratum gained: $biggest")
    assert(smallest._3 >= smallest._2 - 1, s"smallest stratum shrank: $smallest")
    assert(smallest._4 >= biggest._4, "boost must favor the smaller stratum")
  }

  test("decontamOverlap: bounded per-item scores, consistent with the pair-level decontaminate") {
    val overlap = Dedup.decontamOverlap(spark, sf)
      .select($"eval_id", $"n_shingles", $"n_hit", $"overlap_bp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(overlap.nonEmpty)
    overlap.values.foreach { case (id, n, hit, bp) =>
      assert(hit >= 0 && hit <= n, s"eval $id hit count out of range")
      assert(bp == hit * 10000 / n, s"eval $id bp inconsistent")
    }
    // every eval item the pair-level check flags must score at least the
    // flagged pair's shared-shingle count (its hits subsume any one pair's)
    Dedup.decontaminate(spark, sf)
      .select($"eval_id", $"shared").as[(Long, Long)].collect()
      .groupBy(_._1).foreach { case (evalId, pairs) =>
        val maxShared = pairs.map(_._2).max
        assert(overlap(evalId)._3 >= maxShared,
          s"eval $evalId: per-item hits ${overlap(evalId)._3} < pair-level shared $maxShared")
      }
  }

  test("vocabCoverage: monotone in vocab size, bounded, checkpoints complete") {
    val rows = TextAnalysis.vocabCoverage(spark, sf)
      .select($"n_vocab", $"covered_tokens", $"total_tokens", $"coverage_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == TextAnalysis.coverageNs)
    assert(rows.map(_._3).distinct.length == 1, "one global total")
    rows.foreach { case (n, cov, tot, bp) =>
      assert(cov >= 0 && cov <= tot, s"n=$n covered out of range")
      assert(bp == cov * 10000 / tot, s"n=$n bp inconsistent")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2, "coverage must be non-decreasing in vocab size")
      case _ =>
    }
    // cross-check the smallest checkpoint against a direct computation
    val tf = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t")).filter(length($"t") > 0)
      .groupBy($"t").agg(count(lit(1)).as("tf"))
      .as[(String, Long)].collect()
    val directTop10 = tf.sortBy(r => (-r._2, r._1)).take(10).map(_._2).sum
    assert(rows.head._2 == directTop10, "top-10 coverage diverges from direct computation")
  }

  test("lengthBuckets: docs conserved, padding identity holds, only the top cap truncates") {
    val rows = Sampling.lengthBuckets(spark, sf)
      .select($"cap", $"n_docs", $"sum_tokens", $"padding_tokens", $"truncated_tokens", $"waste_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    val maxCap = Sampling.lengthBucketCaps.max
    rows.foreach { case (cap, nd, tok, pad, trunc, bp) =>
      assert(Sampling.lengthBucketCaps.contains(cap), s"unknown cap $cap")
      assert(bp >= 0 && bp <= 10000, s"cap $cap waste out of range")
      if (cap != maxCap) assert(trunc == 0, s"cap $cap must not truncate")
      // capacity = used + padded (truncated tokens never entered capacity)
      assert(nd * cap == (tok - trunc) + pad, s"cap $cap capacity identity broken")
    }
  }

  test("qualityCalibrate: per-language percentiles span 0..10000 and order by score") {
    val rows = TextAnalysis.qualityCalibrate(spark, sf)
      .select($"lang", $"score_m", $"rnk", $"n_lang", $"pct_bp")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.head._4
      assert(rs.length == n, s"$lang n_lang inconsistent")
      assert(rs.map(_._3).sorted.toSeq == (1L to n).toSeq, s"$lang ranks not dense")
      if (n >= 2) {
        assert(rs.map(_._5).min == 0, s"$lang worst doc must calibrate to 0")
        assert(rs.map(_._5).max == 10000, s"$lang best doc must calibrate to 10000")
      }
      // percentile must be monotone in the raw score within the language
      rs.sortBy(r => (r._2, r._3)).map(_._5).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$lang percentile not monotone in score")
        case _ =>
      }
    }
  }
}
