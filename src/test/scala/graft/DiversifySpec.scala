package graft

import org.apache.spark.sql.functions._

/** Diversity-selection tier ([[graft.ops.Diversify]]) + KMV set algebra
  * ([[graft.ops.Sketches.kmvOverlap]]): MMR's greedy contract on a corpus
  * built to punish pure relevance ranking, the cluster-balanced sample's
  * quota/determinism properties, and the overlap estimator's accuracy
  * against exact truth.
  */
class DiversifySpec extends SparkSpec {
  import spark.implicits._

  test("MMR: first pick is the relevance top-1; picks are distinct pool members") {
    val out = graft.ops.Diversify.mmrTopK(spark, sf).collect()
    assert(out.nonEmpty, "strided panel must be non-empty at sf0.001")
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq,
        "picks must be dense ranks 1..k")
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length == ids.length, "a result may be picked once")
      val first = rows.find(_.getLong(1) == 1L).get
      assert(first.getDouble(3) == rows.map(_.getDouble(3)).max,
        "pick 1 must be the highest-relevance candidate")
    }
  }

  test("MMR: spreads across near-duplicate clusters where pure top-k drowns") {
    graft.functions.GraftFunctions.register(spark)
    // Query between two near-orthogonal clusters; A's members are mutual
    // near-duplicates (pairwise sim ≈ 1), B is equally relevant but
    // orthogonal to A. Pure top-k floods with A copies; MMR(λ=.5) must
    // switch to B on pick 2 (A's redundancy penalty ≈ 1 vs B's ≈ 0).
    def a(i: Int): Array[Double] = Array(1.0, 0.0, 0.01 * i, 0.0)
    def b(j: Int): Array[Double] = Array(0.01 * j, 0.0, 1.0, 0.0)
    val rows = Seq(10L -> a(0), 11L -> a(1), 12L -> a(2), 13L -> a(3),
      20L -> b(0), 21L -> b(1))
    val c = rows.toDF("vec_id", "v")
    val q = Seq((0L, Array(1.0, 0.0, 1.0, 0.0))).toDF("query_id", "qv")
    val picks = graft.ops.Diversify.mmrFor(c, q)
      .orderBy("pick").collect().map(_.getLong(2)).toSeq
    // Pure relevance would rank A13, A12, A11 ... (and symmetric B ties
    // break low-id). MMR must alternate clusters immediately.
    assert(picks.take(2).exists(_ < 20L) && picks.take(2).exists(_ >= 20L),
      s"MMR must cover both clusters within 2 picks (got $picks)")
  }

  test("diversity eval: shifted ILS in range, gain consistent with its legs") {
    val out = graft.ops.Diversify.mmrDiversityEval(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, m, g) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t >= 0 && t <= 2000000 && m >= 0 && m <= 2000000,
        "shifted micro-unit ILS must stay within [0, 2e6]")
      assert(g == t - m, "gain must be the difference of its legs")
    }
  }

  test("MMR at ingest: answers come from the standing corpus only") {
    val out = graft.ops.Diversify.mmrIngest(spark, sf).collect()
    assert(out.nonEmpty)
    val m = graft.ops.Similarity.knnBatchMod
    out.foreach { r =>
      assert(r.getLong(0) % m == 7, "queries are the arriving partition")
      assert(r.getLong(2) % m != 7,
        s"pick ${r.getLong(2)} must be a standing vector, not a co-arrival")
    }
  }

  test("cluster-balanced: per-cell quota, cell sizes exact, hash-determinism") {
    val out = graft.ops.Diversify.clusterBalanced(spark, sf).collect()
    val byCell = out.groupBy(_.getLong(0))
    val asg = graft.ops.Similarity.kmeansIter(spark, sf)
      .groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCell.foreach { case (cell, rows) =>
      assert(rows.length == math.min(graft.ops.Diversify.cbPerCluster, asg(cell)),
        s"cell $cell must fill its quota or exhaust the cell")
      assert(rows.map(_.getLong(1)).distinct.toSeq == Seq(asg(cell)),
        "emitted n_cluster must equal the true cell size")
    }
    val again = graft.ops.Diversify.clusterBalanced(spark, sf).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet,
      "hash-ranked draw is deterministic")
  }

  test("KMV overlap: estimates track exact truth within bottom-k error") {
    val out = graft.ops.Sketches.kmvOverlap(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 10, "5 event types => 10 unordered pairs")
    out.foreach { r =>
      val exact = r.getLong(2); val est = r.getLong(3)
      // Bottom-k ratio estimator at k=64: ~3/sqrt(k) ≈ 37% relative error
      // ceiling (3σ); the uniform fixtures land far inside it. Guard the
      // absolute floor for small intersections.
      assert(math.abs(est - exact) <= math.max(0.4 * exact, 8.0),
        s"pair ${r.getString(0)}/${r.getString(1)}: est $est vs exact $exact")
    }
  }

  test("KMV overlap: exact when both sketches are unsaturated") {
    // Fewer than k=64 distinct users per type => sketches ARE the hash
    // sets and both estimates must equal exact truth.
    graft.functions.GraftFunctions.register(spark)
    val tmp = graft.ops.SpillMemo.scratchDir("graft-kmvov-")
    // user ids numeric-string: KeyedId carries the id as Long
    val ev = (0 until 40).flatMap { u =>
      Seq(("click", s"$u"), ("view", s"${u + 20}")) // overlap = 20..39
    }.toDF("event_type", "user_id")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("ts", current_timestamp())
      .withColumn("amount_cents", lit(0L))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.ops.Sketches.kmvOverlap(spark, tmp).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 20L, "exact intersection is the 20 shared users")
    assert(r.getLong(3) == r.getLong(2), "unsaturated => estimate IS exact")
    assert(r.getLong(4) == 60L, "unsaturated => union estimate exact too")
  }

  test("KMV overlap: still exact when the UNION reaches k but both sides don't") {
    // Two 40-user types sharing 16 users: each sketch unsaturated (40 < 64)
    // yet the merged hash set is exactly k=64 — the per-side saturation test
    // must keep this exact (the old |union| < k test would have estimated).
    graft.functions.GraftFunctions.register(spark)
    val tmp = graft.ops.SpillMemo.scratchDir("graft-kmvov2-")
    val ev = (0 until 40).flatMap { u =>
      Seq(("click", s"$u"), ("view", s"${u + 24}")) // overlap = 24..39 (16)
    }.toDF("event_type", "user_id")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("ts", current_timestamp())
      .withColumn("amount_cents", lit(0L))
      .withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.ops.Sketches.kmvOverlap(spark, tmp).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 16L, "exact intersection is the 16 shared users")
    assert(r.getLong(3) == 16L, "both sides unsaturated => intersection exact")
    assert(r.getLong(4) == 64L, "union of 64 distinct hashes reported exactly")
  }
}
