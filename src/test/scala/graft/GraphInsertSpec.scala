package graft

import org.apache.spark.sql.functions._

/** Graph-index maintenance ([[graft.ops.Similarity.graphInsert]],
  * `x_sim_graph_insert`): inserting the arriving vectors must (a) give each
  * new vertex a ranked out-edge list equal to its ingest search results,
  * (b) re-trim exactly the TOUCHED corpus vertices' adjacency to the
  * top-degree by exact cosine over old edges ∪ reverse candidates —
  * recomputed driver-side here — and (c) make the new vertices genuinely
  * SEARCHABLE: a beam seeded at a new vertex walking the post-insert graph
  * reaches its true nearest neighbors. (c) is the property insertion
  * exists to provide — a graph that accepts writes its reads can't see is
  * not an index. */
class GraphInsertSpec extends SparkSpec {
  import ops.Similarity
  import spark.implicits._

  private val topK = 10
  private val degree = Similarity.graphDegree
  private val mod = Similarity.knnBatchMod

  private lazy val out = Similarity.graphInsert(spark, sf)
    .select($"src", $"dst", $"rnk", $"is_new")
    .as[(Long, Long, Long, Boolean)].collect()

  private lazy val searched = Similarity.graphBeamIngestTopK(spark, sf)
    .select($"query_id", $"neighbor_id", $"rnk")
    .as[(Long, Long, Long)].collect()

  /** (vec_id → vector) for the whole table, driver-side (sf0.001: 500). */
  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .as[(Long, Array[Double])].collect().toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The static corpus-induced edge set the insert starts from. */
  private lazy val staticEdges: Map[Long, Seq[Long]] =
    Similarity.ingestGraphIndex(spark, sf)._1
      .select($"src", $"dst").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2).toSeq }

  test("new vertices: out-edges are exactly the ingest search results, rank-dense") {
    val newRows = out.filter(_._4)
    assert(newRows.nonEmpty, "the ingest partition is non-empty at sf0.001")
    newRows.foreach { case (s0, d0, _, _) =>
      assert(s0 % mod == 7, s"new-vertex src $s0 must be an arriving id")
      assert(d0 % mod != 7, s"new-vertex edge dst $d0 must be a corpus member")
    }
    assert(newRows.map(r => (r._1, r._2, r._3)).toSet ==
      searched.map(s => (s._1, s._2, s._3)).toSet,
      "new-vertex adjacency must equal the memoized search results verbatim")
    newRows.groupBy(_._1).foreach { case (s0, rows) =>
      val rnks = rows.map(_._3).sorted.toSeq
      assert(rnks == (1L to rows.size.toLong).toSeq && rows.size <= topK,
        s"new vertex $s0 rank list must be dense 1..n<=k, got $rnks")
    }
  }

  test("touched vertices: adjacency re-trimmed to top-degree over old ∪ reverse candidates") {
    val trimmed = out.filter(!_._4).groupBy(_._1)
      .map { case (s0, rows) => s0 -> rows.sortBy(_._3).map(_._2).toSeq }
    val touched = searched.map(_._2).toSet
    assert(trimmed.keySet == touched,
      "re-trimmed rows must cover exactly the searched-into vertices")
    val reverse = searched.groupBy(_._2).map { case (n, qs) => n -> qs.map(_._1).toSeq }
    trimmed.foreach { case (s0, got) =>
      val cand = (staticEdges.getOrElse(s0, Seq.empty) ++ reverse(s0)).distinct
      val expect = cand
        .map(d0 => (d0, cos(vecs(s0), vecs(d0))))
        .sortBy { case (d0, sc) => (-sc, d0) }
        .take(degree).map(_._1)
      assert(got == expect,
        s"vertex $s0: post-insert adjacency must be the exact top-$degree re-trim")
      assert(got.size <= degree)
    }
  }

  test("post-insert search from a new vertex reaches its true neighbors") {
    // The post-insert adjacency: static edges, with touched vertices'
    // lists REPLACED by their re-trim, plus the new vertices' lists.
    val post: Map[Long, Seq[Long]] =
      staticEdges ++ out.filter(!_._4).groupBy(_._1)
        .map { case (s0, rows) => s0 -> rows.sortBy(_._3).map(_._2).toSeq } ++
        out.filter(_._4).groupBy(_._1)
          .map { case (s0, rows) => s0 -> rows.sortBy(_._3).map(_._2).toSeq }
    val corpusIds = vecs.keySet.filter(v => v % mod != 7 &&
      vecs(v).exists(_ != 0.0)).toSeq
    val queries = out.filter(_._4).map(_._1).distinct
    // Driver-side mirror of the engine's frontier-tracked beam
    // ([[Similarity.beamSearch]]): seed at the new vertex itself — the
    // corpus-member entry point insertion just created.
    var hit = 0; var want = 0
    queries.foreach { q =>
      val qv = vecs(q)
      var scores = Map[Long, Double](q -> 1.0)
      var expandedSet = Set.empty[Long]
      for (_ <- 1 to Similarity.graphHops) {
        val beam = scores.keys.toSeq.filterNot(expandedSet)
          .sortBy(c => (-scores(c), c)).take(Similarity.beamWidth)
        expandedSet ++= beam
        val frontier = beam.flatMap(post.getOrElse(_, Seq.empty)).distinct
          .filterNot(scores.contains)
        scores ++= frontier.map(c => c -> cos(qv, vecs(c)))
      }
      val got = (scores - q).toSeq.sortBy { case (c, sc) => (-sc, c) }
        .take(topK).map(_._1).toSet
      val truth = corpusIds.filter(_ != q)
        .map(c => (c, cos(qv, vecs(c))))
        .sortBy { case (c, sc) => (-sc, c) }.take(topK).map(_._1).toSet
      hit += got.intersect(truth).size
      want += truth.size
    }
    val recallBp = hit * 10000 / want
    // Deterministic corpus + deterministic walk: this is a fixed number,
    // asserted with margin below its measured value so a REGRESSION in
    // insert wiring (edges that don't connect, trims that orphan the new
    // vertex) fails loudly while the pin survives fixture regeneration.
    assert(recallBp >= 9000,
      s"aggregate recall@$topK from new vertices post-insert = $recallBp bp; " +
        "expected >= 9000 (searchable-after-insert contract)")
  }
}
