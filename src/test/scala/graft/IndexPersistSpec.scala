package graft

import org.apache.spark.sql.DataFrame

/** Cross-session index persistence ([[graft.ops.IndexStore]] +
  * [[graft.tools.IndexBuild]]): a store built once must serve IDENTICAL
  * answers to the session-memo derivation across every index family it
  * carries — lexical (BM25 + RM3), dense (nav-graph beam), and dedup
  * (MinHash LSH) — and persisted-mode serving must actually READ the store
  * (a parquet scan in the plan), not silently re-derive. */
class IndexPersistSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("persisted store serves identical answers to memo mode; serving reads parquet") {
    // Memo-mode relations/answers FIRST (store unset — also what the build
    // derives). The graph-beam and LSH QUERY entries memoize their results
    // per session, so re-calling them under the conf would trivially pass —
    // the cross-mode comparison runs on the store-served RELATIONS those
    // queries consume (identical relation ⇒ identical downstream answers;
    // the two *search* answers have no result memo and are compared whole).
    val memoSearch = rows(ops.Search.bm25IngestTopK(spark, sf))
    val memoRm3 = rows(ops.Search.rm3IngestSearch(spark, sf))
    val memoGraph = rows(ops.Similarity.navGraph(spark, sf))
    val memoSigs = rows(ops.Dedup.signatures(spark, sf))
    assert(memoSearch.nonEmpty && memoRm3.nonEmpty &&
      memoGraph.nonEmpty && memoSigs.nonEmpty)

    val store = ops.SpillMemo.scratchDir("graft-idxstore-")
    tools.IndexBuild.buildTo(spark, sf, store)
    // the meta records what was built
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$store/INDEX_META.json"))
    assert(meta.contains("\"bm25_prune_per_term\": 256"), meta)

    spark.conf.set(ops.IndexStore.indexDirConf, store)
    try {
      // persisted-mode serving must READ the store: the postings relation
      // is a plain parquet scan of the persisted files
      val plan = ops.Search.ingestIndex(spark, sf)
        .postings.queryExecution.executedPlan.toString
      assert(plan.contains("parquet") && plan.contains("bm25_postings"),
        s"persisted mode must scan the store's parquet, not re-derive:\n$plan")
      val gplan = ops.Similarity.navGraph(spark, sf)
        .queryExecution.executedPlan.toString
      assert(gplan.contains("nav_graph"),
        s"persisted mode must scan the store's nav graph:\n$gplan")

      assert(rows(ops.Search.bm25IngestTopK(spark, sf)) == memoSearch,
        "BM25 ingest answers diverged between memo and persisted mode")
      assert(rows(ops.Search.rm3IngestSearch(spark, sf)) == memoRm3,
        "RM3 ingest answers diverged between memo and persisted mode")
      assert(rows(ops.Similarity.navGraph(spark, sf)) == memoGraph,
        "persisted nav graph diverged from the memoized one")
      assert(rows(ops.Dedup.signatures(spark, sf)) == memoSigs,
        "persisted MinHash signatures diverged from the memoized ones")
    } finally spark.conf.unset(ops.IndexStore.indexDirConf)
  }

  test("a configured-but-missing store fails loudly; a partial store falls back per relation") {
    spark.conf.set(ops.IndexStore.indexDirConf, "/nonexistent/graft-store")
    try {
      val e = intercept[IllegalArgumentException] {
        ops.Search.bm25IngestTopK(spark, sf).collect()
      }
      assert(e.getMessage.contains("IndexBuild"), e.getMessage)
    } finally spark.conf.unset(ops.IndexStore.indexDirConf)

    // partial store: only the nav graph — lexical serving derives as before
    val partial = ops.SpillMemo.scratchDir("graft-idxpart-")
    ops.Similarity.navGraph(spark, sf).write.mode("overwrite")
      .parquet(s"$partial/${ops.IndexStore.navGraph}")
    val memoSearch = rows(ops.Search.bm25IngestTopK(spark, sf))
    spark.conf.set(ops.IndexStore.indexDirConf, partial)
    try assert(rows(ops.Search.bm25IngestTopK(spark, sf)) == memoSearch,
      "a store without the lexical index must fall back to derivation")
    finally spark.conf.unset(ops.IndexStore.indexDirConf)
  }
}
