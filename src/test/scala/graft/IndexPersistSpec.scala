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
    val memoLm = rows(ops.Search.lmqlIngestTopK(spark, sf))
    val memoGraph = rows(ops.Similarity.navGraph(spark, sf))
    val memoSigs = rows(ops.Dedup.signatures(spark, sf))
    val memoPhash = rows(ops.MultimodalPipeline.imagePhash(spark, sf))
    val memoLtr = rows(ops.Search.ltrFeatures(spark, sf))
    val memoCe = rows(ops.Search.ceRerank(spark, sf))
    val memoPhraseN = rows(ops.Search.phraseIndexSearchN(spark, sf))
    val memoProx = rows(ops.Search.proximityRerank(spark, sf))
    assert(memoSearch.nonEmpty && memoRm3.nonEmpty && memoLm.nonEmpty &&
      memoGraph.nonEmpty && memoSigs.nonEmpty && memoPhash.nonEmpty &&
      memoLtr.nonEmpty && memoCe.nonEmpty && memoPhraseN.nonEmpty &&
      memoProx.nonEmpty)

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
      val lmPlan = ops.Search.lmIngestIndex(spark, sf)
        .postings.queryExecution.executedPlan.toString
      assert(lmPlan.contains("lm_postings"),
        s"persisted mode must scan the store's LM postings:\n$lmPlan")
      assert(rows(ops.Search.lmqlIngestTopK(spark, sf)) == memoLm,
        "LM ingest answers diverged between memo and persisted mode")
      assert(rows(ops.Similarity.navGraph(spark, sf)) == memoGraph,
        "persisted nav graph diverged from the memoized one")
      assert(rows(ops.Dedup.signatures(spark, sf)) == memoSigs,
        "persisted MinHash signatures diverged from the memoized ones")
      val pplan = ops.MultimodalPipeline.imagePhash(spark, sf)
        .queryExecution.executedPlan.toString
      assert(pplan.contains("image_phash"),
        s"persisted mode must scan the store's fingerprints, not re-decode:\n$pplan")
      assert(rows(ops.MultimodalPipeline.imagePhash(spark, sf)) == memoPhash,
        "persisted image fingerprints diverged from the decoded ones")
      // the member feature log (r16): nine queries read it; store-served
      // rows AND a downstream consumer (the CE rerank) must be identical
      val lplan = ops.Search.ltrFeatures(spark, sf)
        .queryExecution.executedPlan.toString
      assert(lplan.contains("ltr_features"),
        s"persisted mode must scan the store's feature log, not re-probe:\n$lplan")
      assert(rows(ops.Search.ltrFeatures(spark, sf)) == memoLtr,
        "persisted feature log diverged from the derived one")
      assert(rows(ops.Search.ceRerank(spark, sf)) == memoCe,
        "CE rerank answers diverged between memo and persisted mode")
      // the bucketed probe index (r16): the kNN/graph ingest probes' seed
      // relation must come from the store, identically to the derivation
      val kplan = ops.Similarity.knnCorpusIndex(spark, sf)
        .queryExecution.executedPlan.toString
      assert(kplan.contains("knn_probe_index"),
        s"persisted mode must scan the store's probe index, not re-bucket:\n$kplan")
      assert(rows(ops.Similarity.knnCorpusIndex(spark, sf)) ==
        rows(ops.Similarity.standingProbeIndex(spark, sf)),
        "persisted probe index diverged from the derivation")
      // the positional tier (r17): phrase search + proximity must read
      // the store's postings/workload parquet, identically to derivation
      val phPlan = ops.Search.positionalPostings(spark, sf)
        .queryExecution.executedPlan.toString
      assert(phPlan.contains("phrase_postings"),
        s"persisted mode must scan the store's positional postings:\n$phPlan")
      val wlPlan = ops.Search.phraseWorkloadTable(spark, sf)
        .queryExecution.executedPlan.toString
      assert(wlPlan.contains("phrase_workload"),
        s"persisted mode must scan the store's phrase workload:\n$wlPlan")
      assert(rows(ops.Search.phraseIndexSearchN(spark, sf)) == memoPhraseN,
        "phrase-N answers diverged between memo and persisted mode")
      assert(rows(ops.Search.proximityRerank(spark, sf)) == memoProx,
        "proximity answers diverged between memo and persisted mode")
      // the r17 relations: chunk vectors and the versioned quantizer
      // state must be store-READ and identical to their derivations
      val cvPlan = ops.Search.chunkVectors(spark, sf)
        .queryExecution.executedPlan.toString
      assert(cvPlan.contains("chunk_vectors"),
        s"persisted mode must scan the store's chunk vectors:\n$cvPlan")
      assert(rows(ops.Search.chunkVectors(spark, sf)) ==
        rows(ops.Search.chunkVectorsDerive(spark, sf)),
        "persisted chunk vectors diverged from the derivation")
      val qsPlan = ops.Similarity.standingQuantizerState(spark, sf)
        .queryExecution.executedPlan.toString
      assert(qsPlan.contains("quantizer_state"),
        s"persisted mode must scan the store's quantizer state:\n$qsPlan")
      assert(rows(ops.Similarity.standingQuantizerState(spark, sf)) ==
        rows(ops.Similarity.standingQuantizerStateDerive(spark, sf).drop("epoch")),
        "persisted quantizer state (latest epoch) diverged from the derivation")
    } finally spark.conf.unset(ops.IndexStore.indexDirConf)
  }

  test("the streamed serving twin reads the persisted index: conf propagates to the stream session") {
    // The deployment path: a serving STREAM against a store built in an
    // earlier session. EventPipeline.streamingSession copies every
    // spark.graft.* conf into the child session (and keys its memo on
    // them), so the store must reach the streamed probe's index reads —
    // this pins it end to end through the file-source wrapper.
    val store = ops.SpillMemo.scratchDir("graft-idxstream-")
    tools.IndexBuild.buildTo(spark, sf, store)
    val batch = rows(ops.Search.bm25IngestTopK(spark, sf)) // memo mode
    spark.conf.set(ops.IndexStore.indexDirConf, store)
    try {
      val streamed = rows(streaming.SearchStream.streamedSearch(spark, sf))
      assert(streamed == batch,
        "store-served streamed search diverged from the memo-mode batch search")
      assert(streamed.nonEmpty)
    } finally spark.conf.unset(ops.IndexStore.indexDirConf)
  }

  test("a store built for another corpus fails loudly instead of serving wrong answers") {
    // An index over corpus A answering queries about corpus B is the worst
    // persisted-index failure mode (wrong results, no error) — the meta's
    // recorded source gates every read.
    val store = ops.SpillMemo.scratchDir("graft-idxwrong-")
    tools.IndexBuild.buildTo(spark, sf, store)
    // rewrite the meta to claim a different source corpus
    val mp = java.nio.file.Paths.get(s"$store/INDEX_META.json")
    java.nio.file.Files.writeString(mp,
      java.nio.file.Files.readString(mp)
        .replace(s""""source": "$sf"""", """"source": "/some/other/corpus""""))
    // the out-of-band rewrite invalidates Hadoop's checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$store/.INDEX_META.json.crc"))
    spark.conf.set(ops.IndexStore.indexDirConf, store)
    try {
      val e = intercept[IllegalArgumentException] {
        ops.Search.bm25IngestTopK(spark, sf).collect()
      }
      assert(e.getMessage.contains("was built for corpus"), e.getMessage)
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
