package graft

import org.apache.spark.sql.functions._

/** DSIR importance resampling ([[graft.ops.Sampling.dsirSample]]): the
  * fixed-point log₂ device pinned against hand values, target-typical
  * documents outranking raw-typical ones, and the end-to-end selection
  * actually tilting toward the target distribution. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("log2fp: hand-checked fixed-point log2 values") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 1024L, 1536L)
    val got = xs.toDF("x")
      .select(expr(graft.ops.Sampling.log2fpSpark("x")).as("l"))
      .collect().map(_.getLong(0)).toSeq
    // (bitlen-1)*1024 + floor(x*1024 / 2^(bitlen-1)) - 1024:
    // 1→0, 2→1024, 3→1536, 4→2048, 5→2048+256=2304, 1024→10240,
    // 1536→10240+512=10752. Monotone, exact at powers of two.
    assert(got == Seq(0L, 1024L, 1536L, 2048L, 2304L, 10240L, 10752L))
  }

  test("target-typical docs outscore raw-typical docs") {
    // en speaks 'falcon' (bucket 43), fr speaks 'meadow' (bucket 15); both share 'bridge'. A doc
    // made of the target's tokens must carry a higher likelihood ratio.
    val docs = Seq(
      (0L, "en", "falcon falcon falcon"),
      (1L, "en", "falcon falcon bridge"),
      (2L, "fr", "meadow meadow meadow"),
      (3L, "fr", "meadow meadow bridge"))
      .toDF("doc_id", "lang", "text")
    val scores = graft.ops.Sampling.dsirSampleDocs(docs)
      .select("doc_id", "score_mb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.size == 4, "quota must not cut a 4-doc corpus")
    assert(scores(0L) > scores(2L), "pure-target doc must outscore pure-raw doc")
    assert(scores(1L) > scores(3L), "mixed-target doc must outscore mixed-raw doc")
    assert(scores(0L) > scores(1L), "more target mass ⇒ higher score")
  }

  test("selection tilts toward the target language on real data") {
    val docs = Tables.documents(spark, sf)
    val corpusEn = docs.filter($"lang" === "en").count().toDouble / docs.count()
    val sel = graft.ops.Sampling.dsirSample(spark, sf).collect()
    assert(sel.length == math.min(graft.ops.Sampling.dsirQuota, sel.length))
    val selEn = sel.count(_.getString(1) == "en").toDouble / sel.length
    assert(selEn > corpusEn,
      s"DSIR selection ($selEn en) must over-represent the target vs the corpus ($corpusEn)")
  }
}
