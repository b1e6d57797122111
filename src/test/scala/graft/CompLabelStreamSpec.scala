package graft

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Streamed dedup-component maintenance (`s_components_stream`): the
  * union-find-by-contraction fold must converge to the batch full-graph
  * labeling under any batching, HANDLE MERGES (a bridge arrival fusing
  * two standing components must relabel both sides' existing rows), and
  * replay idempotently. */
class CompLabelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "comp").as[(Long, Long)].collect().toSet

  /** Candidate edges of a (doc_id, text) frame — the same band self-join
    * `minhashLsh` runs, recomputed independently here so the test's truth
    * does not read the code under test's memos. */
  private def edgesOf(docs: DataFrame): DataFrame = {
    val bands = ops.Lineage.cut(
      Dedup.bandRelation(Dedup.ingestSignatures(docs)))
    bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
  }

  /** Full truth labeling of a synthetic corpus: min-label components over
    * its full candidate graph, singletons coalesced. */
  private def truthOf(docs: DataFrame): Set[(Long, Long)] = {
    val labels = Dedup.labelsFromEdges(edgesOf(docs))
      .withColumnRenamed("comp", "edge_comp")
    labelSet(docs.select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"edge_comp", $"doc_id").as("comp")))
  }

  test("golden: file-source streamed components equal the batch components") {
    val streamed = labelSet(
      streaming.CompLabelStream.streamedComponents(spark, sf))
    val batch = labelSet(Dedup.components(spark, sf))
    assert(streamed == batch, "maintained labels diverged from the batch fixpoint")
    assert(streamed.nonEmpty)
  }

  test("bridge arrival MERGES two standing components; remap rewrites existing rows; replay is a no-op") {
    // synthetic corpus: two identical-text standing pairs (two separate
    // components) and one arrival whose text is the concatenation — its
    // minhash bands land in both sides' buckets, forcing a merge
    val tA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val tB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val standing = Seq((1L, tA), (2L, tA), (3L, tB), (4L, tB), (5L, "lone wolf document"))
      .toDF("doc_id", "text")
    val arrival = Seq((17L, tA + " " + tB)).toDF("doc_id", "text")
    val full = standing.unionAll(arrival)
    // precondition: the fixture really exercises the merge path
    val standingTruth = truthOf(standing)
    assert(standingTruth.contains((2L, 1L)) && standingTruth.contains((4L, 3L)),
      s"fixture lost its two standing components: $standingTruth")
    val fullTruth = truthOf(full)
    assert(fullTruth.contains((3L, 1L)) && fullTruth.contains((4L, 1L)) &&
      fullTruth.contains((17L, 1L)),
      s"fixture's arrival must bridge the components: $fullTruth")

    // drive labelDelta directly (the stream's per-trigger body)
    val standingBands = ops.Lineage.cut(
      Dedup.bandRelation(Dedup.ingestSignatures(standing)))
    val standingLabels = Dedup.labelsFromEdges(edgesOf(standing))
    val scratch = ops.SpillMemo.scratchDir("graft-scomp-t-")
    val (labels0, bands0) = Dedup.labelDelta(
      arrival, 0L, s"$scratch/bands", s"$scratch/labels",
      standingBands, standingLabels)
    streaming.UpsertSink.writeBatch(labels0, 0L, s"$scratch/labels")
    streaming.UpsertSink.writeBatch(bands0, 0L, s"$scratch/bands")
    // compose the read side over the synthetic universe (resolveLabels
    // reads the sf documents table; this corpus is hand-built)
    val composed = labelSet(
      full.select($"doc_id")
        .join(standingLabels.select($"doc_id", $"comp".as("st_comp")),
          Seq("doc_id"), "left")
        .join(streaming.UpsertSink.resolve(spark, s"$scratch/labels", Seq("doc_id"))
          .select($"doc_id", $"comp".as("sink_comp")), Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"sink_comp", $"st_comp", $"doc_id").as("comp")))
    assert(composed == fullTruth,
      s"maintained labels after the bridge batch diverged: $composed vs $fullTruth")
    // the merge really rewrote the standing rows (3 and 4 moved to 1)
    assert(labelSet(labels0.select($"doc_id", $"comp"))
      .exists(r => r._1 == 3L && r._2 == 1L), "remap row for doc 3 missing")

    // replay: recompute batch 0 with its own deltas present — bit-identical
    val (labelsR, _) = Dedup.labelDelta(
      arrival, 0L, s"$scratch/bands", s"$scratch/labels",
      standingBands, standingLabels)
    assert(labelSet(labelsR.select($"doc_id", $"comp")) ==
      labelSet(labels0.select($"doc_id", $"comp")),
      "replaying the batch over its own deltas changed the delta")
  }

  test("two-batch delivery over the fixture equals the one-shot batch labeling") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (_, corpusBands) = Dedup.corpusSigIndex(spark, sf)
    val standingLabels = Dedup.standingComponentLabels(spark, sf)
    val arriving = Tables.documents(spark, sf)
      .filter($"doc_id" % Dedup.newMod === Dedup.newRem)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(arriving.size >= 2)
    val (c1, c2) = arriving.splitAt(arriving.size / 2)
    val scratch = ops.SpillMemo.scratchDir("graft-scomp-2b-")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val (labels, bands) = Dedup.labelDelta(b.toDF(), id,
          s"$scratch/bands", s"$scratch/labels", corpusBands, standingLabels)
        streaming.UpsertSink.writeBatch(labels, id, s"$scratch/labels")
        streaming.UpsertSink.writeBatch(bands, id, s"$scratch/bands")
      }
      .start()
    try {
      in.addData(c1: _*)
      q.processAllAvailable()
      in.addData(c2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = labelSet(streaming.CompLabelStream.resolveLabels(
      spark, sf, s"$scratch/labels", standingLabels))
    val batch = labelSet(Dedup.components(spark, sf))
    assert(streamed == batch, "two-batch labels diverged from the batch fixpoint")
  }
}
