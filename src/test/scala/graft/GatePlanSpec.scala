package graft

import graft.ops.{Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec

/** Round-14 sweep follow-through: the two EXACT percentile ranks that the
  * low-cardinality-window audit had left as "deliberate, documented"
  * concessions — `percentileGate` (median cut per (lang, source)) and
  * `qualityCalibrate` (per-language score percentile) — now decompose
  * through a value histogram instead of one rank window per stratum.
  * These tests pin BOTH halves of that claim: the ranks are bit-equal to
  * the sequential definition (rank within stratum by the documented order),
  * and the physical plan's only document-sized window partitions by
  * (stratum, value) — any stratum-only window must consume the histogram
  * aggregate, never the document relation (the BoundedHeapSpec stance:
  * the 100 TB shape regression fails here first). */
class GatePlanSpec extends SparkSpec {
  import spark.implicits._

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Every window lacking `valueKey` in its partitioning must rank
    * histogram rows (an aggregate keyed by the value sits beneath it);
    * at least one window must carry the value key (the tie-class rank). */
  private def pinWindowShape(df: DataFrame, valueKey: String): Unit = {
    val wins = physical(df).collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in the plan")
    wins.foreach { w =>
      if (!w.partitionSpec.exists(_.toString.contains(valueKey))) {
        val overHistogram = w.child.collect {
          case a: BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains(valueKey)) => a
        }
        assert(overHistogram.nonEmpty,
          s"stratum-only window runs over the document relation, not the histogram:\n$w")
      }
    }
    assert(wins.exists(_.partitionSpec.exists(_.toString.contains(valueKey))),
      "missing the (stratum, value) tie-class rank window")
  }

  test("percentileGate: histogram decomposition equals the sequential rank; plan shape pinned") {
    val out = Sampling.percentileGate(spark, sf)
      .select($"doc_id", $"lang", $"source", $"n_words", $"rnk", $"n_stratum")
      .as[(Long, String, String, Long, Long, Long)].collect().toSet

    // sequential reference: rank by (n_words desc, doc_id) inside each
    // (lang, source) stratum; keep 2·rank ≤ stratum size
    val base = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"source", $"text")
      .as[(Long, String, String, String)].collect()
      .map { case (id, l, s, t) => (id, l, s, t.split(" ", -1).length.toLong) }
    val expected = base.groupBy { case (_, l, s, _) => (l, s) }.flatMap {
      case ((l, s), docs) =>
        docs.sortBy { case (id, _, _, n) => (-n, id) }.zipWithIndex.collect {
          case ((id, _, _, n), i) if (i + 1L) * 2 <= docs.length =>
            (id, l, s, n, i + 1L, docs.length.toLong)
        }.toSeq
    }.toSet
    assert(out == expected, "histogram two-pass diverged from the sequential median cut")
    assert(out.nonEmpty)

    pinWindowShape(Sampling.percentileGate(spark, sf), "n_words")
  }

  test("qualityCalibrate: histogram decomposition equals the sequential rank; plan shape pinned") {
    val out = TextAnalysis.qualityCalibrate(spark, sf)
      .select($"doc_id", $"lang", $"score_m", $"rnk", $"n_lang", $"pct_bp")
      .as[(Long, String, Long, Long, Long, Long)].collect()

    // sequential reference over the emitted scores: rank by (score_m,
    // doc_id) inside each language, percentile in basis points
    val expected = out.map(r => (r._1, r._2, r._3))
      .groupBy(_._2).flatMap { case (l, docs) =>
        docs.sortBy { case (id, _, m) => (m, id) }.zipWithIndex.map {
          case ((id, _, m), i) =>
            val n = docs.length.toLong
            (id, l, m, i + 1L, n, (i.toLong * 10000) / math.max(n - 1, 1L))
        }.toSeq
      }.toSet
    assert(out.toSet == expected, "histogram two-pass diverged from the sequential calibration")
    assert(out.nonEmpty)

    pinWindowShape(TextAnalysis.qualityCalibrate(spark, sf), "score_m")
  }

  test("curriculumOrder: wave rank decomposes through the score histogram") {
    // semantics are already pinned by PipelineOpsSpec's global-interleave
    // equivalence; this pins the plan half — the document-sized wave rank
    // must carry score_m in its partitioning
    pinWindowShape(TextAnalysis.curriculumOrder(spark, sf), "score_m")
  }

  test("prefixSum: multi-bucket two-level scan equals the sequential cumsum at every width") {
    // doc_ids with gaps and interleaved strata; widths force 1, many, and
    // one-row-per-bucket regimes — the offset must be bit-equal in all
    val rows = (0L until 257L).map(i =>
      (i * 3, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de", i % 7 + 1))
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    val expected = rows.groupBy(_._2).flatMap { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      sorted.zip(sorted.scanLeft(0L)(_ + _._3)).map {
        case ((id, l, n), off) => (id, l, n.toLong, off)
      }
    }.toSet
    for (width <- Seq(1L, 16L, 1024L)) {
      val got = graft.ops.Sampling
        .prefixSum(df, "lang", "doc_id", "n_tokens", "start_off", width)
        .select($"doc_id", $"lang", $"n_tokens", $"start_off")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == expected, s"prefix sum diverged at bucket width $width")
    }
  }
}
