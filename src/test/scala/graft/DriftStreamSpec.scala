package graft

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._

/** The streamed ingest drift monitor (`s_drift_stream`): the per-lang
  * arrival census must accumulate across micro-batches, the share/drift
  * projection must equal the batch `x_ingest_drift` table under any
  * batching, and corpus-only languages must keep their row through the
  * full-outer combine. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def table(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long, Long, Long)] =
    df.select("lang", "n_old", "n_new", "share_old_bp", "share_new_bp", "drift_bp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("census accumulates across two micro-batches to the batch drift table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val isNew = $"doc_id" % graft.ops.Dedup.newMod === graft.ops.Dedup.newRem
    val oldCensus = Tables.documents(spark, sf).filter(!isNew)
      .groupBy($"lang").agg(count(lit(1)).as("n_old"))
    val ingest = Tables.documents(spark, sf).filter(isNew)
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    assert(ingest.size >= 2, "need at least two arriving docs to split")
    val (c1, c2) = ingest.splitAt(ingest.size / 2)
    val sink = graft.ops.SpillMemo.scratchDir("graft-sdrift-t-")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "lang")
      .groupBy($"lang").agg(count(lit(1)).as("n_new"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$sink/ckpt")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        graft.streaming.UpsertSink.writeBatch(b, id, s"$sink/sink")
      }
      .start()
    try {
      in.addData(c1: _*)
      q.processAllAvailable()
      in.addData(c2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val newCounts = graft.streaming.UpsertSink
      .resolve(spark, s"$sink/sink", Seq("lang")).select($"lang", $"n_new")
    val streamed = table(graft.ops.Sampling.driftOf(
      oldCensus.join(newCounts, Seq("lang"), "full_outer")
        .select($"lang", coalesce($"n_old", lit(0L)).as("n_old"),
          coalesce($"n_new", lit(0L)).as("n_new"))))
    val batch = table(graft.ops.Sampling.ingestDrift(spark, sf))
    assert(streamed == batch, "two-batch drift table diverged from the batch form")
    assert(streamed.nonEmpty)
  }

  test("golden: file-source streamed drift equals the batch table; coverage is total") {
    val streamed = table(graft.streaming.DriftStream.streamedDrift(spark, sf))
    val batch = table(graft.ops.Sampling.ingestDrift(spark, sf))
    assert(streamed == batch, "streamed drift diverged from the batch form")
    // every language in the corpus appears, ingest-absent ones included
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(streamed.size == langs)
  }

  test("golden: streamed embedding drift equals the batch per-dimension table") {
    def dims(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long, Long, Long, Long)] =
      df.select("dim", "n_in", "n_corp", "sum_in", "sum_corp", "shift_x")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val streamed = dims(graft.streaming.DriftStream.streamedEmbedDrift(spark, sf))
    val batch = dims(graft.ops.Similarity.embedDrift(spark, sf))
    assert(streamed == batch, "streamed embedding drift diverged from the batch form")
    // state is bounded by the embedding width, not the arrival volume
    val width = Tables.embeddings(spark, sf)
      .select(size($"embedding")).head().getInt(0)
    assert(streamed.size == width)
  }
}
