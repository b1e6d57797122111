package graft

import org.apache.spark.sql.{Dataset, Row}

/** The streamed DSIR admission (`s_dsir_stream`): stateless scoring
  * against standing weights + the mergeable top-quota trim ⇒ the
  * multi-batch result must equal the batch `x_sample_dsir_in` under any
  * split of the arrivals, and the end-to-end file-source wrapper must
  * match the batch form exactly. */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long)] =
    df.select("doc_id", "lang", "n_tokens", "score_mb")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("admissions accumulate across two micro-batches to the batch set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val weights = graft.ops.Lineage.cut(graft.ops.Sampling.dsirWeights(
      Tables.documents(spark, sf).filter(
        $"doc_id" % graft.ops.Dedup.newMod =!= graft.ops.Dedup.newRem)))
    val arriving = Tables.documents(spark, sf)
      .filter($"doc_id" % graft.ops.Dedup.newMod === graft.ops.Dedup.newRem)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect().toSeq
    assert(arriving.size >= 2)
    val (c1, c2) = arriving.splitAt(arriving.size / 2)
    val sink = graft.ops.SpillMemo.scratchDir("graft-sdsir-t-")
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "lang", "text").writeStream
      .option("checkpointLocation", s"$sink/ckpt")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        graft.streaming.UpsertSink.writeBatch(
          graft.ops.Sampling.dsirTrim(
            graft.ops.Sampling.dsirScore(b.toDF(), weights)),
          id, s"$sink/sink")
      }
      .start()
    try {
      in.addData(c1: _*)
      q.processAllAvailable()
      in.addData(c2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = rows(graft.ops.Sampling.dsirTrim(
      graft.streaming.UpsertSink.resolve(spark, s"$sink/sink", Seq("doc_id"))))
    val batch = rows(graft.ops.Sampling.dsirIngest(spark, sf))
    assert(streamed == batch, "two-batch admissions diverged from the batch set")
    assert(streamed.nonEmpty)
  }

  test("golden: file-source streamed DSIR equals the batch admission set") {
    val streamed = rows(graft.streaming.DsirStream.streamedDsir(spark, sf))
    val batch = rows(graft.ops.Sampling.dsirIngest(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(streamed.forall(_._1 % 10 == 7), "only arrivals belong in the admission set")
  }
}
