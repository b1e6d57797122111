package graft

import org.apache.spark.sql.{Dataset, Row}

/** The streamed RM3 ingest search (`s_rm3_stream`): stateless two-round
  * stream-static search ⇒ the multi-batch result must equal the batch
  * `x_search_rm3_in` under any split of the arrivals, and the
  * file-source wrapper must match the batch form exactly — including
  * that feedback comes only from the standing corpus (an arrival's own
  * batch never feeds its expansion). */
class Rm3StreamSpec extends SparkSpec {
  import spark.implicits._

  private def answers(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("query_id", "neighbor_id", "score_m", "n_terms", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("answers accumulate across two micro-batches to the batch search") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (idx, fwd) = graft.ops.Search.rm3IngestIndex(spark, sf)
    val arriving = Tables.documents(spark, sf)
      .filter($"doc_id" % graft.ops.Similarity.knnBatchMod === 7)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(arriving.size >= 2)
    val (c1, c2) = arriving.splitAt(arriving.size / 2)
    val sink = graft.ops.SpillMemo.scratchDir("graft-srm3-t-")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$sink/ckpt")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        graft.streaming.UpsertSink.writeBatch(
          graft.ops.Search.rm3Probe(b.toDF(), idx, fwd), id, s"$sink/sink")
      }
      .start()
    try {
      in.addData(c1: _*)
      q.processAllAvailable()
      in.addData(c2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = answers(graft.streaming.UpsertSink
      .resolve(spark, s"$sink/sink", Seq("query_id", "rnk")))
    val batch = answers(graft.ops.Search.rm3IngestSearch(spark, sf))
    assert(streamed == batch, "two-batch answers diverged from the batch search")
    assert(streamed.nonEmpty)
  }

  test("golden: file-source streamed RM3 equals the batch search") {
    val streamed = answers(graft.streaming.Rm3Stream.streamedRm3(spark, sf))
    val batch = answers(graft.ops.Search.rm3IngestSearch(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(streamed.forall(_._2 % 10 != 7),
      "an arriving doc surfaced as a neighbor — the standing index must exclude arrivals")
  }
}
