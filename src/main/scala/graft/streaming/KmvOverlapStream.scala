package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FIFTY-FIRST streaming execution: MAINTAINED KMV SKETCHES WITH
  * SET-ALGEBRA READS — the batch [[graft.ops.Sketches.kmvOverlap]] kept
  * standing as events arrive. One stateful update-mode aggregation per
  * event type maintains the bottom-k user-hash sketch; every pairwise
  * |A∪B| / |A∩B| estimate is then read-side arithmetic on the resolved
  * k-row arrays ([[graft.ops.Sketches.overlapOf]], the same tail the
  * batch form runs).
  *
  * Two properties carry correctness: bottom-k's merge law (the
  * [[SampleStream]] stance) makes the maintained sketch equal the batch
  * sketch under any batching, and [[graft.functions.BottomKByKeyAgg]]'s
  * SET semantics (duplicate (hash, id) pairs collapse) make it equal the
  * batch DISTINCT-user sketch with NO separate dedup state — the raw
  * at-least-once event feed streams straight into the aggregation, and a
  * user's re-arrivals are idempotent by construction. State: |types| ×
  * k (hash, id) pairs — a few KB at any corpus size, the entire point of
  * sketch-based overlap at 100 TB (the exact leg in the output is the
  * eval differential, computed batch-side at read).
  */
object KmvOverlapStream {

  /** Run the sketch-maintenance stream to completion over the events
    * table and return the pairwise overlap estimates off the standing
    * sketches. */
  def streamedKmvOverlap(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-skmv-")
    val agg = udaf(new graft.functions.BottomKByKeyAgg(graft.ops.Sketches.kmvK),
      Encoders.product[graft.functions.KeyedId])
    val maintained = EventPipeline.fileStream(ss, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        substring(md5(col("user_id").cast("string")), 1, 12).as("h"),
        col("user_id").as("id"))
      .groupBy(col("event_type"))
      .agg(agg(col("h"), col("id")).as("bot"))
    val q = maintained.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(b, id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    val sk = UpsertSink.resolve(ss, s"$scratch/sink", Seq("event_type"))
      .select(col("event_type"), expr("transform(bot, x -> x.h)").as("hs"))
    graft.ops.Sketches.overlapOf(sk, graft.ops.Sketches.distinctTypeUsers(ss, sfDir))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_kmv_overlap_stream" -> ((s, d) => streamedKmvOverlap(s, d)))

  /** Mergeable, duplicate-idempotent sketch state ⇒ no watermark cut: the
    * oracle is the batch overlap verbatim. */
  val oracle: Map[String, String] = Map(
    "s_kmv_overlap_stream" -> graft.ops.Sketches.oracle("x_sketch_kmv_overlap"))
}
