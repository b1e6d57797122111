package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FIFTY-SECOND streaming execution: MAINTAINED QUANTIZER — the
  * streaming twin of [[graft.ops.Similarity.quantizerUpdate]], closing the
  * r16 verdict's "trained once and frozen" gap: the centroid table that
  * IVF routing, SemDeDup, cluster-balanced sampling and the serving
  * streams all consume is kept CURRENT as vectors arrive, as mergeable
  * per-(cluster, dim) (Σ, n) state.
  *
  * Semantics: arriving vectors are assigned to the FROZEN standing
  * centroids ENTIRELY IN-ROW (the shared
  * [[graft.ops.Similarity.assignSql]] fold over the broadcast panel — no
  * per-vector shuffle, no vec_id-keyed state), then one update-mode
  * stateful aggregation per (cluster, dim) maintains the arrival sums and
  * counts. Sums/counts are associative, so the maintained state equals the
  * batch fold under ANY batching of the arrivals — the stream shares the
  * batch oracle verbatim. Assigning against the frozen panel (not the
  * evolving centroids) is the production IVF maintenance contract — and
  * precisely what makes the result batching-invariant at all; the
  * epoch-close retrain is [[graft.ops.Similarity.kmeansConverged]]'s job.
  *
  * State story at scale: k·d cells × two longs — KBs of state store
  * regardless of corpus size; per-trigger work is the batch's rows × one
  * O(k·d) in-row fold plus a map-side-combined exploded aggregation. The
  * resolved sink merges onto the standing state through the SAME
  * [[graft.ops.Similarity.quantizerMergeOf]] the batch update uses. */
object QuantizerStream {

  /** Run the maintenance stream to completion over the embeddings table
    * and return the resolved next-epoch state readout. */
  def streamedQuantizer(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-squant-")
    val st = graft.ops.Lineage.cut(
      graft.ops.Similarity.standingQuantizerState(ss, sfDir))
    val cents = graft.ops.Lineage.cut(
      graft.ops.Similarity.quantizerCentroidPanel(st))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/embeddings.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"))
    val deltas = deltaAgg(
      ss.readStream.schema(schema).parquet(dir.toString)
        .filter(col("vec_id") % graft.ops.Similarity.knnBatchMod === 7)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
            .as("q")),
      cents)
    val q = deltas.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(b, id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    graft.ops.Similarity.quantizerMergeOf(st,
      UpsertSink.resolve(ss, s"$scratch/sink", Seq("cluster", "dim"))
        .select(col("cluster"), col("dim"), col("q_suma"), col("na")))
  }

  /** The stream's stateful delta aggregation over an arriving
    * (vec_id, q µ-quantized) frame and the broadcast frozen panel — the
    * in-row assignment plus the mergeable per-(cluster, dim) sums. ONE
    * definition for the production file-source stream and the two-batch
    * MemoryStream invariance pin in `QuantizerSpec`. */
  private[graft] def deltaAgg(arrivals: DataFrame, cents: DataFrame): DataFrame =
    arrivals
      .crossJoin(broadcast(cents))
      .withColumn("cluster", expr(graft.ops.Similarity.assignSql))
      .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim").cast("long").as("dim"))
      .agg(sum(col("x")).as("q_suma"), count(lit(1)).as("na"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_quantizer_stream" -> ((s, d) => streamedQuantizer(s, d)))

  /** Frozen panel + mergeable per-cell state ⇒ no watermark cut: the
    * oracle is the batch quantizer update verbatim. */
  val oracle: Map[String, String] = Map(
    "s_quantizer_stream" -> graft.ops.Similarity.oracle("x_quantizer_update"))
}
