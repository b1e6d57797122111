package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FORTY-FOURTH streaming execution — TRIMMED-CLIP DETECTION AT
  * INGEST: the temporal twin of [[PhashStream]]. Shortened re-uploads
  * arrive (the last-frame-dropped variants), each micro-batch runs the
  * REAL GIF decode → per-frame blockhash
  * ([[graft.ops.MultimodalPipeline.videoPhashOf]]) and prefix-probes the
  * STANDING corpus frame-fingerprint relation
  * ([[graft.ops.MultimodalPipeline.clipPrefixPairs]] — ONE definition
  * with the batch `x_mm_clip_dup`, short side = the batch, long side =
  * the standing corpus). Candidates come from the first-frame equi-join
  * (the temporal pigeonhole), so per-arrival cost is decode + one bucket
  * probe + a ≤5-frame verify against a static lineage-cut relation —
  * corpus-size-independent per arrival, zero state; the
  * (new_id, src_id)-keyed upsert sink makes checkpoint replay
  * idempotent. Stateless stream-static ⇒ the resolved table equals the
  * batch restriction of the all-pairs oracle to (variant, original)
  * pairs under ANY batching. */
object ClipStream {

  def streamedClipProbe(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sclip-")
    val standing = graft.ops.Lineage.cut(
      graft.ops.MultimodalPipeline.videoPhash(ss, sfDir))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val arriving = ss.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"))
      .filter(col("doc_id") % graft.ops.MultimodalPipeline.clipVariantMod ===
        graft.ops.MultimodalPipeline.clipVariantRem &&
        col("doc_id") % 4 >= 1)
    val q = arriving.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val sess = b.sparkSession
        import sess.implicits._
        UpsertSink.writeBatch(
          graft.ops.MultimodalPipeline.clipPrefixPairs(
            graft.ops.MultimodalPipeline.videoPhashOf(
              graft.ops.MultimodalPipeline.trimmedClipRecordsOf(
                b.select(col("doc_id")).as[Long])),
            standing)
            .select(col("short_id").as("new_id"), col("long_id").as("src_id"),
              col("n_shared")),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("new_id", "src_id"))
      .select(col("new_id"), col("src_id"), col("n_shared"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_clip_dup_stream" -> ((s, d) => streamedClipProbe(s, d)))

  /** Stateless stream-static prefix probe ⇒ no watermark cut: the oracle
    * is the all-pairs prefix check restricted to (arriving variant,
    * standing original) pairs. */
  val oracle: Map[String, String] =
    Map("s_clip_dup_stream" -> graft.ops.MultimodalPipeline.clipProbeOracle)
}
