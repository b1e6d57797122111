package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FORTY-FIFTH streaming execution — TRUNCATED-AUDIO DETECTION AT
  * INGEST, completing the per-modality ingest-dedup row ([[DedupStream]]
  * text, [[PhashStream]] image, [[ClipStream]] video, THIS audio): cut
  * re-uploads arrive, each micro-batch runs the REAL WAV decode →
  * fixed-width window fingerprints
  * ([[graft.ops.MultimodalPipeline.audioFingerprintOf]]) and
  * window-prefix-probes the lineage-cut standing fingerprint relation
  * through the SAME modality-agnostic
  * [[graft.ops.MultimodalPipeline.clipPrefixPairs]] core as the batch
  * `x_mm_audio_dup`. Per-arrival cost is decode + one first-window
  * bucket probe + a ≤8-window verify against a static relation —
  * corpus-size-independent, zero state; the (new_id, src_id)-keyed
  * upsert sink keeps checkpoint replay idempotent. Stateless
  * stream-static ⇒ the resolved table equals the batch restriction of
  * the all-pairs oracle to (cut, original) pairs under ANY batching. */
object AudioDupStream {

  def streamedAudioProbe(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-saudio-")
    val mp = graft.ops.MultimodalPipeline
    val standing = graft.ops.Lineage.cut(
      mp.audioFingerprint(ss, sfDir)
        .select(col("doc_id"), col("win_idx").as("frame_idx"),
          col("e_sum").as("phash_lo"), col("zcr").as("phash_hi")))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val arriving = ss.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"))
      .filter(col("doc_id") % mp.audioVariantMod === mp.audioVariantRem &&
        col("doc_id") % 256 =!= 0)
    val q = arriving.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val sess = b.sparkSession
        import sess.implicits._
        UpsertSink.writeBatch(
          mp.clipPrefixPairs(
            mp.audioFingerprintOf(
              mp.truncatedAudioRecordsOf(b.select(col("doc_id")).as[Long]))
              .select(col("doc_id"), col("win_idx").as("frame_idx"),
                col("e_sum").as("phash_lo"), col("zcr").as("phash_hi")),
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
    "s_audio_dup_stream" -> ((s, d) => streamedAudioProbe(s, d)))

  /** Stateless stream-static window-prefix probe ⇒ no watermark cut. */
  val oracle: Map[String, String] =
    Map("s_audio_dup_stream" -> graft.ops.MultimodalPipeline.audioProbeOracle)
}
