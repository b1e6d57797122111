package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FORTY-SECOND streaming execution — VISUAL NEAR-DUP AT INGEST: the
  * multimodal member of the ingest-dedup family ([[DedupStream]] does this
  * for text MinHash; this does it for images). Resized copies arrive (the
  * 2×-upscale variants — the re-posted thumbnail case a visual dedup pass
  * exists to catch), each micro-batch runs the REAL PNG decode →
  * perceptual blockhash ([[graft.ops.MultimodalPipeline.imagePhashOf]],
  * the same codec pass the batch queries run) and probes the STANDING
  * corpus fingerprint index through the 16-bit band buckets
  * ([[graft.ops.MultimodalPipeline.phashProbeOf]] — ONE probe definition
  * with the batch `x_mm_phash_probe`, so the two cannot drift).
  *
  * The standing index is derived once at query start and lineage-cut (the
  * [[Rm3Stream]] standing-relation discipline): per-trigger cost is
  * |batch| × (decode + banding + bounded bucket probe) against a static
  * materialized relation — corpus-size-independent per arrival. Each
  * arrival's verdict is complete within its own micro-batch (stateless
  * stream-static probe), so the resolved table equals the batch probe
  * under ANY batching and the oracle is the batch probe's verbatim; the
  * new_id-keyed upsert sink makes checkpoint replay idempotent. */
object PhashStream {

  def streamedPhashProbe(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sphash-")
    val standing = graft.ops.Lineage.cut(
      graft.ops.MultimodalPipeline.imagePhash(ss, sfDir))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val arriving = ss.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"))
      .filter(col("doc_id") % graft.ops.MultimodalPipeline.variantMod ===
        graft.ops.MultimodalPipeline.variantRem)
    val q = arriving.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val sess = b.sparkSession
        import sess.implicits._
        UpsertSink.writeBatch(
          graft.ops.MultimodalPipeline.phashProbeOf(
            graft.ops.MultimodalPipeline.imagePhashOf(
              graft.ops.MultimodalPipeline.imageVariantRecordsOf(
                b.select(col("doc_id")).as[Long])),
            standing),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("new_id"))
      .select(col("new_id"), col("dup_of"), col("hamming"), col("is_dup"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_mm_phash_stream" -> ((s, d) => streamedPhashProbe(s, d)))

  /** Stateless stream-static probe ⇒ no watermark cut: the oracle is the
    * batch probe verbatim. */
  val oracle: Map[String, String] = Map(
    "s_mm_phash_stream" -> graft.ops.MultimodalPipeline.oracle("x_mm_phash_probe"))
}
