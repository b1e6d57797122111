package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The TWENTY-SEVENTH streaming execution — and the multimodal family's
  * first: the IMAGE-TEXT ALIGNMENT GATE AT INGEST. Documents arrive, each
  * micro-batch runs the REAL PNG decode (`mapPartitions` codec pass —
  * the same `imageStatsOf` the batch `x_mm_image_stats`/`x_mm_alignment`
  * run), lifts the decoded stats through the integer projection head,
  * and scores them against the broadcast static text-embedding side
  * ([[graft.ops.MultimodalPipeline.alignmentOf]] — ONE definition with
  * the batch gate, so the two cannot drift). This is the CLIP-filter
  * placed where a production pipeline actually runs it: at ingest,
  * before mis-paired image/caption rows are ever stored.
  *
  * Semantics are the easy kind: decode + projection are map-side and the
  * pair join reads a static broadcast relation, so each document's
  * verdict is complete within its own micro-batch — the resolved table
  * equals the batch gate under ANY batching, and the oracle is the batch
  * gate's verbatim. State is zero; results land in the doc_id-keyed
  * upsert sink, so checkpoint replay is idempotent.
  *
  * Scale: per-trigger cost is ingest rows × (decode + 64 integer
  * multiply-adds); the text side is id-partitioned at 100 TB (the
  * broadcast here is the graded-scale shape, conf-gated like every
  * query-sized broadcast). */
object AlignStream {

  def streamedAlignment(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-salign-")
    val tv = graft.ops.Lineage.cut(
      graft.ops.MultimodalPipeline.textVectors(ss, sfDir))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val arriving = ss.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"))
    val q = arriving.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val sess = b.sparkSession
        import sess.implicits._
        UpsertSink.writeBatch(
          graft.ops.MultimodalPipeline.alignmentOf(
            graft.ops.MultimodalPipeline.imageStatsOf(
              graft.ops.MultimodalPipeline.imageRecordsOf(
                b.select(col("doc_id")).as[Long])),
            tv),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("doc_id"))
      .select(col("doc_id"), col("align_fp"), col("is_aligned"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_mm_alignment_stream" -> ((s, d) => streamedAlignment(s, d)))

  /** Stateless map-side gate + static broadcast pair side ⇒ no watermark
    * cut: the oracle is the batch alignment gate verbatim. */
  val oracle: Map[String, String] = Map(
    "s_mm_alignment_stream" -> graft.ops.MultimodalPipeline.oracle("x_mm_alignment"))
}
