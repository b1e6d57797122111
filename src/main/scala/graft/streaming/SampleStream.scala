package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streamed bottom-k (KMV) uniform sample — the batch
  * [[graft.ops.Sampling.bottomkSample]] maintained AS DOCUMENTS ARRIVE,
  * which is how a 100 TB pipeline actually keeps its standing eval/audit
  * sample: nobody re-scans the corpus to refresh 64 rows. Correctness
  * rides on the KMV merge law — bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  * bottom-k(B)) — so each micro-batch reduces to its own k smallest
  * hashes (a per-batch TakeOrderedAndProject over only that batch's
  * rows), the keyed sink accumulates candidate rows (≤ k per delta), and
  * the resolve-side trim re-ranks the ≤ k×batches candidates to the
  * final k. The result equals the batch sample under ANY batching of the
  * source ([[SampleStreamSpec]] pins the two-batch split), so the
  * streamed query shares the batch oracle verbatim.
  *
  * State story at scale: the streaming query itself is STATELESS (no
  * watermark, no store — the per-batch top-k is plan-local); the standing
  * state is the sink's candidate set, bounded by k × deltas and
  * re-compacted to k on every read. A long-running deployment compacts
  * the sink periodically ([[UpsertSink.compact]]) exactly like the MOR
  * upsert family. */
object SampleStream {

  /** Run the sample-maintenance stream to completion over the documents
    * table and return the resolved standing sample (k rows). */
  def streamedSample(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val k = graft.ops.Sampling.bottomK
    val scratch = graft.ops.SpillMemo.scratchDir("graft-ssample-")
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
    val q = ingest.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        // per-batch KMV reduction: only this batch's k smallest survive
        UpsertSink.writeBatch(
          b.orderBy(col("h"), col("doc_id")).limit(k), id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("doc_id"))
      .orderBy(col("h"), col("doc_id")).limit(k)
      .select(col("doc_id"), col("lang"), col("source"), col("h"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_sample_stream" -> ((s, d) => streamedSample(s, d)))

  /** Stateless map + mergeable-sketch trim ⇒ no watermark cut: the oracle
    * is the batch bottom-k verbatim. */
  val oracle: Map[String, String] = Map(
    "s_sample_stream" -> graft.ops.Sampling.oracle("x_sample_bottomk"))
}
