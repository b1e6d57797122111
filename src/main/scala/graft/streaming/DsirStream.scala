package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed DSIR ADMISSION — the batch
  * [[graft.ops.Sampling.dsirIngest]] maintained as documents arrive: the
  * importance-weight table derives ONCE from the standing corpus
  * (lineage-cut — arrivals must not shift the reference distributions
  * they are judged against), each micro-batch scores its own arrivals
  * map-side against the broadcast weights, and the admission set (the
  * top-quota arrivals by likelihood ratio) is maintained through the
  * keyed sink by the trim's merge law — top-q(A ∪ B) = top-q(top-q(A) ∪
  * top-q(B)), the [[SampleStream]] KMV argument with (score, doc_id) as
  * the order. Per-batch trim keeps each delta ≤ quota rows; the
  * resolve-side re-trim compacts candidates to the final quota. The
  * result equals the batch form under ANY batching, so the streamed
  * query shares the batch oracle verbatim ([[DsirStreamSpec]] pins the
  * two-batch split).
  *
  * This is how curation-by-importance actually runs at 100 TB: the
  * weight table is a 64-row standing artifact refreshed per corpus
  * snapshot, scoring is map-side on the ingest path, and state is the
  * quota-bounded sink — the streaming query itself is STATELESS. */
object DsirStream {

  /** Run the DSIR admission stream to completion over the documents table
    * and return the resolved admission set. */
  def streamedDsir(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sdsir-")
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val weights = graft.ops.Lineage.cut(graft.ops.Sampling.dsirWeights(
      graft.Tables.documents(ss, sfDir).filter(
        col("doc_id") % graft.ops.Dedup.newMod =!= graft.ops.Dedup.newRem)))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % graft.ops.Dedup.newMod === graft.ops.Dedup.newRem)
      .select(col("doc_id"), col("lang"), col("text"))
    val q = ingest.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Sampling.dsirTrim(
            graft.ops.Sampling.dsirScore(b.toDF(), weights)),
          id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    graft.ops.Sampling.dsirTrim(
      UpsertSink.resolve(ss, s"$scratch/sink", Seq("doc_id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_dsir_stream" -> ((s, d) => streamedDsir(s, d)))

  /** Stateless map-side scoring + mergeable trim ⇒ no watermark cut: the
    * oracle is the batch ingest form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_dsir_stream" -> graft.ops.Sampling.oracle("x_sample_dsir_in"))
}
