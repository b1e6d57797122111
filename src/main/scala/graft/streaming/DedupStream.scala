package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The NINETEENTH streaming execution: NEAR-DUP DETECTION AT INGEST — the
  * streaming twin of [[graft.ops.Dedup.incremental]], and the steady-state
  * shape of a production dedup pipeline: full-corpus dedup runs once, the
  * signature index is persisted beside the corpus, and every arriving
  * document is MinHash-hashed map-side and probed against that STANDING
  * index ("is this new doc a near-dup of anything I already have?") before
  * it is admitted. The probe itself is
  * [[graft.ops.Dedup.incrementalProbe]] — the SAME definition the batch
  * form runs, so batch and stream cannot drift.
  *
  * Semantics make this the easy kind of stream: the probe is STATELESS
  * (static right side ⇒ per-batch join, nothing to evict, no watermark)
  * and each arriving doc's verdict depends only on its own text plus the
  * static corpus index, so its verdict is complete within its own
  * micro-batch — the result equals the batch `x_dedup_incremental` under
  * ANY batching of the source (the multi-batch golden in `DedupStreamSpec`
  * delivers the ingest partition in two batches and pins exactly that).
  * The per-batch work runs inside `foreachBatch` (signature + band join +
  * verify are plain batch operators on the micro-batch frame), landing in
  * the keyed-upsert sink under the new_id key so checkpoint replay is
  * idempotent.
  *
  * Scale: per-trigger cost is (ingest rows × band-matched candidates) —
  * the corpus index scan joins against the conf-gated broadcast ingest
  * bands with no corpus shuffle, exactly as in the batch twin; state is
  * zero. At 100 TB the signature index is the persisted artifact (here the
  * session's parquet-spilled memo) and triggers pay only their own ingest
  * volume. */
object DedupStream {

  /** Run the ingest near-dup stream to completion over the documents table
    * (rows with `doc_id % newMod == newRem` play the arriving partition,
    * the rest the standing corpus — the batch twin's convention) and
    * return the resolved verdict table. */
  def streamedIncrementalDedup(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sdedup-")
    val (corpusSig, corpusBands) = graft.ops.Dedup.corpusSigIndex(ss, sfDir)
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % graft.ops.Dedup.newMod === graft.ops.Dedup.newRem)
      .select(col("doc_id"), col("text"))
    val q = ingest.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Dedup.incrementalProbe(b.toDF(), corpusSig, corpusBands),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("new_id"))
      .select(col("new_id"), col("dup_of"), col("n_matches"), col("is_dup"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_dedup_lsh_stream" -> ((s, d) => streamedIncrementalDedup(s, d)))

  /** Stateless stream-static probe ⇒ NO watermark cut: the oracle is the
    * batch incremental form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_dedup_lsh_stream" -> graft.ops.Dedup.oracle("x_dedup_incremental"))
}
