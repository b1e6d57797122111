package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The SEVENTEENTH streaming execution: APPROXIMATE-NEAREST-NEIGHBOR AT
  * INGEST — the streaming twin of [[graft.ops.Similarity.knnIncremental]],
  * and the shape an embedding pipeline actually runs: as new vectors
  * arrive they are sign-bucketed map-side and probed against the STANDING
  * corpus index (the lineage-cut bucketed relation, derived once at query
  * start), each ingest vector emitting its top-k neighbors with the same
  * pure-integer signed-squared-cosine ranking as the batch form.
  *
  * Semantics make this the easy kind of stream: the probe is STATELESS
  * (static right side ⇒ per-batch join, nothing to evict, no watermark) and
  * each ingest vector's candidate set comes entirely from the static index,
  * so its top-k is complete within its own micro-batch — the result equals
  * the batch `x_sim_knn_incremental` under ANY batching of the source, with
  * no single-batch delivery assumption. The per-batch work runs inside
  * `foreachBatch` (probe + bounded-heap top-k are plain batch operators on
  * the micro-batch frame), landing in the keyed-upsert sink under the
  * (vec_id, rnk) key so checkpoint replay is idempotent.
  *
  * Scale: per-trigger cost is (ingest rows × bucket-matched candidates) —
  * the corpus index streams past the conf-gated broadcast ingest relation
  * exactly as in the batch twin; state is zero. At 100 TB the index is the
  * persisted artifact ([[graft.ops.Lineage]] reliable-checkpoint mode) and
  * triggers pay only their own ingest volume. */
object KnnStream {

  /** Run the ingest-kNN stream to completion over the embeddings table
    * (rows with `vec_id % knnBatchMod == 7` play the arriving batch, the
    * rest the standing corpus — the batch twin's convention) and return
    * the resolved neighbor table. */
  def streamedKnn(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sknn-")
    val corpusIdx = graft.ops.Similarity.knnCorpusIndex(ss, sfDir)
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/embeddings.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("vec_id") % graft.ops.Similarity.knnBatchMod === 7)
      .select(col("vec_id"), col("embedding"))
    val q = ingest.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Similarity.knnProbe(graft.ops.Similarity.knnRelation(b.toDF()), corpusIdx),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("vec_id", "rnk"))
      .select(col("vec_id"), col("neighbor_id"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_knn_stream" -> ((s, d) => streamedKnn(s, d)))

  /** Stateless stream-static probe ⇒ NO watermark cut: the oracle is the
    * batch incremental form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_knn_stream" -> graft.ops.Similarity.knnSql(incremental = true))
}
