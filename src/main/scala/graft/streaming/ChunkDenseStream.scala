package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FIFTY-THIRD streaming execution: HYBRID RAG SERVING — the full
  * retrieve-fuse-assemble answer path run live: each arriving document's
  * passage hits are recalled on BOTH legs (sparse: the standing chunk
  * BM25 index; dense: the BUCKETED rung over the standing chunk-vector
  * relation — serving takes the pruned rung, the ×10 sweep's diagnosis),
  * RRF-fused at the chunk grain, and max-pooled to documents — the SAME
  * [[graft.ops.Search.chunkFusedOf]] composition the batch
  * `x_search_chunk_rollup_fused_in` runs, so batch and stream cannot
  * drift. The standing relations derive once at query start (store-served
  * when an [[graft.ops.IndexStore]] carries them); a trigger pays only
  * its own arrivals' probes.
  *
  * Stateless stream-static search: both legs read static standing state
  * and every fusion/rollup window partitions by query_id, so an
  * arrival's fused answer is complete within its own micro-batch — the
  * result equals the batch form under ANY batching. Sink key is
  * (query_id, rnk); replay idempotent.
  *
  * Scale: at 100 TB both serving indexes are persisted artifacts; a
  * trigger costs arrivals × (pruned-posting probes + the cell-pruned
  * slice of the standing vector scan + k-per-query fusion windows) —
  * corpus-size-independent state (zero). The dense leg routes on the
  * [[graft.ops.ChunkRouter]]'s learned k-means cells (the r17-diagnosed
  * sign router is gone); an epoch close swaps the panel without
  * touching this stream's shape (`RouterEpochSpec`). */
object ChunkDenseStream {

  /** Run the hybrid RAG serving stream to completion and return the
    * resolved fused document answers. */
  def streamedFusedRollup(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    // the dense leg's cosine kernel must be registered BEFORE the stream
    // starts: the micro-batch execution clones the session state at
    // start, so a per-batch registration would miss the clone
    graft.functions.GraftFunctions.register(ss)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sfchunk-")
    val idx = graft.ops.Search.chunkIngestIndex(ss, sfDir)
    // the routed standing slice + the router's CURRENT epoch panel, both
    // resolved ONCE at stream start (store-served when the IndexStore
    // carries chunk_routed / chunk_router_state): an epoch promoted
    // mid-stream is picked up at the next stream start, never mid-batch
    // — routing must be constant within a run
    val cv = graft.ops.Lineage.cut(
      graft.ops.ChunkRouter.standingRoutedVectors(ss, sfDir))
    val panel = graft.ops.ChunkRouter.servingPanel(ss, sfDir)
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/documents.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % graft.ops.Similarity.knnBatchMod === 7)
      .select(col("doc_id"), col("text"))
    val q = ingest.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Search.chunkFusedOf(
            graft.ops.Search.chunkProbe(b.toDF(), idx),
            graft.ops.Search.chunkDenseBucketProbe(b.toDF(), cv, panel)),
          id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "rnk"))
      .select(col("query_id"), col("neighbor_id"), col("best_m"),
        col("best_chunk"), col("n_chunk_hits"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_chunk_fused_stream" -> ((s, d) => streamedFusedRollup(s, d)))

  /** Stateless stream-static serving ⇒ NO watermark cut: the oracle is
    * the batch fused ingest rollup verbatim. */
  val oracle: Map[String, String] = Map(
    "s_chunk_fused_stream" ->
      graft.ops.Search.oracle("x_search_chunk_rollup_fused_in"))
}
