package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed LATE-INTERACTION SERVING — the MaxSim sibling of
  * [[Rm3Stream]]: each arriving document (`doc_id % 10 = 7`) runs the
  * two-stage retrieval inside its micro-batch — BM25 recall against the
  * standing pruned index, then the ColBERT-shape MaxSim rerank of those
  * candidates against the standing forward relation — via the SAME probe
  * definition the batch `x_search_maxsim_in` runs
  * ([[graft.ops.Search.maxsimProbe]]), so batch and stream cannot drift.
  * The static pair (pruned index, forward relation) derives ONCE at query
  * start, lineage-cut ([[graft.ops.Search.rm3IngestIndex]] — the same
  * standing artifacts RM3 serving reads, or the persisted
  * [[graft.ops.IndexStore]] layout).
  *
  * Stateless stream-static: candidates and doc tokens come only from the
  * STANDING corpus, so each answer depends only on its own row plus
  * static relations and the result equals the batch form under ANY
  * batching (`MaxsimStreamSpec` pins two-batch delivery). Results land in
  * the keyed-upsert sink under (query_id, mrnk).
  *
  * Scale: per-trigger cost is one recall probe + a candidate-bounded
  * rerank join per arrival against persisted relations —
  * corpus-size-independent per document; state is zero. */
object MaxsimStream {

  /** Run the MaxSim ingest stream to completion and return the resolved
    * reranked answers. */
  def streamedMaxsim(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-smaxsim-")
    val (idx, fwd) = graft.ops.Search.rm3IngestIndex(ss, sfDir)
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
          graft.ops.Search.maxsimProbe(b.toDF(), idx, fwd), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "mrnk"))
      .select(col("query_id"), col("neighbor_id"), col("bm25_rnk"),
        col("maxsim_score"), col("mrnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_maxsim_stream" -> ((s, d) => streamedMaxsim(s, d)))

  /** Stateless stream-static rerank ⇒ NO watermark cut: the oracle is the
    * batch ingest MaxSim verbatim. */
  val oracle: Map[String, String] = Map(
    "s_maxsim_stream" -> graft.ops.Search.oracle("x_search_maxsim_in"))
}
