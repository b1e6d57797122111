package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FORTY-NINTH streaming execution: MMR-DIVERSIFIED SERVING — the
  * streaming twin of [[graft.ops.Diversify.mmrTopK]], and the shape a RAG
  * answer path actually runs: queries ARRIVE, the corpus STANDS. Each
  * micro-batch's queries are brute-scored against the standing corpus
  * (broadcast query panel over the corpus scan, bounded-heap candidate
  * pool), then the greedy relevance-vs-redundancy selection runs per query
  * entirely within its own candidate pool.
  *
  * Semantics make this the easy kind of stream: the probe is STATELESS
  * (static corpus ⇒ per-batch join, nothing to evict, no watermark), and a
  * query's diversified picks depend only on ITS OWN pool — complete within
  * the query's micro-batch — so the result equals the batch `x_sim_mmr`
  * under ANY batching of the arriving panel. The per-batch work is the
  * shared [[graft.ops.Diversify.mmrFor]] core on the micro-batch frame,
  * landing in the keyed-upsert sink under (query_id, pick) so checkpoint
  * replay is idempotent.
  *
  * Scale: per-trigger cost is |arriving queries| × (corpus scan for the
  * pool + pool²·picks greedy arithmetic) — in production the pool stage
  * reads an ANN rung's persisted index ([[graft.ops.IndexStore]]) instead
  * of the brute scan, and the greedy stage is rung-agnostic either way;
  * state is zero. */
object MmrStream {

  /** Run the MMR serving stream to completion (the batch twin's strided
    * panel plays the arriving queries) and return the resolved sink. */
  def streamedMmr(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-smmr-")
    val corpus = graft.ops.Lineage.cut(graft.ops.Similarity.corpus(ss, sfDir))
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/embeddings.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"))
    val arriving = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("vec_id") % graft.ops.Diversify.mmrStride === 0)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
    val q = arriving.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          graft.ops.Diversify.mmrFor(corpus, b.toDF()), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "pick"))
      .select(col("query_id"), col("pick"), col("neighbor_id"), col("rel"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_mmr_stream" -> ((s, d) => streamedMmr(s, d)))

  /** Stateless stream-static serving ⇒ NO watermark cut: the oracle is the
    * batch form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_mmr_stream" -> graft.ops.Diversify.oracle("x_sim_mmr"))
}
