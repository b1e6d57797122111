package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed QUERY EXPANSION AT SERVE TIME — the RM3 sibling of
  * [[SearchStream]]: each arriving document (`doc_id % 10 = 7`) runs the
  * full two-round expanded search inside its micro-batch — round-1 BM25
  * against the standing pruned index, pseudo-relevance feedback mined
  * from the standing corpus's forward relation, round-2 with the widened
  * term set — via the SAME probe definition the batch `x_search_rm3_in`
  * runs ([[graft.ops.Search.rm3Probe]]), so batch and stream cannot
  * drift. The static pair (pruned index, forward relation) derives ONCE
  * at query start, lineage-cut ([[graft.ops.Search.rm3IngestIndex]]).
  *
  * Stateless stream-static: feedback comes only from the STANDING corpus
  * (an arrival's own batch never feeds back into its expansion — the
  * index doesn't contain arrivals), so each answer depends only on its
  * own row plus static relations and the result equals the batch form
  * under ANY batching (`Rm3StreamSpec` pins two-batch delivery). Results
  * land in the keyed-upsert sink under (query_id, rnk).
  *
  * Scale: per-trigger cost is two probe rounds + a k-doc feedback join
  * per arrival against persisted relations — corpus-size-independent per
  * document; state is zero. */
object Rm3Stream {

  /** Run the RM3 ingest stream to completion and return the resolved
    * expanded-search answers. */
  def streamedRm3(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-srm3-")
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
          graft.ops.Search.rm3Probe(b.toDF(), idx, fwd), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "rnk"))
      .select(col("query_id"), col("neighbor_id"), col("score_m"),
        col("n_terms"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_rm3_stream" -> ((s, d) => streamedRm3(s, d)))

  /** Stateless stream-static search ⇒ NO watermark cut: the oracle is the
    * batch ingest RM3 verbatim. */
  val oracle: Map[String, String] = Map(
    "s_rm3_stream" -> graft.ops.Search.oracle("x_search_rm3_in"))
}
