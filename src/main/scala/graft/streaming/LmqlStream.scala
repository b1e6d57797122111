package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed DIRICHLET-LM SEARCH AT INGEST — the query-likelihood sibling
  * of [[SearchStream]]: arriving documents (`doc_id % 10 = 7`, the ingest
  * convention) are scored against the standing-corpus LM index inside each
  * micro-batch, via the SAME probe definition the batch `x_search_lmql_in`
  * runs ([[graft.ops.Search.lmqlProbe]]) — batch and stream cannot drift.
  * The index ([[graft.ops.Search.lmIngestIndex]]: tf-pruned postings with
  * collection frequencies, document lengths, term df, the two 1-row stats)
  * derives ONCE at query start, each relation lineage-cut, so a trigger
  * pays only its own arrivals' term probes.
  *
  * Stateless stream-static search: no watermark, nothing to evict; each
  * arriving document's top-k depends only on its own text plus the static
  * index, so the result equals the batch form under ANY batching of the
  * source ([[LmqlStreamSpec]] pins two-batch delivery and restart
  * recovery). Results land in the keyed-upsert sink under (query_id, rnk)
  * — checkpoint replay idempotent.
  *
  * Scale: per-trigger cost is arrivals × [[graft.ops.Search.qTerms]]
  * pruned-posting probes plus one broadcast length lookup — corpus-size-
  * independent per document once the index stands; state is zero. Running
  * the LM scorer as a second stream over the SAME arrivals is how a
  * serving tier A/B-tests scoring families at 100 TB: both read one index
  * build's artifacts, neither re-tokenizes the corpus. */
object LmqlStream {

  /** Run the ingest LM stream to completion over the documents table and
    * return the resolved answer table. */
  def streamedLmql(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-slmql-")
    val idx = graft.ops.Search.lmIngestIndex(ss, sfDir)
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
          graft.ops.Search.lmqlProbe(b.toDF(), idx), id, s"$scratch/sink")
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("query_id", "rnk"))
      .select(col("query_id"), col("neighbor_id"), col("score_fp"),
        col("n_terms"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_lmql_stream" -> ((s, d) => streamedLmql(s, d)))

  /** Stateless stream-static search ⇒ NO watermark cut: the oracle is the
    * batch ingest form verbatim. */
  val oracle: Map[String, String] = Map(
    "s_lmql_stream" -> graft.ops.Search.oracle("x_search_lmql_in"))
}
