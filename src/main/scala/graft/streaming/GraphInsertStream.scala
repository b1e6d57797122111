package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The TWENTY-SIXTH streaming execution: GRAPH-INDEX MAINTENANCE AS A
  * STREAM — the write-path twin of [[GraphAnnStream]]'s read path, closing
  * the serving loop: vectors arrive, are searched against the standing
  * navigable graph, and are INSERTED — each gets its search results as
  * out-edges, and every touched corpus vertex's adjacency is re-trimmed
  * incrementally against the sink's current lists
  * ([[graft.ops.Similarity.insertRows]] — the SAME definition the batch
  * `x_sim_graph_insert` runs, so batch and stream cannot drift).
  *
  * The per-trigger prior comes from resolving the query's OWN upsert sink
  * (merge-on-read, exactly what a lakehouse index table serves): a vertex
  * re-trimmed by an earlier micro-batch reads back its current list; one
  * never touched falls back to the static edge relation. Convergence to
  * the batch answer under ANY micro-batching — and idempotence when a
  * batch replays over its own output after checkpoint recovery — follows
  * from the bounded-heap merge law (insertRows' scaladoc);
  * `GraphInsertStreamSpec` pins both, and the DuckDB oracle is the batch
  * insert's verbatim.
  *
  * Scale: per-trigger cost is the batch's search (corpus-independent per
  * vector) plus a re-trim over ≤ |batch|·k touched vertices × (degree +
  * |batch|) candidates; the sink delta holds only touched keys. State is
  * zero — the INDEX is the state, persisted where a real deployment keeps
  * it: in the table, not in a state store. */
object GraphInsertStream {

  def streamedGraphInsert(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-sgins-")
    val (edges, allVecs) = graft.ops.Similarity.insertIndex(ss, sfDir)
    val (_, corpusIdx, c) = graft.ops.Similarity.ingestGraphIndex(ss, sfDir)
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/embeddings.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"))
    val ingest = ss.readStream.schema(schema).parquet(dir.toString)
      .filter(col("vec_id") % graft.ops.Similarity.knnBatchMod === 7)
      .select(col("vec_id"), col("embedding"))
    val sink = s"$scratch/sink"
    val q = ingest.writeStream
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(
          insertDelta(ss, b.toDF(), id, sink, edges, corpusIdx, c, allVecs),
          id, sink)
      }
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, sink, Seq("src", "rnk"))
      .select(col("src"), col("dst"), col("rnk"), col("is_new"))
  }

  /** One micro-batch's insert rows: search the arriving vectors, then
    * re-trim against the sink's PRE-BATCH state (an empty sink — first
    * batch — means every touched vertex starts from the static edges).
    * The batch's own delta is excluded from the prior: on checkpoint
    * replay `b<id>` may already exist from the failed attempt, and
    * including it would both change the visible state and make the job
    * read the directory its own write overwrites
    * ([[UpsertSink.resolve]]'s `exceptBatch`). Shared with
    * `GraphInsertStreamSpec`'s MemoryStream harness. */
  private[graft] def insertDelta(ss: SparkSession, batch: DataFrame,
      batchId: Long, sink: String, edges: DataFrame, corpusIdx: DataFrame,
      c: DataFrame, allVecs: DataFrame): DataFrame = {
    val searched =
      graft.ops.Similarity.graphBeamProbe(batch, edges, corpusIdx, c)
    val hasDeltas = Option(new java.io.File(sink).listFiles())
      .exists(_.exists(f => f.isDirectory && f.getName.startsWith("b") &&
        f.getName != s"b$batchId"))
    val prior =
      if (hasDeltas)
        Some(UpsertSink.resolve(ss, sink, Seq("src", "rnk"), Some(batchId)))
      else None
    graft.ops.Similarity.insertRows(searched, prior, edges, allVecs)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_graph_insert_stream" -> ((s, d) => streamedGraphInsert(s, d)))

  /** Incremental trims converge to the one-shot trim (merge law) ⇒ the
    * oracle is the batch insert's verbatim — no watermark cut. */
  val oracle: Map[String, String] = Map(
    "s_graph_insert_stream" -> graft.ops.Similarity.oracle("x_sim_graph_insert"))
}
