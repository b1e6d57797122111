package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The FIFTIETH streaming execution: CLUSTER-BALANCED SAMPLE MAINTENANCE —
  * the batch [[graft.ops.Diversify.clusterBalanced]] kept current AS
  * VECTORS ARRIVE. The standing quantizer (the seed-step centroid table
  * the batch assignment uses, [[graft.ops.Similarity.seedCentroids]]) is
  * derived once at query start and broadcast; each arriving vector is
  * assigned to its nearest cell ENTIRELY IN-ROW (a fold over the k-element
  * centroid array — no per-vector shuffle, no vec_id-keyed state), and one
  * stateful update-mode aggregation per cell maintains BOTH the arrival
  * count and the bottom-n hash sample.
  *
  * Correctness rides on two mergeable laws: counts are trivially
  * associative, and bottom-n(A ∪ B) = bottom-n(bottom-n(A) ∪ bottom-n(B))
  * (the [[SampleStream]] KMV law, here per cell through
  * [[graft.functions.BottomKByKeyAgg]]'s streaming state) — so the
  * maintained table equals the batch sample under ANY batching, and the
  * stream shares the batch oracle verbatim.
  *
  * State story at scale: k cells × (one long + n (hash, id) pairs) — a few
  * KB of state store regardless of corpus size; per-trigger work is the
  * batch's own rows × an O(k·d) in-row fold. This is how a 100 TB corpus
  * keeps its coverage-stratified eval sample standing: nobody re-clusters
  * or re-scans to refresh 8×16 rows. */
object ClusterSampleStream {

  /** Run the maintenance stream to completion over the embeddings table
    * and return the resolved standing sample. */
  def streamedClusterSample(s: SparkSession, sfDir: String): DataFrame = {
    val ss = EventPipeline.streamingSession(s)
    graft.functions.GraftFunctions.register(ss)
    val scratch = graft.ops.SpillMemo.scratchDir("graft-scbs-")
    // The standing quantizer: k centroid vectors as ONE broadcastable row
    // (sorted by cluster so the strict-< fold tie-breaks to the lowest
    // cluster id, the batch argmin's struct-min order).
    val cents = graft.ops.Lineage.cut(
      graft.ops.Similarity.seedCentroids(ss, sfDir)
        .groupBy()
        .agg(expr("array_sort(collect_list(struct(cluster, cv)))").as("cents")))
    val n = graft.ops.Diversify.cbPerCluster
    val agg = udaf(new graft.functions.BottomKByKeyAgg(n),
      Encoders.product[graft.functions.KeyedId])
    val schema = EventPipeline.tableSchema(ss, s"$sfDir/embeddings.parquet")
    val dir = EventPipeline.installSourceDir(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"))
    val assigned = ss.readStream.schema(schema).parquet(dir.toString)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("q"))
      .crossJoin(broadcast(cents))
      .withColumn("cluster", expr(
        """aggregate(cents,
          |  named_struct('d', CAST(4611686018427387903 AS BIGINT), 'c', CAST(-1 AS BIGINT)),
          |  (acc, ct) -> CASE
          |    WHEN aggregate(zip_with(q, ct.cv, (a, b) -> (a - b) * (a - b)),
          |                   0L, (s2, v) -> s2 + v) < acc.d
          |    THEN named_struct(
          |      'd', aggregate(zip_with(q, ct.cv, (a, b) -> (a - b) * (a - b)),
          |                     0L, (s2, v) -> s2 + v),
          |      'c', ct.cluster)
          |    ELSE acc END).c""".stripMargin))
      .withColumn("h", substring(md5(col("vec_id").cast("string")), 1, 12))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cluster"), agg(col("h"), col("vec_id")).as("bot"))
    val q = assigned.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: Dataset[Row], id: Long) =>
        UpsertSink.writeBatch(b, id, s"$scratch/sink"))
      .start()
    q.awaitTermination()
    EventPipeline.releaseStreamState(ss)
    UpsertSink.resolve(ss, s"$scratch/sink", Seq("cluster"))
      .select(col("cluster"), col("n_cluster"),
        posexplode(col("bot")).as(Seq("pos", "kid")))
      .select(col("cluster"), col("n_cluster"),
        (col("pos") + 1).cast("long").as("rk"), col("kid.id").as("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cluster_sample_stream" -> ((s, d) => streamedClusterSample(s, d)))

  /** Static quantizer + mergeable per-cell state ⇒ no watermark cut: the
    * oracle is the batch cluster-balanced sample verbatim. */
  val oracle: Map[String, String] = Map(
    "s_cluster_sample_stream" ->
      graft.ops.Diversify.oracle("x_sample_cluster_balanced"))
}
