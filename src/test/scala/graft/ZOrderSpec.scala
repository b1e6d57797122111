package graft

import org.apache.spark.sql.functions._

/** The z-order layout must actually BUY multi-dimensional locality: per-file
  * (min, max) spans of BOTH interleaved columns must be far narrower than a
  * single-column (orderkey) sort produces — that span ratio IS the file-
  * skipping factor a predicate on either column gets at 100 TB. */
class ZOrderSpec extends SparkSpec {

  test("z-order files cover far narrower (pk, sk) rectangles than an orderkey sort") {
    graft.functions.GraftFunctions.register(spark)
    val z = ops.Relational.zorderLayout(spark, sf)
      .agg(sum(col("pk_hi") - col("pk_lo")).as("pk_span"),
        sum(col("sk_hi") - col("sk_lo")).as("sk_span"))
      .collect()(0)
    // naive layout: same 32-way ntile packing, but ordered by l_orderkey —
    // the single-column sort a non-z-ordered write produces
    val li = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").cast("long").as("pk"),
      col("l_suppkey").cast("long").as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    val naive = li.withColumn("file_id", ntile(32).over(w))
      .groupBy(col("file_id"))
      .agg((max(col("pk")) - min(col("pk"))).as("pk_d"), (max(col("sk")) - min(col("sk"))).as("sk_d"))
      .agg(sum(col("pk_d")).as("pk_span"), sum(col("sk_d")).as("sk_span"))
      .collect()(0)
    val (zPk, zSk) = (z.getLong(0), z.getLong(1))
    val (nPk, nSk) = (naive.getLong(0), naive.getLong(1))
    assert(zPk * 4 <= nPk, s"z-order pk span $zPk not ≥4× narrower than naive $nPk")
    assert(zSk < nSk, s"z-order sk span $zSk not narrower than naive $nSk")
  }

  test("semantic dedup keeps every cluster's min vec and only prunes against lower ids") {
    val out = ops.Dedup.semanticDedup(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // the lowest vec_id of each cluster has no lower-id neighbor → always kept
    rows.groupBy(_._2).foreach { case (cl, vs) =>
      val minVec = vs.minBy(_._1)
      assert(minVec._3, s"cluster $cl min vec ${minVec._1} was pruned")
    }
    assert(rows.exists(!_._3), "no vector pruned — threshold vacuous at this sf")
  }

  test("multi-probe search probes exactly home + Hamming-1 buckets and stays within top-k") {
    val out = ops.Similarity.multiProbeTopK(spark, sf)
    val byQ = out.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, ns) =>
      assert(ns.length <= 10, s"query $q returned ${ns.length} > k rows")
      assert(ns.map(_._2).distinct.length === ns.length, s"query $q has duplicate neighbors")
    }
  }
}
