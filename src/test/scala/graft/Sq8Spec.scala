package graft

/** Scalar-quantization search rung ([[graft.ops.Similarity.sq8TopK]]):
  * the code domain is well-formed and the recall differential against
  * float truth is coherent. */
class Sq8Spec extends SparkSpec {

  test("sq8 top-k: k results per query, neighbors never the query itself") {
    val out = graft.ops.Similarity.sq8TopK(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq,
        "ranks dense from 1")
      assert(!rows.exists(_.getLong(1) == q), "self excluded")
    }
  }

  test("sign top-k: k dense ranks per query, self excluded") {
    val out = graft.ops.Similarity.signTopK(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
      assert(!rows.exists(_.getLong(1) == q))
    }
  }

  test("compression ladder orders: sign (1-bit) recalls no better than sq8 (8-bit)") {
    def bp(df: org.apache.spark.sql.DataFrame): Double = {
      val rs = df.collect(); rs.map(_.getLong(4)).sum.toDouble / rs.length
    }
    val s8 = bp(graft.ops.Similarity.recallSq8(spark, sf))
    val s1 = bp(graft.ops.Similarity.recallSign(spark, sf))
    assert(s1 <= s8,
      s"1-bit codes recalling MORE than 8-bit codes ($s1 vs $s8) would mean a broken codec")
  }

  test("sq8 recall: every query answered, n_common <= n_brute, recall in basis points") {
    val out = graft.ops.Similarity.recallSq8(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nb, n8, nc, bp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n8 == nb, "code-domain search scans the full corpus: no short lists")
      assert(nc <= nb && bp == math.round(nc.toDouble * 10000 / nb))
      assert(nc > 0, "8-bit codes of the float corpus must agree on SOME of the top-k")
    }
  }
}
