package graft

import graft.ops.{Dedup, Lineage}
import org.apache.spark.sql.functions._

/** [[graft.ops.Lineage]] contract: the cluster-mode reliable-checkpoint flag
  * must (a) refuse to run without a checkpoint dir (silent fallback to
  * non-fault-tolerant localCheckpoint would defeat its purpose), (b) still
  * truncate the logical plan — the reason the cut exists — and (c) leave
  * iterative results identical to local mode. */
class LineageSpec extends SparkSpec {

  test("reliable checkpoint mode: loud without a dir, truncates plan, same results") {
    import spark.implicits._
    val base = Dedup.components(spark, sf).orderBy("doc_id").collect().toSeq

    spark.conf.set(Lineage.reliableConf, "true")
    try {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        // (a) no silent fallback: reliable mode without a dir must throw
        val df = Seq((1L, "a")).toDF("id", "v")
        assertThrows[IllegalArgumentException](Lineage.cut(df))
      }
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-chk-").toString)

      // (b) the cut truncates lineage to a LogicalRDD in reliable mode too
      val agg = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "v")
        .groupBy($"v").agg(count(lit(1)).as("n"))
      val cut = Lineage.cut(agg)
      assert(cut.queryExecution.logical.getClass.getSimpleName == "LogicalRDD",
        s"reliable cut must yield a LogicalRDD plan, got:\n${cut.queryExecution.logical}")
      assert(cut.orderBy("v").collect().toSeq === agg.orderBy("v").collect().toSeq)

      // (c) the iterative algorithm is mode-independent
      val rel = Dedup.components(spark, sf).orderBy("doc_id").collect().toSeq
      assert(rel === base)
    } finally {
      spark.conf.unset(Lineage.reliableConf)
    }
  }
}
