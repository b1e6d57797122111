package graft

import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CmEvt(user_id: Long)

/** The streaming count-min grid accumulates across micro-batches and — the
  * property `s_sketch_stream`'s shared oracle rests on — equals the batch
  * grid over the same events, cell for cell. */
class CmStreamSpec extends SparkSpec {
  import spark.implicits._

  private def gridOf(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(array(Sketches.cmCellStructs: _*)).as("c"))
      .select(col("c.r").as("r"), col("c.b").as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))

  test("streamed grid equals the batch grid after multiple micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CmEvt]
    val q = gridOf(in.toDF()).writeStream.format("memory").queryName("cm_t")
      .outputMode("complete").start()
    try {
      val batch1 = (1L to 40L).map(CmEvt)
      val batch2 = (20L to 60L).map(CmEvt) // overlapping keys accumulate
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cm_t")
        .as[(Long, Long, Long)].collect().toSet
      val batch = gridOf((batch1 ++ batch2).toDF())
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(0L, 1L, 2L, 3L)) // all 4 hash rows
      // total increments = 4 cells per event
      assert(streamed.toSeq.map(_._3).sum == 4L * (batch1.size + batch2.size))
    } finally q.stop()
  }
}
