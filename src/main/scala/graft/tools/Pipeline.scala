package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EventPipeline, LagMonitor, RateEvents, Shutdown, UpsertSink}

/** The reference consumer's `main()` re-expressed Spark-native
  * (`/root/reference/consumer/consumer.py:53-293` + the producer folded in):
  * a rate-limited synthetic event stream (P1+P2) → watermarked sliding-window
  * counts per user AND per item (C5–C8, C10 fan-out) → keyed-upsert sinks
  * with per-query checkpoints (S3+S6) → push-based lag monitor (C11) →
  * graceful shutdown (C12). This is the binary a user of the reference would
  * run instead of `consumer.py`; swap [[RateEvents.stream]] for
  * `KafkaBridge.sourceReader(...).load()` + `parseWire` in a deployment with
  * brokers.
  *
  * Usage: `runMain graft.tools.Pipeline [outDir] [rowsPerSecond] [seconds]`
  * (defaults: temp dir, 1000 rows/s — the reference's default rate, 15 s).
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline-").toString)
    val rate = args.lift(1).map(_.toInt).getOrElse(1000)
    val seconds = args.lift(2).map(_.toInt).getOrElse(15)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Shutdown.installHook(spark)                               // C12
    spark.streams.addListener(new LagMonitor.Listener())      // C11

    // observe(): per-batch input metrics surfaced through the same listener
    // bus as the lag monitor — the production way to count rows without a
    // second action (shows up in QueryProgressEvent.observedMetrics)
    val events = RateEvents.stream(spark, rate)               // P1+P2
      .observe("ingest", org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    val queries = Seq("user_id", "item_id").map { key =>      // C10 fan-out
      EventPipeline.start(
        events, key,
        sinkDir = s"$outDir/$key/sink",
        checkpointDir = s"$outDir/$key/ckpt",
        trigger = Trigger.ProcessingTime("2 seconds"))
    }

    Thread.sleep(seconds * 1000L)
    Shutdown.stopAllGraceful(spark) // drain in-flight offsets, stop between batches
    queries.foreach(_.awaitTermination())

    Seq("user_id", "item_id").foreach { key =>
      val n = UpsertSink.resolve(spark, s"$outDir/$key/sink",
        Seq("window_start", "window_end", key)).count()
      println(s"[pipeline] $key KPI rows upserted: $n (sink=$outDir/$key/sink)")
    }
    spark.stop()
  }
}
