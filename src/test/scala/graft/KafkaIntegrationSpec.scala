package graft

import graft.streaming.KafkaBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Env-gated live-broker integration test for the Kafka surface
  * ([[graft.streaming.KafkaBridge]]): the reference consumer's full path —
  * subscribe → `from_json` parse → null gate → watermarked sliding-window
  * count (`/root/reference/consumer/consumer.py:88-131`) — executed against
  * a REAL broker when `SPARK_GRAFT_KAFKA=<bootstrap.servers>` is set, and
  * cancelled (not silently passed) otherwise: this container ships no broker
  * and no Kafka connector jar, so by default the suite records the skip.
  *
  * An EMBEDDED in-process KRaft broker was evaluated as the way to ungate
  * this hermetically (round-9 review suggestion) and is not buildable here:
  * the sandbox resolves dependencies offline from a pre-warmed cache that
  * contains no `kafka-server`/`kafka-clients`/`spark-sql-kafka` artifact
  * anywhere (`/opt/spark/jars` ships none either), and the environment has
  * no network egress to fetch one. The env gate — cancel loudly, never
  * fake a pass — remains the honest boundary for this surface; every
  * broker-independent piece of the path (wire format round-trip, parse,
  * null gate, windowed agg) is covered by the hermetic suites.
  *
  * To run: point SPARK_GRAFT_KAFKA at a broker and put
  * `spark-sql-kafka-0-10` + its transitive jars on the test classpath. */
class KafkaIntegrationSpec extends SparkSpec {

  private val broker = sys.env.get("SPARK_GRAFT_KAFKA")

  test("live Kafka: produce wire rows, sourceReader.load -> parseWire -> windowed agg") {
    assume(broker.isDefined,
      "SPARK_GRAFT_KAFKA unset — no broker in this environment (skip is expected here)")
    import spark.implicits._
    val bs = broker.get
    val topic = s"graft_it_${System.currentTimeMillis()}"

    // Producer side (S5): wire-format rows through the Kafka batch sink.
    val events = Seq(
      ("u1", "i1", "click", "2024-01-01T00:00:05"),
      ("u1", "i2", "view", "2024-01-01T00:00:20"),
      ("u2", "i1", "click", "2024-01-01T00:01:05"),
      (null, "i9", "click", "2024-01-01T00:01:10")) // null gate must drop this
      .toDF("user_id", "item_id", "interaction_type", "timestamp")
    KafkaBridge.toWire(events).write.format("kafka")
      .option("kafka.bootstrap.servers", bs).option("topic", topic).save()

    // Consumer side (S1+C1-C7): the full reference pipeline over the broker.
    val parsed = KafkaBridge.parseWire(
      KafkaBridge.sourceReader(spark, bs, topic, startingOffsets = "earliest").load())
    val agg = parsed
      .withWatermark("timestamp", "10 minutes")
      .groupBy(window(col("timestamp"), "10 minutes", "5 minutes"), col("user_id"))
      .count()
    val q = agg.writeStream.format("memory").queryName("kafka_it")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()

    // 3 surviving events × 2 overlapping windows each
    assert(spark.table("kafka_it").agg(sum("count")).head.getLong(0) === 6L)
    assert(spark.table("kafka_it").select("user_id").distinct().count() === 2L)
  }

  test("live Kafka: tools.Pipeline's broker path end-to-end (kafkaSource -> fan-out -> upsert sinks)") {
    assume(broker.isDefined,
      "SPARK_GRAFT_KAFKA unset — no broker in this environment (skip is expected here)")
    import spark.implicits._
    val bs = broker.get
    val topic = s"graft_pipe_${System.currentTimeMillis()}"
    val outDir = java.nio.file.Files.createTempDirectory("graft-pipe-it-").toString

    val events = Seq(
      ("u1", "i1", "click", "2024-01-01T00:00:05"),
      ("u1", "i2", "view", "2024-01-01T00:00:20"),
      ("u2", "i1", "click", "2024-01-01T00:01:05"),
      (null, "i9", "click", "2024-01-01T00:01:10")) // null gate must drop this
      .toDF("user_id", "item_id", "interaction_type", "timestamp")
    KafkaBridge.toWire(events).write.format("kafka")
      .option("kafka.bootstrap.servers", bs).option("topic", topic).save()

    // The binary's exact topology: broker source + the C10 fan-out into
    // keyed-upsert sinks — what `SPARK_GRAFT_KAFKA=... runMain
    // graft.tools.Pipeline` runs, driven here with AvailableNow.
    val qs = graft.tools.Pipeline.startQueries(
      graft.tools.Pipeline.kafkaSource(spark, bs, topic), outDir,
      Trigger.AvailableNow())
    try qs.foreach(_.awaitTermination(120000)) finally qs.foreach(_.stop())

    // 3 surviving events × 2 overlapping windows each, per fan-out key
    val userKpi = graft.streaming.UpsertSink.resolve(spark, s"$outDir/user_id/sink",
      Seq("window_start", "window_end", "user_id"))
    val itemKpi = graft.streaming.UpsertSink.resolve(spark, s"$outDir/item_id/sink",
      Seq("window_start", "window_end", "item_id"))
    assert(userKpi.agg(sum("total_interactions")).head.getLong(0) === 6L)
    assert(itemKpi.agg(sum("total_interactions")).head.getLong(0) === 6L)
    assert(userKpi.select("user_id").distinct().count() === 2L)
    assert(itemKpi.select("item_id").distinct().count() === 3L)
  }
}
