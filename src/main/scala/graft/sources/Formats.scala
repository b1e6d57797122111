package graft.sources


import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-format source/sink coverage (SURVEY §2.1 S4/S5 widened): the events
  * table pushed through a real on-disk round-trip in each text format —
  * write with the format's sink, read back with the format's source under an
  * EXPLICIT schema (schema inference is a correctness and scan-cost hazard
  * at 100 TB — it reads the data twice and guesses types), then aggregate.
  * The aggregation result must equal the same aggregation over the original
  * parquet, which is exactly what the oracle checks — so the round-trip
  * proves the source/sink pair preserves values, not just row counts.
  *
  * Values that are fragile in text formats are normalized BEFORE writing:
  * event time as integer µs (ISO-8601 timestamp parsing differs across
  * engines), money as integer cents (decimal text → double re-parse need
  * not be bit-identical). That normalization is the practice a lake
  * pipeline uses for text interchange anyway.
  */
object Formats {

  /** Events projected to a text-format-safe schema. */
  private def safeEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("user_id"),
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("value_c"))

  /** Per-type rollup used on both sides of the oracle comparison. */
  private def rollup(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value_c")).as("value_c_sum"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))

  private def roundtrip(s: SparkSession, d: String, format: String): DataFrame = {
    val dir = graft.ops.SpillMemo.scratchDir(s"graft-io-$format-")
    val ev = safeEvents(s, d)
    ev.write.mode("overwrite").format(format)
      .option("header", "true") // csv only; ignored by json
      .save(dir)
    rollup(s.read.schema(ev.schema).format(format)
      .option("header", "true")
      .load(dir))
  }

  /** JSON-lines sink → source round-trip (the Kafka wire format at rest). */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = roundtrip(s, d, "json")

  /** CSV sink → source round-trip (the interchange format every export
    * pipeline eventually meets). */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = roundtrip(s, d, "csv")

  /** ORC sink → source round-trip — the other columnar lake format Spark
    * ships natively. Unlike the text formats, ORC is typed and compressed
    * on disk (predicate pushdown and column pruning work the same as
    * parquet), so this pins that the engine's SECOND columnar path
    * preserves values end to end, not just the text interchange ones. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = roundtrip(s, d, "orc")

  /** Hive-partitioned lake round-trip WITH partition pruning: events land
    * partitioned by integer day (`partitionBy` — the layout every event
    * lake uses), and the read-back filters on a partition-column predicate
    * so the scan PRUNES at planning time: non-matching day directories are
    * never listed, opened, or read. That skip is the single biggest lever
    * on a 100 TB event lake (a day-scoped query reads 1/365th of the
    * files before any row-level work), and it falls out of the
    * declarative plan — the predicate lands in the scan's
    * `PartitionFilters`, pinned by `PlanShapeSpec`, while row values ride
    * through the same lossless rollup oracle as the format round-trips.
    * The modulus predicate (every third day) deliberately isn't a range:
    * pruning evaluates ARBITRARY deterministic predicates against the
    * partition listing, not just boundaries. */
  def partitionedRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.ops.SpillMemo.scratchDir("graft-io-part-")
    // FLOOR division for the day key (pure integer — subtract one when a
    // negative ts has a nonzero remainder): Spark's `div` truncates toward
    // zero while the oracle's DuckDB `//` floors, so the two would disagree
    // on pre-1970 timestamps; floor on both sides is fixture-proof.
    val ev = safeEvents(s, d).withColumn("day",
      expr("ts_us div 86400000000 - (CASE WHEN ts_us % 86400000000 < 0 THEN 1 ELSE 0 END)"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    rollup(s.read.schema(ev.schema).parquet(dir).filter(expr("day % 3 = 1")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_io_json_roundtrip" -> jsonRoundtrip,
    "c_io_csv_roundtrip" -> csvRoundtrip,
    "c_io_orc_roundtrip" -> orcRoundtrip,
    "c_io_partitioned_roundtrip" -> partitionedRoundtrip)

  private val rollupSql =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c_sum,
      |       min(epoch_us(ts)) AS min_ts_us,
      |       max(epoch_us(ts)) AS max_ts_us
      |FROM events GROUP BY 1""".stripMargin

  /** The round-trip must be lossless, so the oracle is the same rollup over
    * the ORIGINAL table — any value corrupted in flight breaks the hash. */
  val oracle: Map[String, String] = Map(
    "c_io_json_roundtrip" -> rollupSql,
    "c_io_csv_roundtrip" -> rollupSql,
    "c_io_orc_roundtrip" -> rollupSql,
    "c_io_partitioned_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c_sum,
        |       min(epoch_us(ts)) AS min_ts_us,
        |       max(epoch_us(ts)) AS max_ts_us
        |FROM events
        |WHERE (epoch_us(ts) // 86400000000) % 3 = 1
        |GROUP BY 1""".stripMargin)
}
