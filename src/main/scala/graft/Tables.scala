package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All loads are plain parquet scans so Catalyst pushdown (filters, column
  * pruning, partition pruning on a real lake layout) applies untouched.
  *
  * Timestamp normalization: the driver has generated the tables under TWO
  * physical layouts across rounds —
  *
  *  - `events.ts` as parquet `TIMESTAMP(NANOS, isAdjustedToUTC=false)`,
  *    which Spark does not support as a timestamp type
  *    (PARQUET_TYPE_ILLEGAL): read as nanos-since-epoch via
  *    `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds —
  *    exactly what DuckDB does when it coerces TIMESTAMP_NS to TIMESTAMP;
  *  - timestamp columns as `TIMESTAMP(MICROS, isAdjustedToUTC=false)`
  *    (`timestamp[us]` with no timezone), which Spark reads as
  *    TIMESTAMP_NTZ: cast to TimestampType under the UTC session timezone
  *    (set by every entry point and `build.sbt`'s test JVM), a value-identical
  *    relabeling that keeps the whole operator surface — `window()`,
  *    watermarks, day arithmetic, oracle dumps — on the session type it was
  *    built and verified against.
  *
  * Both normalizations are schema-driven, so either on-disk layout loads to
  * the SAME logical relation and every oracle hash is layout-invariant.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Cast every TIMESTAMP_NTZ column to TimestampType (µs, session-UTC).
    * Shared with the streaming reader ([[graft.streaming.EventPipeline]]),
    * whose source must apply the identical normalization or the
    * streaming/batch equivalence goldens would compare different instants. */
  private[graft] def normalizeNtz(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType => acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => acc
      }
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Events stream table with `ts` restored to TimestampType (µs, UTC),
    * whichever physical layout the driver generated (scaladoc above). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => normalizeNtz(raw)
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
