package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dashboard analytics over the KPI tables — reference
  * `reporting/reporting.py` rows D4-D12 of SURVEY §2.3. Each query is
  * self-contained: it recomputes the KPI aggregation (WindowAgg) and applies
  * the dashboard op, so the driver can oracle-check it end-to-end.
  *
  * Scale notes: top-N queries compile to `TakeOrderedAndProject` (per-partition
  * heap + driver merge of N rows, no global sort — the pandas reference
  * full-sorts, `reporting/reporting.py:150-154`). The latest-window snapshot
  * uses a broadcast scalar-aggregate join rather than a single-partition
  * window function, so it holds when the KPI table itself is huge.
  */
object Analytics {

  private def uw(s: SparkSession, d: String) = WindowAgg.userWindows(s, d)
  private def tw(s: SparkSession, d: String) = WindowAgg.typeWindows(s, d)

  private val uwSql = WindowAgg.windowsSql("user_id")
  private val twSql = WindowAgg.windowsSql("event_type")

  /** D4: global mean of per-(window,user) counts, 2 dp
    * (`reporting/reporting.py:101-104`). Explicit sum/count division so the
    * double result is bit-identical to the oracle's. */
  def kpiAvg(s: SparkSession, d: String): DataFrame =
    uw(s, d)
      .agg(sum("total_interactions").as("s"), count(lit(1)).as("c"))
      .select(round(col("s").cast("double") / col("c"), 2).as("avg_interactions"))

  /** D5+D6: global max/min over the item-analog KPI table
    * (`reporting/reporting.py:105-112`). */
  def kpiExtremes(s: SparkSession, d: String): DataFrame =
    tw(s, d).agg(
      max("total_interactions").as("max_interactions"),
      min("total_interactions").as("min_interactions"))

  /** D7: most recent 100 KPI rows (`reporting/reporting.py:122-132`), full
    * tie-break for determinism. */
  def recentWindows(s: SparkSession, d: String): DataFrame =
    uw(s, d)
      .orderBy(col("window_end").desc, col("user_id").asc)
      .limit(100)

  /** D8: top-N rows by measure (`reporting/reporting.py:150-154`), N=20
    * default. Per-(window,user) rows, not summed across windows — preserved
    * exactly per SURVEY §2.3 D8. */
  def topUsers(s: SparkSession, d: String): DataFrame =
    uw(s, d)
      .orderBy(col("total_interactions").desc, col("user_id").asc, col("window_start").asc)
      .limit(20)

  /** D9+D10: latest-window snapshot then top-N
    * (`reporting/reporting.py:175-181`). Scalar max via broadcast join (AQE
    * broadcasts the 1-row aggregate), not a driver collect. */
  def latestSnapshot(s: SparkSession, d: String): DataFrame = {
    val t = tw(s, d)
    t.join(broadcast(t.agg(max("window_end").as("mx"))), col("window_end") === col("mx"))
      .drop("mx")
      .orderBy(col("total_interactions").desc, col("event_type").asc)
      .limit(20)
  }

  /** D11+D12: row counts of both KPI tables (`reporting/reporting.py:71-72`);
    * the empty-relation guard is `count == 0`. */
  def rowCounts(s: SparkSession, d: String): DataFrame =
    uw(s, d).agg(count(lit(1)).as("user_rows"))
      .crossJoin(tw(s, d).agg(count(lit(1)).as("type_rows")))

  /** Anomalous KPI windows: (window, user) rows whose interaction count
    * sits more than 3σ above the table-wide mean — the "flag the spike"
    * query a monitoring dashboard layers on the KPI table. The 3σ test is
    * evaluated in EXACT integer arithmetic on raw moments
    * (x − μ > 3σ  ⇔  n·x − s > 0  ∧  (n·x − s)² > 9·(n·ss − s²), with
    * s = Σx, ss = Σx²), so the flagged set is bit-reproducible across
    * engines — no floating-point σ near the threshold. (At extreme corpus
    * sizes the squared terms would outgrow Int64 and a production variant
    * would move to DECIMAL or double z-scores; the integer form is what
    * makes the oracle exact.) Plan: one 1-row moment aggregation broadcast
    * back over the KPI table — map-side filter, no second shuffle. */
  def anomalyWindows(s: SparkSession, d: String): DataFrame = {
    val k = uw(s, d)
    val moments = k.agg(
      count(lit(1)).as("n"),
      sum(col("total_interactions")).as("s"),
      sum(col("total_interactions") * col("total_interactions")).as("ss"))
    k.crossJoin(broadcast(moments))
      .filter(col("n") * col("total_interactions") - col("s") > 0)
      .filter((col("n") * col("total_interactions") - col("s")) *
        (col("n") * col("total_interactions") - col("s")) >
        lit(9L) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("window_start"), col("window_end"), col("user_id"),
        col("total_interactions"))
  }

  private val profileCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Data-quality profile of the ingest table: per column, the null count
    * and exact distinct cardinality (plus the shared row count) — the
    * monitoring table a pipeline publishes to catch schema drift, null
    * floods, and key-cardinality surprises before they poison downstream
    * KPIs. Exact distincts keep every cell oracle-checkable; Catalyst plans
    * the multi-distinct aggregate as ONE scan + Expand (one stream per
    * distinct column). At 100 TB the same query swaps `count_distinct` for
    * `approx_count_distinct` — single pass, no Expand, ±2% — since a
    * profile monitor tolerates sketch error; the nulls/rows side is always
    * one-pass partial aggregation. The pivot to rows happens AFTER
    * aggregation (stack over a single 13-column row — free). */
  def statsProfile(s: SparkSession, d: String): DataFrame = {
    val aggs =
      count(lit(1)).as("n_rows") +:
      profileCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
    val stackArgs = profileCols
      .map(c => s"'$c', null_$c, dist_$c").mkString(", ")
    Tables.events(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${profileCols.size}, $stackArgs) AS (col_name, n_null, n_distinct)",
        "n_rows")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_stats_profile" -> statsProfile,
    "d_kpi_avg" -> kpiAvg,
    "d_kpi_extremes" -> kpiExtremes,
    "d_recent_windows" -> recentWindows,
    "d_top_users" -> topUsers,
    "d_latest_snapshot" -> latestSnapshot,
    "d_row_counts" -> rowCounts,
    "d_anomaly" -> anomalyWindows)

  val oracle: Map[String, String] = Map(
    "d_stats_profile" -> {
      val aggCols = profileCols.flatMap(c => Seq(
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_$c",
        s"CAST(count(DISTINCT $c) AS BIGINT) AS dist_$c")).mkString(", ")
      val rows = profileCols.map(c =>
        s"SELECT '$c' AS col_name, null_$c AS n_null, dist_$c AS n_distinct, n_rows FROM a")
        .mkString(" UNION ALL ")
      s"""WITH a AS (SELECT count(*) AS n_rows, $aggCols FROM events)
         |$rows""".stripMargin
    },
    "d_kpi_avg" ->
      s"""WITH uw AS ($uwSql)
         |SELECT round(CAST(sum(total_interactions) AS DOUBLE) / count(*), 2) AS avg_interactions
         |FROM uw""".stripMargin,
    "d_kpi_extremes" ->
      s"""WITH tw AS ($twSql)
         |SELECT CAST(max(total_interactions) AS BIGINT) AS max_interactions,
         |       CAST(min(total_interactions) AS BIGINT) AS min_interactions
         |FROM tw""".stripMargin,
    "d_recent_windows" ->
      s"""WITH uw AS ($uwSql)
         |SELECT * FROM uw ORDER BY window_end DESC, user_id ASC LIMIT 100""".stripMargin,
    "d_top_users" ->
      s"""WITH uw AS ($uwSql)
         |SELECT * FROM uw
         |ORDER BY total_interactions DESC, user_id ASC, window_start ASC LIMIT 20""".stripMargin,
    "d_latest_snapshot" ->
      s"""WITH tw AS ($twSql)
         |SELECT * FROM tw WHERE window_end = (SELECT max(window_end) FROM tw)
         |ORDER BY total_interactions DESC, event_type ASC LIMIT 20""".stripMargin,
    "d_row_counts" ->
      s"""WITH uw AS ($uwSql), tw AS ($twSql)
         |SELECT (SELECT count(*) FROM uw) AS user_rows,
         |       (SELECT count(*) FROM tw) AS type_rows""".stripMargin,
    "d_anomaly" ->
      s"""WITH uw AS ($uwSql),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(total_interactions) AS BIGINT) AS s,
         |             CAST(sum(total_interactions * total_interactions) AS BIGINT) AS ss
         |      FROM uw)
         |SELECT window_start, window_end, user_id,
         |       CAST(total_interactions AS BIGINT) AS total_interactions
         |FROM uw, m
         |WHERE n * total_interactions - s > 0
         |  AND (n * total_interactions - s) * (n * total_interactions - s)
         |      > 9 * (n * ss - s * s)""".stripMargin)
}
