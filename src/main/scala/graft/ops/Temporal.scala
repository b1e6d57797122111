package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join pack over the `events` stream table — the operators Spark
  * has no single built-in for but every event-pipeline user reaches for:
  * as-of join, bounded range join, and the type-pivot rollup. The reference
  * has none of these (SURVEY §2.6); they extend the engine the same way the
  * dedup/similarity packs do.
  *
  * Both temporal operators are expressed as ONE window pass over the
  * union of the two event roles, not as a join: the classic scalable as-of
  * formulation (one shuffle+sort keyed by the entity, state bounded per
  * partition by the window frame) — a time-condition θ-join would either
  * explode (equi-join on user then filter k² candidate rows) or fall to a
  * nested-loop at scale.
  *
  * All event-time comparisons happen at MICROSECOND integer precision
  * (`unix_micros` / DuckDB `epoch_us`): [[graft.Tables]] normalizes every
  * physical timestamp layout the driver has generated to µs TimestampType,
  * so both engines compare identical integer instants and no sub-µs tie
  * can order two events differently.
  */
object Temporal {

  /** X1: as-of join — each purchase matched to the same user's latest click
    * at-or-before the purchase time (inclusive, like DuckDB `ASOF JOIN ON
    * p.ts >= c.ts`). Emits the matched click's timestamp and the gap in µs;
    * the click's id is deliberately NOT emitted — when several clicks share
    * the matched timestamp, which row "wins" is engine-dependent, while the
    * timestamp itself is unique-per-match and deterministic.
    *
    * Plan: union-tag the two roles, one window per user ordered by
    * (ts, role) with clicks sorting before purchases at equal ts (that IS
    * the inclusivity), carry the last click time forward, keep purchase
    * rows. One exchange on user_id; no join. */
  def asofJoin(s: SparkSession, d: String): DataFrame =
    asofJoinEvents(Tables.events(s, d))

  /** [[asofJoin]] over any frame with (event_id, user_id, ts, event_type). */
  def asofJoinEvents(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("click_ts_us",
        last(when(col("is_p") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("click_ts_us"),
        (col("ts_us") - col("click_ts_us")).as("gap_us"))
  }

  /** X2: bounded range join — for each purchase, how many clicks the same
    * user made in the preceding 5 minutes (inclusive of the purchase
    * instant). Expressed as a RANGE window frame over the µs event time, so
    * the "join" costs one sort per user instead of a candidate-pair
    * expansion; frame state is bounded by the 5-minute span regardless of
    * history length. Equal-timestamp clicks are frame peers and count in
    * both engines (SQL RANGE CURRENT ROW includes peers). */
  def clicksBeforePurchase(s: SparkSession, d: String): DataFrame =
    clicksBeforePurchaseEvents(Tables.events(s, d))

  /** [[clicksBeforePurchase]] over any frame with the events schema. */
  def clicksBeforePurchaseEvents(events: DataFrame): DataFrame = {
    val spanUs = 5L * 60 * 1000000
    val ev = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-spanUs, 0)
    ev.withColumn("n_recent_clicks",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("n_recent_clicks"))
  }

  /** X4: SCD2 run collapse — fold each user's event stream into
    * slowly-changing-dimension type-2 validity ranges: one row per maximal
    * run of consecutive equal `event_type`, carrying `[valid_from_us,
    * valid_to_us)` where `valid_to_us` is the next run's start (NULL for
    * the user's current/open run) — the state-history table a warehouse
    * derives from an event stream for point-in-time joins. Classic
    * gaps-and-islands: a lag-based change flag, a running sum numbering the
    * runs, then one aggregate per run and a lead for the closing edge.
    *
    * Plan: every window and the aggregate are keyed by `user_id`, so the
    * whole operator is ONE exchange — Catalyst reuses the partitioning
    * across the two window passes and the grouped agg; per-partition state
    * is a single row of carry. Run numbering is deterministic because the
    * sort key (ts_us, event_id) is unique. */
  def scd2(s: SparkSession, d: String): DataFrame =
    scd2Events(Tables.events(s, d))

  /** [[scd2]] over any frame with (event_id, user_id, ts, event_type). */
  def scd2Events(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    val runs = ev
      .withColumn("chg", when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs.groupBy(col("user_id"), col("run_id"))
      .agg(
        min(col("event_type")).as("event_type"),
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
  }

  /** X5: point-in-time (feature-store) join — every purchase event enriched
    * with the state run valid AT its instant, against the SCD2 dimension
    * derived from the same user's NON-purchase events ([[scd2Events]] over
    * the complement — the stand-in for an independently maintained
    * state-history table). This is the lookup SCD2 exists to serve, and the
    * training-data shape feature stores call point-in-time correctness: a
    * model's features must come from the run that was CURRENT at label
    * time, never a later one (label leakage).
    *
    * Unlike [[asofJoin]]'s union+window form (one stream, no dimension),
    * this is a real dimension join: equi-join on `user_id` plus interval
    * containment `valid_from ≤ ts < valid_to` (NULL-open current run).
    * Per-user validity ranges are DISJOINT by construction, so each fact
    * matches at most one run — the join cannot expand. Plan: one
    * co-partitioned exchange per side on user_id (on a lake bucketed by
    * user, none), the containment predicate evaluated inside the join; a
    * fact stream 100× the dimension broadcasts the dimension instead —
    * both ends shuffle only (user, run boundary) longs, never payloads.
    * Purchases before the user's first observed state run keep a NULL
    * state (LEFT join) — the honest answer, not a fabricated row. */
  def pitState(s: SparkSession, d: String): DataFrame =
    pitStateEvents(Tables.events(s, d))

  /** [[pitState]] over any frame with (event_id, user_id, ts, event_type). */
  def pitStateEvents(events: DataFrame): DataFrame = {
    val dim = scd2Events(events.filter(col("event_type") =!= "purchase"))
      .select(col("user_id").as("d_user"), col("run_id"),
        col("event_type").as("state_type"), col("valid_from_us"), col("valid_to_us"))
    val facts = events
      .filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    facts.join(dim,
        col("user_id") === col("d_user") &&
          col("valid_from_us") <= col("ts_us") &&
          (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("state_type"), col("run_id").as("state_run"),
        col("valid_from_us").as("state_since_us"))
  }

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** X3: pivot — per-user event-type count matrix via the relational pivot
    * operator (explicit value list, so the plan is a single pass: Catalyst
    * rewrites it to one aggregate with a conditional-count per column — no
    * second scan to discover values, which at 100 TB is the difference
    * between one job and two). Missing combinations surface as 0. */
  def eventPivot(s: SparkSession, d: String): DataFrame =
    eventPivotEvents(Tables.events(s, d))

  /** [[eventPivot]] over any frame with (user_id, event_type). */
  def eventPivotEvents(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  /** Snapshot-membership moduli for [[snapshotDiff]]'s two stand-in corpus
    * versions — TUNABLEs shared with the oracle: the "old" snapshot drops
    * doc_id % 7 = 3, the "new" one drops % 11 = 4 and edits % 13 = 2. A
    * real pipeline passes two actual table versions. */
  private val oldDropMod = 7
  private val newDropMod = 11
  private val editMod = 13

  /** Snapshot diff — the audit a versioned lake publishes between two table
    * versions: every doc_id present in either snapshot classified as
    * added / removed / changed / unchanged by comparing CONTENT HASHES
    * across one FULL OUTER join on the stable key. Hash-compare is the
    * point at scale: the join moves (doc_id, md5) pairs, never the text,
    * so diffing two 100 TB snapshots shuffles gigabytes, not terabytes —
    * and on a lake where both versions share partitioning/bucketing by the
    * key, the join is co-located with no shuffle at all. Stand-in
    * versions are deterministic doc_id slices with an injected edit
    * ([[editMod]]), so every class is populated and oracle-checkable. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val old = docs.filter(col("doc_id") % oldDropMod =!= 3)
      .select(col("doc_id").as("old_id"), md5(col("text")).as("h_old"))
    val neu = docs.filter(col("doc_id") % newDropMod =!= 4)
      .select(col("doc_id").as("new_id"),
        md5(when(col("doc_id") % editMod === 2, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h_new"))
    old.join(neu, col("old_id") === col("new_id"), "full_outer")
      .select(
        coalesce(col("old_id"), col("new_id")).as("doc_id"),
        col("h_old"), col("h_new"),
        when(col("old_id").isNull, "added")
          .when(col("new_id").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Unpivot — the inverse of [[eventPivot]], and the lossless-ness proof
    * of the pair: melt the zero-filled wide per-user matrix back to long
    * `(user_id, event_type, n)` form with `stack` (Spark's generator-based
    * unpivot — one map-side fan-out of 5 rows per input row, no shuffle
    * beyond the pivot's own aggregation), then drop the zero cells the
    * pivot manufactured. The survivors are EXACTLY the original long-form
    * rollup — the oracle states that roundtrip contract directly as the
    * plain `GROUP BY user, type` count. At 100 TB the unpivot side is
    * free (map-side generator over the already-aggregated matrix); it
    * exists because loaders and BI exports constantly flip between the
    * two layouts and the flip must not invent or lose cells. */
  def eventUnpivot(s: SparkSession, d: String): DataFrame =
    // Derived from the SAME [[eventTypes]] constant as the pivot and the
    // oracle: the roundtrip contract is only fixture-proof if all three
    // agree on the explicit type list (a sixth/NULL event_type value is
    // outside the pivot's columns, so the oracle must exclude it too).
    eventPivot(s, d)
      .selectExpr("user_id",
        s"stack(${eventTypes.size}, ${
          eventTypes.map(t => s"'$t', n_$t").mkString(", ")}) AS (event_type, n)")
      .filter(col("n") > 0)

  /** Changeset slice moduli for [[cdcMerge]] — TUNABLEs shared with the
    * oracle. Deletes and updates deliberately OVERLAP (lcm keys get both a
    * 'U' and a later 'D'), exercising in-changeset precedence; inserts are
    * keyed past [[insOffset]] so they cannot collide with base ids. */
  private val delMod = 19
  private val updMod = 13
  private val insMod = 23
  private val insOffset = 1000000000L

  /** Batch CDC MERGE — the lakehouse `MERGE INTO` a pipeline runs to fold a
    * captured changeset (inserts / updates / deletes, each stamped with a
    * change sequence) into a keyed snapshot; the batch complement of the
    * streaming MOR upsert ([[graft.streaming.UpsertSink]] resolves exactly
    * this relation incrementally). Two stages: (1) collapse the changeset
    * to its LAST change per key (`max_by` over the sequence — partial
    * aggregation discards superseded versions map-side, so replayed or
    * chatty CDC feeds shrink before the exchange); (2) one full-outer join
    * on the stable key — base-only keys pass through, 'D' keys drop,
    * anything else takes the change's values. At 100 TB the join is the
    * decisive cost: a real changeset is orders of magnitude smaller than
    * the snapshot (broadcastable — but NOT forced here, because this
    * oracle-checkable stand-in derives the changeset from the corpus
    * itself and grows with it; the planner's threshold decides, the
    * [[graft.ops.Dedup.incremental]] caveat verbatim), and on a lake
    * bucketed by the merge key both sides co-locate with no shuffle at
    * all. Emits the merged snapshot with an md5 payload hash. */
  def cdcMerge(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    def leg(f: DataFrame => DataFrame, seq: Long, op: String,
        lang: Column, source: Column, text: Column) =
      f(docs).select(col("doc_id"), lit(seq).as("seq"), lit(op).as("op"),
        lang.as("c_lang"), source.as("c_source"), text.as("c_text"))
    val nullS = lit(null).cast("string")
    val changes = leg(_.filter(col("doc_id") % delMod === 5), 3L, "D", nullS, nullS, nullS)
      .unionAll(leg(_.filter(col("doc_id") % updMod === 2), 1L, "U",
        col("lang"), col("source"), concat(col("text"), lit(" v1"))))
      .unionAll(leg(_.filter(col("doc_id") % updMod === 2), 2L, "U",
        col("lang"), col("source"), concat(col("text"), lit(" v2"))))
      .unionAll(
        docs.filter(col("doc_id") % insMod === 7)
          .select((col("doc_id") + insOffset).as("doc_id"), lit(1L).as("seq"),
            lit("I").as("op"), lit("xx").as("c_lang"), lit("cdc").as("c_source"),
            concat(lit("ins "), col("doc_id")).as("c_text")))
    cdcMergeApply(docs, changes)
  }

  /** [[cdcMerge]]'s generic core: fold a `(doc_id, seq, op, c_lang,
    * c_source, c_text)` changeset into a `(doc_id, lang, source, text)`
    * snapshot (exposed for the precedence spec). */
  private[graft] def cdcMergeApply(base: DataFrame, changes: DataFrame): DataFrame = {
    val latest = changes.groupBy(col("doc_id"))
      .agg(max_by(struct(col("op"), col("c_lang"), col("c_source"), col("c_text")),
        col("seq")).as("c"))
      .select(col("doc_id"), col("c.op").as("op"), col("c.c_lang").as("c_lang"),
        col("c.c_source").as("c_source"), col("c.c_text").as("c_text"))
    base.join(latest, Seq("doc_id"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("doc_id"),
        when(col("op").isNull, col("lang")).otherwise(col("c_lang")).as("lang"),
        when(col("op").isNull, col("source")).otherwise(col("c_source")).as("source"),
        md5(when(col("op").isNull, col("text")).otherwise(col("c_text"))).as("text_h"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_cdc_merge" -> cdcMerge,
    "x_event_unpivot" -> eventUnpivot,
    "x_snapshot_diff" -> snapshotDiff,
    "x_asof_join" -> asofJoin,
    "x_range_clicks" -> clicksBeforePurchase,
    "x_event_pivot" -> eventPivot,
    "x_scd2_ranges" -> scd2,
    "x_pit_state" -> pitState)

  lazy val oracle: Map[String, String] = oracleTail ++ Map(
    // pivot → unpivot → drop manufactured zeros ≡ the original long rollup,
    // RESTRICTED to the pivot's explicit type list (same [[eventTypes]]
    // constant): a row with a NULL or unlisted event_type never enters the
    // pivot's columns, so the oracle must not count it either.
    "x_event_unpivot" ->
      s"""SELECT user_id, event_type, count(*) AS n
         |FROM events
         |WHERE event_type IN (${eventTypes.map(t => s"'$t'").mkString(", ")})
         |GROUP BY 1, 2""".stripMargin,
    "x_cdc_merge" ->
      s"""WITH ch AS (
         |  SELECT doc_id, 3 AS seq, 'D' AS op,
         |         NULL AS c_lang, NULL AS c_source, NULL AS c_text
         |  FROM documents WHERE doc_id % $delMod = 5
         |  UNION ALL
         |  SELECT doc_id, 1, 'U', lang, source, text || ' v1'
         |  FROM documents WHERE doc_id % $updMod = 2
         |  UNION ALL
         |  SELECT doc_id, 2, 'U', lang, source, text || ' v2'
         |  FROM documents WHERE doc_id % $updMod = 2
         |  UNION ALL
         |  SELECT doc_id + $insOffset, 1, 'I', 'xx', 'cdc', 'ins ' || doc_id
         |  FROM documents WHERE doc_id % $insMod = 7),
         |latest AS (
         |  SELECT doc_id, op, c_lang, c_source, c_text FROM (
         |    SELECT ch.*, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
         |    FROM ch) WHERE rn = 1)
         |SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
         |       CASE WHEN l.op IS NULL THEN b.lang ELSE l.c_lang END AS lang,
         |       CASE WHEN l.op IS NULL THEN b.source ELSE l.c_source END AS source,
         |       md5(CASE WHEN l.op IS NULL THEN b.text ELSE l.c_text END) AS text_h
         |FROM documents b FULL JOIN latest l ON b.doc_id = l.doc_id
         |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin,
    "x_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, md5(text) AS h_old FROM documents
         |           WHERE doc_id % $oldDropMod <> 3),
         |n AS (SELECT doc_id,
         |        md5(CASE WHEN doc_id % $editMod = 2 THEN text || ' v2'
         |                 ELSE text END) AS h_new
         |      FROM documents WHERE doc_id % $newDropMod <> 4)
         |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, h_old, h_new,
         |       CASE WHEN o.doc_id IS NULL THEN 'added'
         |            WHEN n.doc_id IS NULL THEN 'removed'
         |            WHEN h_old <> h_new THEN 'changed'
         |            ELSE 'unchanged' END AS status
         |FROM o FULL JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the window formulation —
    // two genuinely different algorithms agreeing on the same contract.
    "x_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
        |      WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_us, c.ts_us AS click_ts_us,
        |       p.ts_us - c.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us""".stripMargin,
    "x_range_clicks" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |framed AS (
        |  SELECT event_id, user_id, event_type, ts_us,
        |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY ts_us
        |           RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS n_recent_clicks
        |  FROM ev)
        |SELECT event_id, user_id, ts_us, CAST(n_recent_clicks AS BIGINT) AS n_recent_clicks
        |FROM framed WHERE event_type = 'purchase'""".stripMargin,
    // Columns derived from the same [[eventTypes]] constant as the Spark
    // pivot's explicit value list.
    "x_event_pivot" ->
      s"""SELECT user_id,
         |${eventTypes.map(t =>
               s"  CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
             .mkString(",\n")}
         |FROM events GROUP BY 1""".stripMargin,
    // The [[scd2Events]] CTE chain restricted to non-purchase events (the
    // dimension), left-joined under interval containment — disjoint per-user
    // ranges make the match unique, so no dedup appears on either side.
    "x_pit_state" -> pitSql(factEventIdNotNull = false))

  /** Shared oracle builder for the batch PIT join (`x_pit_state`) and its
    * stream-static twin (`s_pit_stream` in
    * [[graft.streaming.Scd2Stream]]): same dimension CTEs, same containment
    * join; the streamed form additionally requires a non-null `event_id`
    * (its upsert key), so the fact filter is the one parameter. */
  private[graft] def pitSql(factEventIdNotNull: Boolean): String = {
    val idFilter = if (factEventIdNotNull) " AND event_id IS NOT NULL" else ""
    s"""WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
        |    AND event_type <> 'purchase'),
        |c AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT user_id, ts_us, event_type,
        |         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |  FROM c),
        |a AS (
        |  SELECT user_id, run_id, min(event_type) AS event_type,
        |         CAST(min(ts_us) AS BIGINT) AS valid_from_us
        |  FROM r GROUP BY 1, 2),
        |dim AS (
        |  SELECT user_id, run_id, event_type, valid_from_us,
        |         lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id)
        |           AS valid_to_us
        |  FROM a),
        |f AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL$idFilter)
        |SELECT f.event_id, f.user_id, f.ts_us,
        |       d.event_type AS state_type, d.run_id AS state_run,
        |       d.valid_from_us AS state_since_us
        |FROM f LEFT JOIN dim d ON f.user_id = d.user_id
        |  AND d.valid_from_us <= f.ts_us
        |  AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)""".stripMargin
  }

  private val oracleTail: Map[String, String] = Map(
    "x_scd2_ranges" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |c AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT user_id, ts_us, event_type,
        |         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |  FROM c),
        |a AS (
        |  SELECT user_id, run_id, min(event_type) AS event_type,
        |         CAST(min(ts_us) AS BIGINT) AS valid_from_us,
        |         count(*) AS n_events
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, run_id, event_type, valid_from_us, n_events,
        |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id)
        |         AS valid_to_us
        |FROM a""".stripMargin)
}
