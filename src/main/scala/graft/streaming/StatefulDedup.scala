package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A deduplicated event row (the §1.1 schema keyed by a producer-assigned
  * event id). */
case class KeyedEvent(user_id: String, event_id: Long, ts: java.sql.Timestamp)

/** Per-user dedup state. Stored as `Seq[Long]` — Spark's product encoder
  * handles Seq fields; a Scala `Set` field fails codegen (no zero-arg
  * accessor pattern the generated deserializer expects). */
case class SeenIds(ids: Seq[Long])

/** Streaming exactly-once-per-id dedup via `flatMapGroupsWithState` — the
  * custom-state primitive the reference never needed (its Mongo upsert
  * absorbed duplicates sink-side) but that a Kafka at-least-once ingest does:
  * drop redundant deliveries of the same `event_id` *before* they inflate
  * the windowed counts.
  *
  * State design for scale: one group per `user_id` (not per event!), holding
  * the set of event ids seen in the TTL horizon. State size is bounded by
  * (active users) × (events per user per TTL window), and the processing-time
  * timeout evicts idle users — unbounded key spaces are the classic stateful-
  * streaming OOM, so the TTL is mandatory, mirroring what a watermark does
  * for the window aggregation. Built-in `dropDuplicates` covers the simple
  * case; this variant exists for policies a built-in can't express (per-user
  * horizons, side outputs, richer state).
  */
object StatefulDedup {

  /** First occurrence of each (user_id, event_id) passes; replays drop.
    * `ttl` is a processing-time duration string like "10 minutes". */
  def dedupe(events: Dataset[KeyedEvent], ttl: String = "10 minutes"): Dataset[KeyedEvent] = {
    implicit val evtEnc = Encoders.product[KeyedEvent]
    implicit val seenEnc = Encoders.product[SeenIds]

    def fn(user: String, rows: Iterator[KeyedEvent], state: GroupState[SeenIds]): Iterator[KeyedEvent] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val seen: Set[Long] = state.getOption.map(_.ids.toSet).getOrElse(Set.empty)
        val (fresh, ids) = rows.foldLeft((Vector.empty[KeyedEvent], seen)) {
          case ((acc, ids), e) =>
            if (ids.contains(e.event_id)) (acc, ids) else (acc :+ e, ids + e.event_id)
        }
        state.update(SeenIds(ids.toSeq.sorted))
        state.setTimeoutDuration(ttl)
        fresh.iterator
      }
    }

    events
      .groupByKey(_.user_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(fn)
  }
}
