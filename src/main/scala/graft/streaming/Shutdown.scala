package graft.streaming

import org.apache.spark.sql.SparkSession

/** Graceful shutdown (SURVEY §2.2 C12): the reference traps
  * `KeyboardInterrupt` and stops every active streaming query before exiting
  * (`/root/reference/consumer/consumer.py:288-293`), so each query's last
  * micro-batch commits its checkpoint and restart resumes exactly where it
  * left off (no reprocessing beyond the replayed batch, which the upsert sink
  * absorbs idempotently — see [[UpsertSink]]).
  */
object Shutdown {

  /** Stop all active streaming queries on the session. `stop()` lands
    * whenever it lands — an in-flight micro-batch is cancelled (Spark logs
    * the task kills as ERROR; checkpoint semantics are unharmed, the batch
    * replays on restart). Appropriate for a JVM shutdown hook, where there
    * is no time to wait. */
  def stopAll(s: SparkSession): Unit =
    s.streams.active.foreach(_.stop())

  /** Quiesce-then-stop: wait (bounded) for each query to be BETWEEN
    * micro-batches — `status.isTriggerActive == false` — then stop. No
    * cancelled batch, no aborted writer tasks in the normal case; if a
    * batch outlives the bound, fall through to a plain `stop()` (liveness
    * over elegance). NOTE deliberately not `processAllAvailable()`: on a
    * continuously-producing source (rate, live Kafka) that call can block
    * forever — it drains "all available" data, and more keeps arriving.
    * The planned-shutdown path an operator wants, versus [[stopAll]]'s
    * last-resort semantics.
    *
    * Best-effort by construction: a new trigger can start between the
    * status check and `stop()` (there is no stop-while-idle primitive in
    * the public API), in which case that batch is cancelled and replays on
    * restart — harmless under the sink's idempotent upsert, just not the
    * quiet path. `quiesceMs` is one SHARED deadline across all queries, so
    * shutdown latency is bounded by the budget, not nQueries × budget; an
    * interrupt during the wait stops everything immediately (last-resort
    * semantics) and re-asserts the thread's interrupt flag. */
  def stopAllGraceful(s: SparkSession, quiesceMs: Long = 10000L): Unit = {
    val deadline = System.nanoTime() + quiesceMs * 1000000L
    try
      s.streams.active.foreach { q =>
        while (q.status.isTriggerActive && System.nanoTime() < deadline)
          Thread.sleep(50)
        q.stop()
      }
    catch {
      case _: InterruptedException =>
        s.streams.active.foreach(_.stop())
        Thread.currentThread().interrupt()
    }
  }

  /** Install a JVM shutdown hook doing the same — the Scala analogue of the
    * reference's signal handling. */
  def installHook(s: SparkSession): Unit = {
    sys.addShutdownHook(stopAll(s))
    ()
  }
}
