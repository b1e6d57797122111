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

  /** Stop all active streaming queries on the session. */
  def stopAll(s: SparkSession): Unit =
    s.streams.active.foreach(_.stop())

  /** Install a JVM shutdown hook doing the same — the Scala analogue of the
    * reference's signal handling. */
  def installHook(s: SparkSession): Unit = {
    sys.addShutdownHook(stopAll(s))
    ()
  }
}
