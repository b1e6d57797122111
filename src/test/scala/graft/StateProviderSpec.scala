package graft

import graft.streaming.EventPipeline

/** The streamed suite's state backend is a conf
  * (`spark.graft.streamStateProvider`): default is the in-memory
  * HDFS-backed provider (right for bounded replays whose state is a few
  * MB), `"rocksdb"` flips every streamed query to Spark 4's
  * RocksDBStateStoreProvider (off-heap state — the live-deployment choice
  * once state outgrows heap, per SCALE.md). The backend must be
  * semantics-free: this suite pins (a) the conf actually reaches the
  * query's session, and (b) a stateful streamed query produces IDENTICAL
  * rows under both providers.
  */
class StateProviderSpec extends SparkSpec {

  private val conf = EventPipeline.streamStateProviderConf

  test("streamingSession child carries the RocksDB provider iff conf set") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    // getOption surfaces Spark's registered default (the HDFS-backed
    // provider) — the check is that WE didn't flip it to RocksDB.
    val default = EventPipeline.streamingSession(spark)
    assert(!default.conf.getOption(providerKey).contains(EventPipeline.rocksProvider),
      "default backend must stay Spark's default (HDFS-backed)")
    spark.conf.set(conf, "rocksdb")
    try {
      val rocks = EventPipeline.streamingSession(spark)
      assert(rocks.conf.getOption(providerKey).contains(EventPipeline.rocksProvider))
    } finally spark.conf.unset(conf)
  }

  test("streamed dedup emits identical rows under HDFS and RocksDB state stores") {
    val hdfs = EventPipeline.streamedDedup(spark, sf).collect().toSet
    spark.conf.set(conf, "rocksdb")
    val rocks =
      try EventPipeline.streamedDedup(spark, sf).collect().toSet
      finally spark.conf.unset(conf)
    assert(hdfs.nonEmpty)
    assert(rocks == hdfs)
  }

  test("chained dedup→window query is provider-invariant (two RocksDB stores)") {
    val hdfs = EventPipeline.streamedDedupWindows(spark, sf).collect().toSet
    spark.conf.set(conf, "rocksdb")
    val rocks =
      try EventPipeline.streamedDedupWindows(spark, sf).collect().toSet
      finally spark.conf.unset(conf)
    assert(hdfs.nonEmpty)
    assert(rocks == hdfs)
  }

  test("streamed window aggregation matches its batch twin under RocksDB") {
    spark.conf.set(conf, "rocksdb")
    val streamed =
      try EventPipeline.streamedWindows(spark, sf, "user_id").collect().toSet
      finally spark.conf.unset(conf)
    val batch = ops.WindowAgg.userWindows(spark, sf).collect().toSet
    assert(streamed == batch)
  }
}
