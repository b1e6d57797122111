package graft

/** Pins the driver-hash-safe output-type whitelist ([[HashedTypes]], r15
  * verdict #2): every BATCH query's output schema must draw only from types
  * proven to round-trip identically through the driver's two pandas paths
  * (Spark parquet via pyarrow vs DuckDB `.df()`). The two known incidents —
  * DATE (r14/r15, `x_mv_refresh.day`) and DuckDB HUGEINT-from-sum (r16) —
  * both passed `check_oracle.py` value-exact while hash-failing the driver,
  * so this class of miss is invisible to every other gate in the repo.
  *
  * Batch queries build LAZILY (schema available without execution), so the
  * whole surface checks in seconds. The `s_*` family executes real streams
  * on construction and cannot be schema-checked cheaply here — [[Verify]]
  * runs the same gate over the FULL surface on every dump (loud stderr),
  * and `tools/check_driver_hash.py` models the canonicalization
  * end-to-end against the actual dumps.
  */
class HashedTypeSpec extends SparkSpec {

  test("every batch query's hashed output schema stays in the proven-safe type set") {
    val names = SparkEntry.queries.keys
      .filterNot(_.startsWith("s_")) // streams execute on construction
      .filter(SparkEntry.oracleSql.contains) // only hashed surfaces
      .toSeq.sorted
    assert(names.size > 150, s"surface shrank unexpectedly: ${names.size}")
    val bad = names.flatMap { n =>
      HashedTypes.violations(SparkEntry.queries(n)(spark, sf).schema)
        .map(v => s"$n -> $v")
    }
    assert(bad.isEmpty,
      s"non-whitelisted types in hashed outputs (driver hash WILL diverge " +
        s"even on equal values — see HashedTypes):\n  ${bad.mkString("\n  ")}")
  }

  test("the whitelist itself stays date/decimal/binary/nested-free") {
    import org.apache.spark.sql.types._
    val forbidden: Seq[DataType] =
      Seq(DateType, BinaryType, DecimalType(10, 2),
        ArrayType(LongType), MapType(StringType, LongType))
    forbidden.foreach(t =>
      assert(!HashedTypes.safe.contains(t), s"$t must never be whitelisted"))
    assert(HashedTypes.violations(
      StructType(Seq(StructField("d", DateType)))) == Seq("d: date"))
    assert(HashedTypes.violations(
      StructType(Seq(StructField("s", StringType), StructField("n", LongType)))).isEmpty)
  }
}
