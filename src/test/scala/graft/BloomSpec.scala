package graft

/** The Bloom-prefiltered decontamination path must be output-IDENTICAL to
  * the exact path (no false negatives; false positives die in the exact
  * join) and must actually carry the bloom predicate + scalar subquery in
  * its plan — otherwise it silently degenerates to the plain join. */
class BloomSpec extends SparkSpec {

  test("bloom decontamination ≡ exact decontamination, and the plan carries the filter") {
    val exact = ops.Dedup.decontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomDf = ops.Dedup.decontaminateBloom(spark, sf)
    val plan = bloomDf.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"plan lost the bloom prefilter:\n$plan")
    assert(plan.contains("scalar-subquery") || plan.contains("Subquery"),
      s"bloom must arrive via scalar subquery:\n$plan")
    val bloom = bloomDf
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom === exact, "bloom path diverged from exact decontamination")
  }
}
