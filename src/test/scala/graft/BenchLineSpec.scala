package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses `graft.Bench`'s stdout from a 2000-char tail buffer: if
  * the JSON line (plus its newline) doesn't fit, the round records
  * `"parsed": null` and the bench is lost (it happened in round 4). This
  * spec renders the line for the FULL current query set under worst-case
  * values, so adding queries past the budget fails here instead of in the
  * driver. No Spark session needed — renderLine is pure. */
class BenchLineSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.1"

  test("bench JSON line fits the driver's 2000-char tail with headroom, worst-case values") {
    // worst case: every query at a three-digit-seconds value, nothing
    // stripped, every query resampled with a two-digit spread
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, 999.99, None))
    val samples = SparkEntry.queries.keys.map(k => k -> Seq(1.0, 99.9, 99.9)).toMap
    val line = Bench.renderLine(results, sfDir, samples)
    assert(line.length + 1 <= 1950,
      s"bench line is ${line.length} chars — too close to the 2000-char tail; " +
        "shorten query keys or the format before adding more queries")
  }

  test("resampled/spread noise summary: counted, formatted, absent without samples") {
    val results = Seq(("q_a", 1.0, None), ("q_b", 2.0, None))
    val samples = Map("q_a" -> Seq(1.0, 4.0, 1.1), "q_b" -> Seq(2.0, 2.2))
    val line = Bench.renderLine(results, sfDir, samples)
    assert(line.contains(""""resampled":1"""), line)
    assert(line.contains(""""spread":4"""), line) // 4.0/1.0, zeros stripped
    assert(!Bench.renderLine(results, sfDir).contains("resampled"))
  }

  test("bench line survives a MASS failure round without overflowing the tail") {
    val msg = Some("org.apache.spark.SparkException: something long enough to be a real stack message " + "x" * 80)
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, -1.0, msg))
    val line = Bench.renderLine(results, sfDir)
    assert(line.length + 1 <= 1950, s"all-failed line is ${line.length} chars")
    assert(line.contains(""""errors_omitted":"""), "omission must be visible")
  }

  test("every declared query has a DuckDB oracle — no silent rows-only downgrades") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${q -- o}; oracles without query: ${o -- q}")
  }

  test("bench line is valid JSON shape: balanced braces, quoted keys, no newline") {
    val results = Seq(("q_ok", 1.5, None), ("q_err", -1.0, Some("boom \"quoted\"\npath\t")))
    val line = Bench.renderLine(results, sfDir)
    assert(!line.contains("\n"))
    assert(line.startsWith("""{"metric":"total","value":1.5,"unit":"sec""""))
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // the error payload must not smuggle raw quotes or control chars
    assert(line.contains(""""errors":{"""))
    val errPart = line.substring(line.indexOf(""""errors":{"""))
    assert(!errPart.contains("\"quoted\""), "quotes in messages must be sanitized")
  }
}
