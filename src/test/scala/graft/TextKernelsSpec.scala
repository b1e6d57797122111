package graft

import org.apache.spark.sql.functions._

/** The [[graft.functions.NormText]] and [[graft.functions.ZOrder2]] kernels
  * must be byte-identical to the declarative twins their oracles assume —
  * NFC via `java.text.Normalizer` (what DuckDB's `nfc_normalize` also
  * implements), lowercase = Spark SQL `lower()`, whitespace collapse =
  * `trim(regexp_replace(s, '[ \t\r\n]+', ' '))`, and the Morton key = the
  * 2·bits-term shift-mask-or chain. */
class TextKernelsSpec extends SparkSpec {

  private def normTwin(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    nfc.toLowerCase(java.util.Locale.ROOT) // ASCII cases below; unicode case via lower() test
  }

  test("norm_text equals trim(regexp_replace(lower(s), ws, ' ')) on ASCII incl edge runs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val chars = "abYZ09 .\t\r\n"
    val samples = Seq("", " ", "\t\r\n", "  a  ", "A\tB\r\nC", "end ") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(30)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = df.select($"id", expr("norm_text(s)").as("n"))
    val want = df.select($"id",
      trim(regexp_replace(lower($"s"), "[ \t\r\n]+", " ")).as("n"))
    assert(got.orderBy("id").collect().toSeq === want.orderBy("id").collect().toSeq)
  }

  test("norm_text applies NFC composition and unicode lowercasing") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // "é" as e + COMBINING ACUTE must compose to precomposed U+00E9;
    // unicode uppercase must fold like Spark's lower()
    val decomposed = "Café  DU  MONDE"
    val precomposed = "café du monde"
    val df = Seq((1L, decomposed), (2L, "STRASSE Ä"), (3L, "中文  OK")).toDF("id", "s")
    val out = df.select($"id", expr("norm_text(s)").as("n")).orderBy("id")
      .collect().map(_.getString(1))
    assert(out(0) === precomposed)
    assert(out(1) === "strasse ä")
    assert(out(2) === "中文 ok")
  }

  test("zorder2 equals the shift-mask-or SQL twin and interleaves bit-exactly") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val bits = graft.functions.ZOrder2.bits
    def twin(a: Long, b: Long): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))).sum
    // hand-checked examples: zorder2(0b11, 0b00) = 0b0101, zorder2(0, 0b11) = 0b1010
    assert(graft.functions.TextKernels.zorder2(3L, 0L, bits) === 5L)
    assert(graft.functions.TextKernels.zorder2(0L, 3L, bits) === 10L)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(_ => (rnd.nextLong().abs % (1L << bits), rnd.nextLong().abs % (1L << bits)))
    val df = rows.toDF("a", "b")
    val got = df.select(expr("zorder2(a, b)")).collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) => twin(a, b) }
    assert(got === want)
    // out-of-range keys mask rather than collide across dimensions
    assert(graft.functions.TextKernels.zorder2(1L << bits, 0L, bits) === 0L)
  }

  test("norm_text and zorder2 stay inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.range(4).selectExpr("CAST(id AS STRING) AS s", "id AS a", "id + 1 AS b")
      .selectExpr("norm_text(s) AS n", "zorder2(a, b) AS z")
    // whole-stage codegen spans render as "*(n)" node prefixes
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"plan lost codegen:\n$plan")
  }
}
