package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line on stdout (build.sbt routes forked stdout through
  * unprefixed, so the driver can parse the tail line directly).
  *
  * The timed action is a write to the `noop` datasource — a full execution of
  * every operator with rows pushed through the whole plan, unlike `count()`,
  * which lets Catalyst prune the very columns under test. Failures are
  * reported per query in an `errors` map (and as value -1) instead of
  * masquerading as fast runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            Some(e.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (err.isEmpty) sec else -1.0, err)
    }

    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s""""$k":"$m"""" }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
