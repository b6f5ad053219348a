package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric","value","unit","queries","sf"}`.
  *
  * Each query is forced through a `noop` sink so the FULL result is
  * computed (a bare `count()` lets Catalyst prune projections and
  * undercounts real work). One cheap warm-up query absorbs session/codegen
  * startup so per-query numbers reflect steady-state throughput.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` times (default 2) and reports
  * the MIN: this host shows heavy CPU steal under sustained load (the same
  * plan has measured 1.9 s and 65.7 s in back-to-back runs), so a single
  * pass times the hypervisor, not the plan. Min-of-reps is the standard
  * steal-resistant estimator; the total is the sum of per-query mins.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TypedImperativeAggregate (histogram buffers) groups routinely exceed
      // the 128-group default before falling back to sort-based agg; the
      // buffers are small (bins x 8B), so stay hash-based far longer
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    def exec(name: String): Double = {
      val times = (1 to reps).map(_ => execOnce(name))
      if (times.exists(_ < 0)) -1.0 else times.min
    }

    // warm-up: JVM/codegen/parquet-footer caches
    execOnce("q_grid_stats")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> exec(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout is log-scraped (sbt [info] prefixes, Spark log interleaving) —
    // also land the JSON line in a file so the harness can parse it reliably
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    spark.stop()
  }
}
