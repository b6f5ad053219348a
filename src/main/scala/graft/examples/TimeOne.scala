package graft.examples
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names share one warm JVM; min-of-3 is the number to
    // trust on this host (2-5x CPU-steal variance). Optional second arg:
    // the sf dir (default sf0.1) — the sf1.0 scaling sweep passes the
    // MakeScaledData output here.
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    args(0).split(',').foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        // match Bench's per-query isolation accounting: no run rides a
        // cached relation left by an earlier run (its own or a sibling's)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[timeone] $name run$i $dt%.2f s")
        dt
      }
      println(f"[timeone] $name min ${times.min}%.2f s")
    }
    spark.stop()
  }
}
