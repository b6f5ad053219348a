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
    // trust on this host (2-5x CPU-steal variance)
    args(0).split(',').foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[timeone] $name run$i $dt%.2f s")
        dt
      }
      println(f"[timeone] $name min ${times.min}%.2f s")
    }
    spark.stop()
  }
}
