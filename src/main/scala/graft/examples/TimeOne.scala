package graft.examples
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
      println(f"[timeone] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
