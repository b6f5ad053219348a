package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB storage layout: converted granule pixels live in a parquet
  * lake partitioned by acquisition day (SURVEY §4 "partition pruning...
  * automatic with acq_date/hour as partition columns"). A day-ranged query
  * must touch only matching partitions — this is what replaces the
  * reference's hour-glob file scan at scale.
  */
class PixelLakeSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned pixel lake prunes partitions for date-range queries") {
    val lake = Files.createTempDirectory("pixel_lake").toString
    spark.read.format("graft.sources.GranuleSource")
      .option("granules", "A2008001.0005,A2008002.0100,A2008003.0200")
      .option("rows", "16").option("cols", "16")
      .load()
      .write.partitionBy("day_of_year").mode("overwrite").parquet(lake)

    val q = spark.read.parquet(lake)
      .filter($"day_of_year" === 2)
      .groupBy($"granule_id").agg(count(lit(1)).as("n"))

    // only day 2's directory is read (sparkPlan = pre-AQE physical plan)
    val scans = q.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"plan: ${q.queryExecution.sparkPlan}")
    assert(scans.head.toString.contains("PartitionFilters"))
    assert(scans.head.selectedPartitions.partitionCount == 1)

    val out = q.collect()
    assert(out.length == 1 && out.head.getString(0) == "A2008002.0100"
      && out.head.getLong(1) == 256)
  }
}
