package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime re-planning behaviors the 100 TB design leans on must actually
  * fire, not just be named in comments: dynamic partition pruning for
  * dimension-filtered scans over the partitioned lake, and AQE's skew-join
  * split for hot-key shuffles (the automatic complement to the manual
  * `JoinOps.saltedJoin` path).
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  /** Set session confs for one test, restoring previous values after. */
  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires for a dim-filtered join on the partition key") {
    val lake = Files.createTempDirectory("dpp_lake").toString
    // 8 day-partitions of fact rows
    spark.range(0, 8000)
      .select(($"id" % 8).as("day"), $"id".as("pixel"), ($"id" % 97).as("v"))
      .write.partitionBy("day").mode("overwrite").parquet(lake)
    // dimension carries the filter; only days 2 and 5 qualify. It must be
    // a REAL source with a surviving Filter node (a local Seq folds the
    // filter into the LocalTableScan and DPP sees no selective predicate)
    // and its key must match the partition column's re-inferred int type
    // (a cast on the pruning key also disqualifies the scan).
    val dimPath = Files.createTempDirectory("dpp_dim").toString
    Seq((2, "keep"), (5, "keep"), (7, "drop"))
      .toDF("d", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"tag" === "keep")

    val q = spark.read.parquet(lake)
      .join(dim, $"day" === $"d")
      .groupBy($"day").agg(count(lit(1)).as("n"))
    // partition-column type is re-inferred as int on read
    val rows = q.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).toSet
    assert(rows == Set((2L, 1000L), (5L, 1000L)))

    // the fact scan's PartitionFilters must contain the runtime subquery —
    // at 100 TB this is what turns a 365-day scan into a 2-day scan when
    // the day list only exists in a dimension table
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression partition filter:\n$plan")
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // left: ~90% of rows share key 0 -> one shuffle partition dwarfs the
      // median; right: uniform small
      val left = spark.range(0, 200000)
        .select(when($"id" < 180000, 0L).otherwise($"id" % 64).as("k"),
          $"id".as("payload"))
      val right = spark.range(0, 64).select($"id".as("rk"), ($"id" * 7).as("rv"))
      val joined = left.join(right, $"k" === $"rk")
      // materialize joined's OWN plan (count() would build a new one and
      // leave this one unexecuted with isFinalPlan=false)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition:\n$plan")
    }
  }
}
