package graft.io

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing evidence for the 100 TB join story (SURVEY §4 / PERF.md):
  * pre-bucketing both fact tables on the join key lets Catalyst plan a
  * sort-merge join with ZERO shuffle exchanges — at scale, the difference
  * between re-shuffling 100 TB per join and reading co-located buckets.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of tables bucketed on the key plans without a shuffle") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    // the library write path (drops the table AND clears any stale
    // warehouse directory left by a previous session)
    graft.ops.LakeOps.writeBucketed(li, "li_b", Seq("l_orderkey"), 8)
    graft.ops.LakeOps.writeBucketed(o, "o_b", Seq("o_orderkey"), 8)

    // force the sort-merge path (broadcast would trivially avoid shuffles)
    // and disable AQE so executedPlan exposes the exchanges directly
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"l_quantity").as("qty"))

      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // exactly ONE exchange: the final groupBy; the sort-merge join itself
      // is shuffle-free because both sides share bucket layout on the key
      assert(shuffles.length == 1,
        s"plan:\n${joined.queryExecution.executedPlan}")
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(sum($"l_quantity").as("qty"))

    // and the result matches the unbucketed computation
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
