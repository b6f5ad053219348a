package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The shuffle-once-at-write-time contract of [[LakeOps.writeBucketed]]:
  * two tables bucketed on the join key with the same bucket count must
  * JOIN WITHOUT ANY EXCHANGE — the scan itself reports the required
  * HashPartitioning. Asserted against real parquet bucketed tables with
  * broadcast disabled, so the only shuffle-free explanation IS bucketing.
  */
class BucketJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("equal-bucket join plans with ZERO Exchange and matches the plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    LakeOps.writeBucketed(li, "bktspec_lineitem", Seq("l_orderkey"), 4)
    LakeOps.writeBucketed(ord, "bktspec_orders", Seq("o_orderkey"), 4)

    withNoBroadcast {
      val joined = spark.table("bktspec_lineitem")
        .join(spark.table("bktspec_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan must report bucket pruning metadata:\n$plan")

      // lossless: same multiset of joined rows as the raw-parquet join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .collect()
      def key(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(key(rows) == key(expected))
    }
  }

  test("an equality filter on the bucket key prunes to ONE bucket at the scan") {
    // data skipping without any index: hash(key) pins the bucket, so the
    // scan reads 1/nBuckets of the files — the same lever partition
    // pruning gives, but on a high-cardinality key
    LakeOps.writeBucketedIfAbsent(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity")),
      "bktspec_lineitem", Seq("l_orderkey"), 4)
    // DisableUnnecessaryBucketedScan only weighs DISTRIBUTION needs — a
    // scan-only query gets its bucketed layout planned away, losing the
    // pruning. Pin with auto-bucketed-scan off (what a deployment
    // reading point-lookups off bucketed tables would set).
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val q = spark.table("bktspec_lineitem")
        .filter(col("l_orderkey") === 7L)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"bucket pruning must reach the scan:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    LakeOps.writeBucketed(ord, "bktspec_orders2", Seq("o_orderkey"), 3)
    withNoBroadcast {
      val joined = spark.table("bktspec_lineitem")
        .join(spark.table("bktspec_orders2"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      val raw = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == raw, "mismatched buckets must still join correctly")
    }
  }
}
