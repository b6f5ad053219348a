package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 10k rows of one hot key + a uniform tail
    val skewed = ((1 to 10000).map(i => (1L, i)) ++ (1 to 500).map(i => (i.toLong % 50 + 2, i)))
      .toDF("k", "v")
    val dim = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = JoinOps.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("salt reaches the shuffle key (hot key spread over buckets)") {
    val skewed = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "name")
    val df = JoinOps.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 4)
    val shuffles = df.queryExecution.executedPlan.toString
    assert(shuffles.contains("__salt"), s"salt not in plan:\n$shuffles")
    // the skewed side's rows really land in > 1 salt bucket
    val buckets = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(4)))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(buckets > 1)
  }

  test("outer joins preserve unmatched rows exactly once") {
    val skewed = Seq((1L, 10), (2L, 20), (99L, 30)).toDF("k", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val out = JoinOps.saltedJoin(skewed, dim, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2))).sorted.toSeq
    assert(out == Seq((1L, 10, "a"), (2L, 20, "b"), (99L, 30, null)))
  }
}
