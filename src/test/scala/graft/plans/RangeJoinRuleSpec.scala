package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must (a) leave semantics bit-identical to the naive
  * inequality join, (b) actually change the physical plan from a nested
  * loop to a hash-partitionable equi-join, and (c) stay dormant without
  * its width config.
  */
class RangeJoinRuleSpec extends AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    // clear BOTH: getOrCreate returns the thread's active session first,
    // then the default — either would silently reuse the shared test
    // session WITHOUT extensions ("only runtime SQL configurations will
    // take effect" warning) and the rule would never be injected
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // NOT the "spark.sql.extensions" config string: that is read from
      // the SparkContext conf, so over a PRE-EXISTING context (the shared
      // test one) it silently never applies. withExtensions exercises the
      // same GraftExtensions injection while working on a shared context;
      // the config string is the production route for fresh sessions.
      val s = SparkSession.builder()
        .master("local[4]")
        .appName("graft-rangejoin-test")
        .withExtensions(new graft.GraftExtensions().apply(_))
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      try f(s) finally s.conf.unset(RangeJoinBucketRule.WidthKey)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  // negative values included: floor bucketing must not truncate toward 0.
  // Long.MinValue/MaxValue sentinels: the bucket expression is evaluated
  // for EVERY point row, so under ANSI mode an overflow-unsafe floor
  // division would abort the whole query on a row that simply matches
  // nothing (regression for the `(a - pmod(a, w)) / w` underflow).
  private def data(s: SparkSession) = {
    val points = s.range(0, 2000).select(
      col("id").as("p_id"), (col("id") * 37 % 10000 - 5000).as("ts"))
      .union(s.range(0, 1).select(lit(99998L), lit(Long.MinValue)))
      .union(s.range(0, 1).select(lit(99999L), lit(Long.MaxValue)))
    val ranges = s.range(0, 60).select(
      col("id").as("r_id"),
      (col("id") * 170 - 5100).as("s"),
      // every 7th range is EMPTY (e == s) — must match nothing
      (col("id") * 170 - 5100 + (col("id") % 7) * 120).as("e"))
    (points, ranges)
  }

  test("rewrite preserves the exact result set and kills the nested loop") {
    withExtSession { s =>
      val (points, ranges) = data(s)
      def run(): (Set[(Long, Long)], String) = {
        val df = points.join(ranges, col("ts") >= col("s") && col("ts") < col("e"))
          .select(col("p_id"), col("r_id"))
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (rows, df.queryExecution.executedPlan.toString)
      }
      s.conf.unset(RangeJoinBucketRule.WidthKey)
      val (naive, naivePlan) = run()
      assert(naivePlan.contains("NestedLoop") || naivePlan.contains("Cartesian"),
        s"baseline should be the non-equi plan:\n$naivePlan")
      assert(naive.nonEmpty)

      s.conf.set(RangeJoinBucketRule.WidthKey, "256")
      val (bucketed, plan) = run()
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"rule must remove the nested loop:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"), s"bucket equi-join expected:\n$plan")
      assert(bucketed == naive)
    }
  }

  test("inclusive BETWEEN form and SQL text are rewritten too") {
    withExtSession { s =>
      val (points, ranges) = data(s)
      points.createOrReplaceTempView("pts")
      ranges.createOrReplaceTempView("rngs")
      val q = "SELECT p_id, r_id FROM pts JOIN rngs ON ts BETWEEN s AND e"
      s.conf.unset(RangeJoinBucketRule.WidthKey)
      val naive = s.sql(q).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      s.conf.set(RangeJoinBucketRule.WidthKey, "100")
      val df = s.sql(q)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"BETWEEN must rewrite:\n$plan")
      assert(got == naive)
    }
  }

  test("timestamp points bucket by exact micros — sub-second matches survive") {
    withExtSession { s =>
      // sub-second offsets: a seconds-truncating Cast would misplace the
      // bucket of points whose match hinges on the fractional part
      val points = s.range(0, 3000).select(
        col("id").as("p_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 777777L).as("ts"))
      val ranges = s.range(0, 40).select(
        col("id").as("r_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 60123456L).as("s"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 60123456L
          + (col("id") % 5) * 20500001L).as("e"))
      def run(): (Set[(Long, Long)], String) = {
        val df = points.join(ranges, col("ts") >= col("s") && col("ts") < col("e"))
          .select(col("p_id"), col("r_id"))
        (df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
          df.queryExecution.executedPlan.toString)
      }
      s.conf.unset(RangeJoinBucketRule.WidthKey)
      val (naive, _) = run()
      assert(naive.nonEmpty)
      // width = 37s in micros: deliberately non-round vs the range spans
      s.conf.set(RangeJoinBucketRule.WidthKey, "37000000")
      val (bucketed, plan) = run()
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"timestamp range join must rewrite:\n$plan")
      assert(bucketed == naive)
    }
  }

  test("joins with an existing cross-side equi key are left alone") {
    withExtSession { s =>
      val (points, ranges) = data(s)
      val keyedP = points.withColumn("k", col("p_id") % 5)
      val keyedR = ranges.withColumn("rk", col("r_id") % 5)
      s.conf.set(RangeJoinBucketRule.WidthKey, "256")
      val df = keyedP.join(keyedR,
        col("k") === col("rk") && col("ts") >= col("s") && col("ts") < col("e"))
      // count NOW, while the conf is still set — df.count() builds a new
      // QueryExecution under the conf at call time, so counting after the
      // unset would compare naive to naive
      val withRuleCount = df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bk"), s"must not double-bucket:\n$plan")
      // sanity: still returns the right rows
      s.conf.unset(RangeJoinBucketRule.WidthKey)
      val naive = keyedP.join(keyedR,
        col("k") === col("rk") && col("ts") >= col("s") && col("ts") < col("e"))
      assert(withRuleCount == naive.count())
    }
  }
}
