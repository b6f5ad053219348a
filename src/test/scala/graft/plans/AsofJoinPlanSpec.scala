package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.JoinOps

class AsofJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), "t1"),
    (1L, ts("2024-01-01 10:00:20"), "t2"),
    (2L, ts("2024-01-01 10:00:01"), "t3"),
    (3L, ts("2024-01-01 10:00:10"), "t4")
  ).toDF("acct", "trade_ts", "trade_id")

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 10:00:10"), 110L),
    (2L, ts("2024-01-01 10:00:02"), 200L), // after the only trade
    (4L, ts("2024-01-01 09:00:00"), 400L)  // key with no trades
  ).toDF("q_acct", "quote_ts", "px")

  test("native as-of: latest right at or before each left; misses are NULL") {
    val out = AsofJoinPlan.asofJoin(
      trades, quotes, Seq("acct"), Seq("q_acct"), "trade_ts", "quote_ts")
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      "t1" -> 100L, // 10:00:00 quote, not the later one
      "t2" -> 110L, // advances to the 10:00:10 quote
      "t3" -> -1L,  // only quote is AFTER the trade
      "t4" -> -1L)) // no quotes for acct 3 at all
  }

  test("native as-of: tolerance bounds the lookback") {
    val out = AsofJoinPlan.asofJoin(
      trades, quotes, Seq("acct"), Seq("q_acct"), "trade_ts", "quote_ts",
      toleranceUs = Some(6L * 1000000))
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // t1 is 5 s after its quote (within 6 s); t2 is 10 s after (out)
    assert(out("t1") == 100L && out("t2") == -1L)
  }

  test("native as-of: NULL times never match but left rows survive") {
    val l = Seq((1L, Some(ts("2024-01-01 10:00:05")), "a"),
      (1L, None, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, Some(ts("2024-01-01 10:00:00")), 7L),
      (1L, Option.empty[Timestamp], 9L)).toDF("rk", "rt", "v")
    val out = AsofJoinPlan.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("tag"), col("v")).collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(out == Map("a" -> 7L, "b" -> -1L))
  }

  test("native as-of: NULL keys group (window-partition semantics, like the composed op)") {
    val l = Seq((Option(1L), ts("2024-01-01 10:00:05"), "a"),
      (Option.empty[Long], ts("2024-01-01 10:00:05"), "b"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(1L), ts("2024-01-01 10:00:00"), 7L),
      (Option.empty[Long], ts("2024-01-01 10:00:01"), 9L))
      .toDF("rk", "rt", "v")
    val out = AsofJoinPlan.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("tag"), col("v")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(out == Map("a" -> 7L, "b" -> 9L),
      "null-key rows must match null-key history, as the window form does")
  }

  test("native as-of matches the composed JoinOps.asofJoin on random data") {
    // deterministic pseudo-random series: 40 keys, ~25 rows per side
    val l = (0L until 1000L).map { i =>
      val k = (i * 2654435761L) % 40
      (k, ts(f"2024-01-01 ${(i * 7919) % 24}%02d:${(i * 104729) % 60}%02d:${i % 60}%02d"), i)
    }.toDF("k", "t", "lid")
    val r = (0L until 1000L).map { i =>
      val k = (i * 7919L + 3) % 40
      (k, ts(f"2024-01-01 ${(i * 31) % 24}%02d:${(i * 17) % 60}%02d:${(i * 13) % 60}%02d"), i * 10)
    }.toDF("rk", "rt", "val")
      // the composed operator breaks (key, ts) ties by window order —
      // dedup to one row per (key, ts) so both operators are deterministic
      .groupBy(col("rk"), col("rt")).agg(max(col("val")).as("val"))

    val native = AsofJoinPlan.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("lid"), col("rt"), col("val")).collect()
      .map(x => x.getLong(0) -> (Option(x.get(1)).map(_.toString),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toMap

    val composed = JoinOps.asofJoin(
      l, r.select(col("rk").as("k"), col("rt"), col("val")),
      keys = Seq("k"), tsLeft = "t", tsRight = "rt",
      payloadCols = Seq("val"))
      .select(col("lid"), col("rt"), col("val")).collect()
      .map(x => x.getLong(0) -> (Option(x.get(1)).map(_.toString),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toMap

    assert(native == composed)
  }

  test("native as-of plans: AsofJoinExec + the two keyed shuffles, nothing else") {
    val df = AsofJoinPlan.asofJoin(
      trades, quotes, Seq("acct"), Seq("q_acct"), "trade_ts", "quote_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"must not fall back to the composed shape:\n$plan")
    val shuffles = "(?<!Broadcast)(?<!Reused)Exchange".r
      .findAllMatchIn(plan.split("== Initial Plan ==").head).size
    assert(shuffles == 2, s"one keyed Exchange per side:\n$plan")
  }

  test("native as-of rejects floating-point keys (-0.0/NaN partitioning trap)") {
    import spark.implicits._
    val l = Seq((0.0d, 1L)).toDF("k", "t")
    val r = Seq((-0.0d, 0L, 7L)).toDF("rk", "rt", "v")
    val ex = intercept[IllegalArgumentException] {
      AsofJoinPlan.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(ex.getMessage.contains("floating-point keys"), ex.getMessage)
  }
}
