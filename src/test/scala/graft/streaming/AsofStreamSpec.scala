package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.AsofJoinPlan

class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // trades (left) and quotes (right) across two keys, with ties,
  // pre-history lefts (no match) and an out-of-order-within-watermark
  // right that a naive answer-on-arrival stream would miss
  private val leftRows = Seq(
    AsofLeftRow(1L, ts("2024-01-01 00:00:30"), 100L), // before any quote
    AsofLeftRow(1L, ts("2024-01-01 00:02:30"), 101L),
    AsofLeftRow(1L, ts("2024-01-01 00:05:00"), 102L), // exact-tie ts
    AsofLeftRow(2L, ts("2024-01-01 00:03:00"), 200L),
    AsofLeftRow(2L, ts("2024-01-01 00:09:00"), 201L))
  private val rightRows = Seq(
    AsofRightRow(1L, ts("2024-01-01 00:01:00"), 10L),
    AsofRightRow(1L, ts("2024-01-01 00:02:00"), 11L), // late-arriving below
    AsofRightRow(1L, ts("2024-01-01 00:05:00"), 12L),
    AsofRightRow(2L, ts("2024-01-01 00:02:00"), 20L))

  private def batchExpected(tolMs: Option[Long]): Map[Long, (Option[Long], Option[Long])] =
    leftRows.map { l =>
      val cand = rightRows
        .filter(r => r.key == l.key && r.ts.getTime <= l.ts.getTime &&
          tolMs.forall(t => l.ts.getTime - r.ts.getTime <= t))
        .sortBy(r => (r.ts.getTime, r.right_value)).lastOption
      l.left_id -> (cand.map(_.ts.getTime), cand.map(_.right_value))
    }.toMap

  test("streamed as-of == batch join, out-of-order within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[AsofLeftRow]
    val rMem = MemoryStream[AsofRightRow]
    val q = AsofStream.asofStream(
      lMem.toDS(), rMem.toDS(), watermark = "2 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: early rows; the 00:02 quote is withheld (arrives late,
      // within the 2-minute watermark)
      lMem.addData(leftRows(0), leftRows(1), leftRows(3))
      rMem.addData(rightRows(0), rightRows(3))
      q.processAllAvailable()
      // batch 2: late right + the later lefts push the watermark forward
      lMem.addData(leftRows(2), leftRows(4))
      rMem.addData(rightRows(1), rightRows(2))
      q.processAllAvailable()
      // batch 3: a far-future heartbeat flushes everything pending
      lMem.addData(AsofLeftRow(99L, ts("2024-01-01 01:00:00"), 999L))
      q.processAllAvailable()
      lMem.addData(AsofLeftRow(99L, ts("2024-01-01 02:00:00"), 998L))
      q.processAllAvailable()

      val streamed = spark.sql("SELECT * FROM asof_out")
        .filter(col("key") =!= 99L)
        .collect()
        .map(r => r.getLong(1) -> (
          Option(r.getString(3)).map(Timestamp.valueOf(_).getTime),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      assert(streamed == batchExpected(None), s"streamed=$streamed")

      // the same data through the NATIVE batch as-of operator agrees
      val l = leftRows.toDS().toDF("k", "t", "left_id")
      val r = rightRows.toDS().toDF("rk", "rt", "right_value")
      val native = AsofJoinPlan.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
        .collect()
        .map(x => x.getLong(2) -> (
          Option(x.getTimestamp(4)).map(_.getTime),
          if (x.isNullAt(5)) None else Some(x.getLong(5))))
        .toMap
      assert(native == batchExpected(None), s"native=$native")
    } finally q.stop()
  }

  test("tolerance drops stale matches; unmatched lefts keep NULL rights") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[AsofLeftRow]
    val rMem = MemoryStream[AsofRightRow]
    val q = AsofStream.asofStream(
      lMem.toDS(), rMem.toDS(), watermark = "1 minute",
      toleranceMs = Some(120000L))
      .writeStream.format("memory").queryName("asof_tol_out")
      .outputMode("append").start()
    try {
      lMem.addData(leftRows: _*)
      rMem.addData(rightRows: _*)
      q.processAllAvailable()
      lMem.addData(AsofLeftRow(99L, ts("2024-01-01 01:00:00"), 999L))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM asof_tol_out")
        .filter(col("key") =!= 99L)
        .collect()
        .map(r => r.getLong(1) -> (
          Option(r.getString(3)).map(Timestamp.valueOf(_).getTime),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      val expected = batchExpected(Some(120000L))
      assert(streamed == expected, s"streamed=$streamed expected=$expected")
      // tolerance really bit: left 201 (00:09) has no quote within 2 min
      assert(streamed(201L) == ((None, None)))
      // pre-history left 100 never matched
      assert(streamed(100L) == ((None, None)))
    } finally q.stop()
  }

  test("state is pruned: idle keys TTL out, horizon rights collapse to one") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[AsofLeftRow]
    val rMem = MemoryStream[AsofRightRow]
    val q = AsofStream.asofStream(
      lMem.toDS(), rMem.toDS(), watermark = "1 minute", ttlMinutes = 1)
      .writeStream.format("memory").queryName("asof_ttl_out")
      .outputMode("append").start()
    try {
      rMem.addData(
        AsofRightRow(1L, ts("2024-01-01 00:01:00"), 10L),
        AsofRightRow(1L, ts("2024-01-01 00:02:00"), 11L))
      q.processAllAvailable()
      // push the watermark far past the TTL on another key
      lMem.addData(AsofLeftRow(99L, ts("2024-01-01 00:30:00"), 999L))
      q.processAllAvailable()
      lMem.addData(AsofLeftRow(99L, ts("2024-01-01 01:00:00"), 998L))
      q.processAllAvailable()
      // key 1's state expired: a new left finds NO held right
      lMem.addData(AsofLeftRow(1L, ts("2024-01-01 01:05:00"), 150L))
      q.processAllAvailable()
      lMem.addData(AsofLeftRow(99L, ts("2024-01-01 02:00:00"), 997L))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM asof_ttl_out")
        .filter(col("key") === 1L).collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
      assert(out(150L).isEmpty,
        "TTL must have dropped key 1's held right before left 150 arrived")
    } finally q.stop()
  }
}
