package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val fixture = Seq(
    (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.50),
    (2L, ts("2024-01-01 00:55:00"), 10L, "click", 2.25),
    (3L, ts("2024-01-01 01:10:00"), 10L, "view", 4.00),
    (4L, ts("2024-01-01 01:20:00"), 11L, "click", 8.00),
    (5L, ts("2024-01-01 03:00:00"), 10L, "click", 0.25)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("hourlyStats: tumbling window counts and exact sums") {
    val out = EventOps.hourlyStats(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("2024-01-01 00:00:00", "click")) == (2L, 3.75))
    assert(out(("2024-01-01 01:00:00", "view")) == (1L, 4.0))
    assert(out(("2024-01-01 01:00:00", "click")) == (1L, 8.0))
    assert(out(("2024-01-01 03:00:00", "click")) == (1L, 0.25))
  }

  test("hourlyStats runs as a real stream and matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventOps.hourlyStats(stream, watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.50),
        (2L, ts("2024-01-01 00:55:00"), 10L, "click", 2.25))
      q.processAllAvailable()
      mem.addData(
        (3L, ts("2024-01-01 01:10:00"), 10L, "view", 4.00),
        (4L, ts("2024-01-01 01:20:00"), 11L, "click", 8.00),
        (5L, ts("2024-01-01 03:00:00"), 10L, "click", 0.25))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM hourly_out").collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val batch = EventOps.hourlyStats(fixture).collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionize splits on gaps > threshold per user") {
    val out = EventOps.sessionize(fixture, gapMinutes = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // user 10: 00:05 | gap 50m | 00:55, 01:10 (15m) | gap 110m | 03:00
    assert(out(1L) == 1L)
    assert(out(2L) == 2L && out(3L) == 2L)
    assert(out(5L) == 3L)
    assert(out(4L) == 1L) // user 11's first session
  }

  test("sessionStats aggregates bounds per session") {
    val out = EventOps.sessionStats(fixture, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(out((10L, 2L)) == (2L, "2024-01-01 00:55:00", "2024-01-01 01:10:00"))
  }
}
