package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._

/** The day-definition rule as event-time window assignment: streaming and
  * batch runs of the same plan agree, and window contents match the batch
  * engine's null-out semantics.
  */
class ModisStreamSpec extends SparkSpec {
  import spark.implicits._

  private val grid = GridSpec(Region(-90, 90, -180, 180), 90.0, 90.0)
  private val cfg = JobConfig(grid = grid)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (granule_id, ts, lat, lon, v)
  private val fixture = Seq(
    ("gA", ts("2008-01-01 12:00:00"), 10.0, 45.0, 1.0), //   day 1 core
    ("gB", ts("2008-01-02 01:00:00"), 10.0, 45.0, 2.0), //   day 2 early, lon in [0,90] -> belongs to day 1
    ("gB", ts("2008-01-02 01:00:00"), 10.0, 120.0, 3.0), //  day 2 early, lon outside bands -> stays day 2
    ("gC", ts("2008-01-01 02:00:00"), 10.0, 45.0, 4.0), //   day 1 early, in band -> belongs to day 0 (Dec 31)
    ("gD", ts("2008-01-02 15:00:00"), 10.0, 45.0, 5.0) //    day 2 core
  ).toDF("granule_id", "ts", "lat", "lon", "v")

  test("window assignment reproduces the batch day-definition semantics") {
    val out = ModisStream.dailyGridStats(fixture, cfg, "v", watermark = None)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    // cell for (10, 45): floor((10+90)/90)=1, floor((45+180)/90)=2 -> 1*4+2=6
    assert(out(("2008-01-01", 6L)) == 2L) // gA + gB's reassigned pixel
    assert(out(("2007-12-31", 6L)) == 1L) // gC belongs to the prior day
    assert(out(("2008-01-02", 6L)) == 1L) // gD only
    assert(out(("2008-01-02", 7L)) == 1L) // gB's out-of-band pixel stays
  }

  test("same plan runs as a watermarked stream with identical results") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double, Double, Double)]
    val stream = mem.toDF().toDF("granule_id", "ts", "lat", "lon", "v")
    val q = ModisStream.dailyGridStats(stream, cfg, "v")
      .writeStream.format("memory").queryName("daily_grid")
      .outputMode("complete").start()
    try {
      mem.addData(
        ("gA", ts("2008-01-01 12:00:00"), 10.0, 45.0, 1.0),
        ("gC", ts("2008-01-01 02:00:00"), 10.0, 45.0, 4.0))
      q.processAllAvailable()
      mem.addData( // the +3h spill arrives later, out of order
        ("gB", ts("2008-01-02 01:00:00"), 10.0, 45.0, 2.0),
        ("gB", ts("2008-01-02 01:00:00"), 10.0, 120.0, 3.0),
        ("gD", ts("2008-01-02 15:00:00"), 10.0, 45.0, 5.0))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM daily_grid").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2).toVector).toMap
      val batch = ModisStream.dailyGridStats(fixture, cfg, "v", watermark = None)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2).toVector).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
