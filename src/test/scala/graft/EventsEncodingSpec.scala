package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.queries.RefQueries

/** The events `ts` normalization contract (FIXTURES.md §5): the driver has
  * shipped the column as int64 nanos, TIMESTAMP_NTZ, and plain TIMESTAMP
  * across testdata regenerations. `RefQueries.events` must map ALL of them
  * to the same TimestampType instants, so every event query runs — and
  * returns identical rows — under every encoding. Round 3 shipped without
  * this: `q_session_window` threw `DATATYPE_MISMATCH` the day the parquet
  * flipped to NTZ.
  */
class EventsEncodingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Rewrites sf0.001 with `ts` in the given encoding; other tables are
    * copied by reference (parquet re-write of events only).
    */
  private def fixture(encoding: String): String = {
    val dir = Files.createTempDirectory(s"events_$encoding").toFile
    dir.deleteOnExit()
    // copy the sibling tables the event-query catalog joins against
    for (t <- Seq("customer", "orders", "lineitem")) {
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val ev = RefQueries.events(spark, sf) // normalized: ts is TimestampType
    val recoded = encoding match {
      case "nanos" => ev.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case "ntz" => ev.withColumn("ts", col("ts").cast(TimestampNTZType))
      case "tz" => ev
    }
    recoded.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.getAbsolutePath
  }

  private val eventQueries = Seq(
    "q_session_window", "q_events_hourly", "q_events_sliding",
    "q_sessionize", "q_asof_join", "q_anomaly_ewma", "q_events_enriched",
    "q_clicks_before_errors", "q_funnel", "q_cohort_retention",
    "q_interval_join", "q_attribution")

  test("every events query is encoding-proof: nanos == ntz == tz") {
    val dirs = Seq("nanos", "ntz", "tz").map(e => e -> fixture(e)).toMap
    // the fixtures must actually differ at the physical-schema level,
    // or this test proves nothing
    def tsType(d: String) =
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    assert(tsType(dirs("nanos")) == LongType)
    assert(tsType(dirs("ntz")) == TimestampNTZType)
    assert(tsType(dirs("tz")) == TimestampType)

    def rows(q: String, d: String): Seq[String] = {
      val df: DataFrame = SparkEntry.queries(q)(spark, d)
      df.collect().map(_.toString).sorted.toSeq
    }
    for (q <- eventQueries) {
      val Seq(a, b, c) =
        Seq("nanos", "ntz", "tz").map(e => rows(q, dirs(e)))
      assert(a.nonEmpty, s"$q returned no rows on the fixture")
      assert(a == b, s"$q: nanos != ntz")
      assert(b == c, s"$q: ntz != tz")
    }
  }

  test("normalized ts is TimestampType under every encoding") {
    for (e <- Seq("nanos", "ntz", "tz")) {
      val d = fixture(e)
      assert(RefQueries.events(spark, d).schema("ts").dataType == TimestampType,
        s"encoding $e not normalized")
    }
  }
}
