package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, written so the SAME plan runs batch or
  * streaming (`spark.readStream` + `writeStream`): tumbling-window
  * aggregation with a watermark, and gap-based sessionization.
  *
  * The reference is pure batch (SURVEY §2.7); its "definition of day" ±3h
  * rule is exactly a 1-day tumbling event-time window with a 3-hour grace —
  * [[hourlyStats]]' watermark is the streaming generalization the engine
  * exposes.
  */
object EventOps {

  /** Exact fixed-point cents of a 2-decimal double (merge-order-proof sums). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Tumbling 1-hour event-time window per event_type: row count + exact
    * value sum. With `watermark` (streaming), late data beyond the grace is
    * dropped and windows finalize incrementally; in batch the watermark is a
    * no-op and results are identical.
    */
  def hourlyStats(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))).cast("double") / 100).as("value_sum"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("value_sum"))
  }

  /** Gap-based sessionization per user: a new session starts when the gap
    * to the previous event exceeds `gapMinutes`. Batch formulation with
    * lag + running sum (one shuffle on user_id); the streaming twin is
    * `groupByKey(user).flatMapGroupsWithState` with the same gap rule.
    * Output: one row per event with its session ordinal per user.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionized(events, gapMinutes)
      .select(col("event_id"), col("user_id"), col("session_id"))

  /** [[sessionize]] with the source columns retained, so downstream
    * aggregation needs no join back to the events (both window passes and
    * the session aggregation share ONE hash partitioning by user_id — a
    * single shuffle end to end).
    */
  private def sessionized(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Per-session summary: bounds + event count. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionized(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
}
