package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for [[EventOps.sessionizeStream]]. */
private[streaming] case class SessionEvent(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long)

/** Open-session state: one row per user in the state store — ordinal,
  * bounds (epoch millis) and event count. Constant size per key.
  */
private[streaming] case class OpenSession(
    ordinal: Long, startMs: Long, endMs: Long, n: Long)

/** Closed session emitted by [[EventOps.sessionizeStream]] — same shape as
  * [[EventOps.sessionStats]].
  */
case class ClosedSession(
    user_id: Long, session_id: Long, n_events: Long,
    session_start: String, session_end: String)

/** Input row for [[EventOps.collapseBurstsStream]]. */
private[streaming] case class BurstEvent(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)

/** Open-burst state for [[EventOps.collapseBurstsStream]]: ordinal, first
  * timestamp, last timestamp (all epoch micros) and collapsed count —
  * constant size per (user, type) key.
  */
private[streaming] case class OpenBurst(
    ordinal: Long, startUs: Long, lastUs: Long, n: Long)

/** Closed burst emitted by [[EventOps.collapseBurstsStream]] — same shape
  * as [[EventOps.collapseBursts]].
  */
case class ClosedBurst(
    user_id: Long, event_type: String, burst_id: Long,
    start_us: Long, n_collapsed: Long)

/** One merged coverage island (sorted, disjoint) held in
  * [[EventOps.coveredIslandsStream]] state — bounds in epoch micros plus
  * the member-interval count.
  */
private[streaming] case class IslandState(startUs: Long, endUs: Long, n: Long)

/** Per-user pending islands for [[EventOps.coveredIslandsStream]]: the
  * merged intervals the watermark has not yet sealed. Bounded by the
  * islands inside the watermark horizon (a sealed island leaves state).
  */
private[streaming] case class PendingIslands(islands: Seq[IslandState])

/** Sealed coverage island emitted by [[EventOps.coveredIslandsStream]] —
  * same shape as the batch [[EventOps.coveredIslands]].
  */
case class ClosedIsland(
    user_id: Long, island_start_us: Long, island_end_us: Long,
    covered_us: Long, n_events: Long)

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

  /** Watermark late-data accounting — the observability report every
    * watermarked streaming job needs ("how much data would a `delay`
    * watermark drop, and how late is it?"): an event is LATE iff its
    * event time is more than `delayUs` behind the maximum event time
    * among all EARLIER-ARRIVING events (arrival order = the `arrival` column;
    * defaults to `event_id`, the ingest sequence) — exactly Structured Streaming's per-record
    * watermark rule, replayed over the batch table.
    *
    * The running "max event time seen so far" is a PREFIX MAX over
    * arrival order — inherently sequential if done naively (one
    * SinglePartition window over the corpus: the global-sort plan this
    * avoids). Instead the classic two-phase distributed prefix scan:
    * arrival ids bucket by `DIV bucketWidth`; per-bucket maxima collapse
    * through ONE map-side-combined aggregate into a bucket-count-sized
    * frame; the cross-bucket prefix max is a window over THAT frame
    * (metadata-sized, broadcast back); within-bucket running maxima run
    * partitioned by bucket — parallel. The corpus is scanned once and
    * shuffled once (by bucket).
    *
    * Output per `windowUs` tumbling window (epoch-micro start):
    * `(window_us, n_events, n_late, late_us_sum)` — all exact integers.
    */
  def lateDataReport(
      events: DataFrame,
      delayUs: Long,
      windowUs: Long = 3600000000L,
      bucketWidth: Long = 4096L,
      arrival: Column = col("event_id")): DataFrame = {
    require(delayUs >= 0 && windowUs > 0 && bucketWidth > 0)
    val e = events.select(arrival.cast("long").as("arrival"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("b", expr(s"arrival DIV $bucketWidth"))
    val byBucket = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bprefix = e.groupBy(col("b")).agg(max(col("ts_us")).as("bmax"))
      .withColumn("prev_bucket_max", max(col("bmax")).over(byBucket))
      .select(col("b"), col("prev_bucket_max"))
    val inBucket = Window.partitionBy(col("b")).orderBy(col("arrival"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scanned = e.join(broadcast(bprefix), "b")
      .withColumn("seen_max", greatest(
        col("prev_bucket_max"), max(col("ts_us")).over(inBucket)))
      .withColumn("late",
        coalesce(col("ts_us") < col("seen_max") - delayUs, lit(false)))
    scanned
      .groupBy(expr(s"ts_us DIV $windowUs * $windowUs").as("window_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("late").cast("long")).as("n_late"),
        sum(when(col("late"), col("seen_max") - delayUs - col("ts_us"))
          .otherwise(0L)).as("late_us_sum"))
  }

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

  /** Sliding (hopping) windows — `length` covering each event
    * `length/hop` times via the native window Expand (row-local
    * replication, then ONE (window, type) shuffle). Identical batch or
    * watermarked-streaming, like [[hourlyStats]]. Output window start as
    * epoch seconds (`w_start`) with count + exact cents sum.
    */
  def slidingStats(
      events: DataFrame,
      length: String = "1 hour",
      hop: String = "15 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(col("event_type"), window(col("ts"), length, hop).as("win"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_cents"))
      .select(col("event_type"),
        unix_timestamp(col("win.start")).as("w_start"),
        col("n"), col("value_cents"))
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

  /** Streaming exact dedup — the ingestion-time twin of
    * [[graft.ops.DedupOps.exactDedup]]: keep the FIRST arrival per key,
    * drop the rest. The state store is keyed by `xxhash64(key)` (8 bytes
    * per live key — the same never-carry-the-payload rule as the batch
    * operator; a state store keyed by document text would grow with the
    * corpus' byte size, not its cardinality).
    *
    * With `watermark` (requires an event-time `ts` column) state expires
    * once the key's event time falls behind the horizon —
    * `dropDuplicatesWithinWatermark` — so state is bounded by the horizon's
    * key cardinality: the correct shape for an unbounded 100 TB/day feed.
    * Without a watermark, state grows with distinct keys (use only for
    * bounded streams). Batch runs of the same plan dedup identically
    * (minus arrival-order determinism, which batch callers get from
    * `exactDedup`'s min_by instead).
    */
  def streamingDedup(
      df: DataFrame,
      key: Column,
      watermark: Option[String] = None): DataFrame = {
    val keyed = df.withColumn("__dedup_key", xxhash64(key))
    val out = watermark match {
      case Some(w) => keyed.withWatermark("ts", w)
        .dropDuplicatesWithinWatermark("__dedup_key")
      case None => keyed.dropDuplicates("__dedup_key")
    }
    out.drop("__dedup_key")
  }

  /** Streaming sessionization with CUSTOM state — the
    * `flatMapGroupsWithState` twin of [[sessionStats]]: state is one
    * [[OpenSession]] per live user (four longs — constant per key,
    * independent of session length), sessions close either by an in-data
    * gap or by event-time timeout when the watermark passes
    * `session_end + gap`, so the state store is bounded by the number of
    * users active inside the watermark horizon — the correct shape for an
    * unbounded feed.
    *
    * Emits each session EXACTLY once, on close (append mode). Late events
    * inside the watermark that extend the open session are merged (events
    * are sorted per micro-batch; the gap rule is applied in event-time
    * order). Requires `withWatermark` upstream — enforced by Spark for
    * event-time timeouts.
    *
    * Session ordinals count closed sessions per user 1,2,3... exactly like
    * the batch window formulation, PROVIDED events arrive within the
    * watermark (a session split only visible under reordering beyond the
    * horizon is a data-loss condition in any engine).
    */
  def sessionizeStream(
      events: Dataset[SessionEvent],
      gapMinutes: Int): Dataset[ClosedSession] = {
    val gapMs = gapMinutes * 60000L
    val session = events.sparkSession
    import session.implicits._

    def close(user: Long, s: OpenSession): ClosedSession = {
      def fmt(ms: Long) = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      ClosedSession(user, s.ordinal, s.n, fmt(s.startMs), fmt(s.endMs))
    }

    def onGroup(
        user: Long,
        batch: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(close(user, s))
      } else {
        val evs = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var acc = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime
          acc = acc match {
            case None => Some(OpenSession(1L, t, t, 1L))
            case Some(a) if t - a.endMs > gapMs =>
              closed += close(user, a)
              Some(OpenSession(a.ordinal + 1, t, t, 1L))
            case Some(a) =>
              Some(a.copy(startMs = math.min(a.startMs, t),
                endMs = math.max(a.endMs, t), n = a.n + 1))
          }
        }
        acc.foreach { a =>
          val closeAt = a.endMs + gapMs
          if (state.getCurrentWatermarkMs() >= closeAt) {
            // watermark already passed the would-be timeout: close now
            closed += close(user, a)
            state.remove()
          } else {
            state.update(a)
            state.setTimeoutTimestamp(closeAt)
          }
        }
        closed.iterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(onGroup)
  }

  /** Stream-stream interval join: every error paired with the same user's
    * clicks in the preceding `withinMinutes` (inclusive on both ends).
    * The SAME plan runs batch (hash equi-join on user + residual time
    * predicate) or streaming: with `watermark` set on both sides, the
    * event-time bound lets Spark expire buffered rows once the watermark
    * passes `err_ts - within` / `click_ts + within`, so join state is
    * bounded by the horizon — the canonical watermarked stream-stream
    * join. Batch results are identical (watermark is a no-op).
    */
  def clicksBeforeErrors(
      events: DataFrame,
      withinMinutes: Int,
      watermark: Option[String] = None): DataFrame = {
    val errs0 = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("err_ts"))
    val clicks0 = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val (errs, clicks) = watermark match {
      case Some(w) =>
        (errs0.withWatermark("err_ts", w), clicks0.withWatermark("click_ts", w))
      case None => (errs0, clicks0)
    }
    errs.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $withinMinutes MINUTES") &&
        col("click_ts") <= col("err_ts"))
      .select(col("error_id"), col("user_id"), col("click_id"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
  }

  /** Stream-static enrichment join: each event decorated with its user's
    * dimension row (the lookup-table pattern — user profile, geo, account
    * tier). The dimension side is `broadcast` — in batch that's the plain
    * broadcast hash join (no event shuffle); in streaming Spark re-plans
    * the stream-static join every micro-batch, so the broadcast build is
    * per-batch and the event stream itself is never shuffled or buffered
    * in state (unlike a stream-stream join, no watermark is needed).
    * Left join: events with no dimension row pass through with NULLs —
    * an enrichment must not drop facts.
    */
  def enrichEvents(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users),
        events("user_id") === users("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ev_ts"),
        col("c_name").as("user_name"),
        col("c_nationkey").as("user_nation"),
        col("c_mktsegment").as("user_segment"))

  /** Stream-stream interval join: purchases matched to the same user's
    * clicks in the `windowHours` before (and including) the purchase —
    * conversion-path assembly as a continuous query.
    *
    * In batch this is an equi-join on user with an interval residual
    * (the fact shuffles once, user-keyed). As a STREAMING query the SAME
    * plan runs with both sides watermarked: Spark derives each side's
    * state retention from the time-bound condition (clicks held
    * ~windowHours past the watermark, purchases to the bound), so join
    * state is evicted continuously — the unbounded-state hazard of
    * stream-stream joins is governed by construction, not by an external
    * TTL. streamed==batch pinned in EventOpsSpec.
    *
    * Output: (purchase_id, click_id, user_id, gap_secs).
    */
  def clickPurchaseJoin(
      purchases: DataFrame,
      clicks: DataFrame,
      windowHours: Int = 2,
      wmPurchases: Option[String] = None,
      wmClicks: Option[String] = None): DataFrame = {
    val p0 = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("p_ts"))
    val c0 = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = wmPurchases.fold(p0)(w => p0.withWatermark("p_ts", w))
    val c = wmClicks.fold(c0)(w => c0.withWatermark("c_ts", w))
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowHours HOURS") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")))
          .as("gap_secs"))
  }

  /** Per-session summary: bounds + event count. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionized(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))

  /** Time-weighted mean of `value` per user (piecewise-constant hold:
    * each event's value holds until the next event, weighted by the
    * duration it held — the correct average for irregularly-sampled
    * gauges, where a plain `avg` over-weights chatty periods). The last
    * event of a user carries no duration and drops out, per the standard
    * left-closed convention.
    *
    * Exactness: duration is integer epoch-microseconds from one `lead`
    * window; value enters as integer cents, so the accumulator is a sum
    * of exact int64 products — reduction-order-proof, engine-portable —
    * with ONE final IEEE division pair. Int64 headroom: cents are
    * O(10^4-10^7) and per-user held-durations sum to the observation
    * span, so the numerator stays below ~span_us·max_cents; at
    * multi-year spans with large gauges, pre-divide durations to
    * seconds or use DECIMAL(38).
    *
    * Scale shape: ONE user-keyed Exchange shared by the lead window and
    * the final aggregate (same partitioning key, no second shuffle).
    * Output: (user_id, n_intervals, span_us, twa_value).
    */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        cents(col("value")).as("__cents"))
      .withColumn("__dur_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("__dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("__dur_us")).as("span_us"),
        ((sum(col("__cents") * col("__dur_us")).cast("double") /
          sum(col("__dur_us")).cast("double")) / 100.0).as("twa_value"))
  }

  /** Interval-union coverage — the classic overlapping-intervals sweep:
    * each event opens a fixed-length attention window
    * `[ts, ts + windowUs)`, and the per-user COVERED time is the measure
    * of the union (overlaps counted once). The engaged-time / uptime /
    * SLA-coverage primitive: a plain `n_events · windowUs` double-counts
    * every overlap, and a gaps-and-islands session count loses the
    * partial-overlap geometry.
    *
    * Sweep without self-join: per user, ordered by start, the
    * running-max end over STRICTLY PRECEDING rows is the frontier; each
    * interval contributes `max(0, end − max(start, frontier))` — full
    * length when disjoint, the uncovered suffix when partially
    * overlapped, 0 when swallowed. All integer microseconds; the sum per
    * user is tie-order invariant (equal starts imply equal ends, so one
    * of the tied rows contributes the full window and the rest 0,
    * whichever order the engine visits them).
    *
    * Scale shape: ONE user-keyed Exchange shared by the window sort and
    * the closing aggregate (same partitioning, no second shuffle) —
    * parallel across users, never a global sort; the interval-set union
    * at 100 TB costs one pass over the fact. Output per user:
    * `(user_id, n_intervals, covered_us, span_us, coverage_ppm)` with
    * `coverage_ppm = covered·10⁶ div span` exact integer.
    */
  def coveredTime(events: DataFrame, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("s"))
      .withColumn("__frontier", max(col("s") + windowUs).over(w))
      .select(col("user_id"), col("s"),
        when(col("__frontier").isNull, lit(windowUs))
          .otherwise(greatest(lit(0L),
            col("s") + windowUs - greatest(col("s"), col("__frontier"))))
          .as("__contrib"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("__contrib")).as("covered_us"),
        (max(col("s")) + windowUs - min(col("s"))).as("span_us"))
      .withColumn("coverage_ppm", expr("covered_us * 1000000L div span_us"))
  }

  /** The merged coverage ISLANDS behind [[coveredTime]] — one row per
    * maximal run of chain-overlapping attention windows (gaps-and-islands
    * on the interval union). Within an island the union is contiguous,
    * so `covered_us = island_end − island_start` exactly, and the
    * per-user sum of island lengths equals [[coveredTime]]'s
    * `covered_us` (pinned in CoveredTimeSpec). The islands themselves
    * are the product a session-quality or SLA report reads — WHEN the
    * user was engaged, not just how long.
    *
    * Same scale shape as [[coveredTime]]: both window passes and the
    * closing aggregate share ONE user-keyed Exchange.
    */
  def coveredIslands(events: DataFrame, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val pre = w.rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("s"))
      .withColumn("__front", max(col("s") + windowUs).over(pre))
      .withColumn("__new",
        when(col("__front").isNull || col("s") > col("__front"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__island"))
      .agg(min(col("s")).as("island_start_us"),
        (max(col("s")) + windowUs).as("island_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("island_start_us"), col("island_end_us"),
        (col("island_end_us") - col("island_start_us")).as("covered_us"),
        col("n_events"))
  }

  /** Streaming twin of [[coveredIslands]] — `flatMapGroupsWithState`
    * keyed by user, state = the SORTED DISJOINT pending islands inside
    * the watermark horizon. Each arriving event's window merges into the
    * list (possibly bridging two neighbors — the reason a sealed-looking
    * island cannot emit on data alone: a late event still above the
    * watermark may bridge into it); an island seals and emits EXACTLY
    * once when the event-time watermark passes its end, because any
    * would-be bridger must carry `ts < island_end` and the watermark
    * contract says no such event is still coming. Late events below the
    * watermark are dropped before the operator by the upstream
    * `withWatermark` — the same at-most-once-late contract as
    * [[sessionizeStream]].
    *
    * State is bounded by islands whose end exceeds the watermark —
    * under any fixed window length that is O(horizon / window) per live
    * user. streamed == batch and Σ islands == coveredTime pinned in
    * CoveredTimeSpec.
    */
  def coveredIslandsStream(
      events: Dataset[SessionEvent], windowUs: Long): Dataset[ClosedIsland] = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val session = events.sparkSession
    import session.implicits._

    def usOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def emitSealed(
        user: Long, islands: List[IslandState], wmUs: Long,
        state: GroupState[PendingIslands]): Iterator[ClosedIsland] = {
      val (ripe, pending) = islands.partition(_.endUs <= wmUs)
      if (pending.isEmpty) state.remove()
      else {
        state.update(PendingIslands(pending))
        // wake when the earliest pending island can seal (micros → ms up)
        state.setTimeoutTimestamp(
          Math.floorDiv(pending.map(_.endUs).min + 999L, 1000L))
      }
      ripe.sortBy(_.startUs).map(i =>
        ClosedIsland(user, i.startUs, i.endUs, i.endUs - i.startUs, i.n))
        .iterator
    }

    def onGroup(
        user: Long,
        batch: Iterator[SessionEvent],
        state: GroupState[PendingIslands]): Iterator[ClosedIsland] = {
      val existing = state.getOption.map(_.islands.toList).getOrElse(Nil)
      val wm = state.getCurrentWatermarkMs() * 1000L
      if (state.hasTimedOut) emitSealed(user, existing, wm, state)
      else {
        var islands = existing // sorted by startUs, pairwise disjoint
        batch.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val s = usOf(e.ts)
          val en = s + windowUs
          // neighbors that touch [s, en] merge (end == start is adjacency,
          // matching the batch rule: new island only when s > frontier)
          val (overlap, keep) =
            islands.partition(i => i.startUs <= en && i.endUs >= s)
          val merged = IslandState(
            (s :: overlap.map(_.startUs)).min,
            (en :: overlap.map(_.endUs)).max,
            overlap.map(_.n).sum + 1L)
          islands = (merged :: keep).sortBy(_.startUs)
        }
        emitSealed(user, islands, wm, state)
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingIslands, ClosedIsland](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(onGroup)
  }

  /** Burst collapse — telemetry dedup: repeated (user, event_type)
    * firings closer than `gapUs` microseconds to their predecessor are
    * one logical event (retry storms, double-clicks, at-least-once
    * delivery), so each maximal burst collapses to one row. This is the
    * event-stream analogue of exact document dedup: at 100 TB of clicks
    * it routinely removes double-digit percentages before any downstream
    * aggregate pays for the duplicates.
    *
    * Deterministic sessionization without state: the gap-to-predecessor
    * flag (`lag` window) marks burst starts, a running sum of flags
    * numbers the bursts, and one aggregate per (user, type, burst) emits
    * the burst's first timestamp and collapsed count. All arithmetic is
    * integer microseconds — bit-portable, no float time math.
    *
    * Scale shape: both window passes share ONE (user_id, event_type)
    * keyed Exchange + sort; the closing aggregate re-keys on the
    * burst-qualified key (event-sized rows, map-side combined). Compare
    * [[sessionize]], which uses the same flag-and-sum shape for
    * inactivity sessions over all of a user's events.
    *
    * Output: (user_id, event_type, burst_id, start_us, n_collapsed).
    */
  def collapseBursts(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be > 0, got $gapUs")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("__prev_us", unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("__new_burst",
        when(col("__prev_us").isNull ||
          unix_micros(col("ts")) - col("__prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("burst_id",
        sum(col("__new_burst")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("event_type"), col("burst_id"))
      .agg(
        unix_micros(min(col("ts"))).as("start_us"),
        count(lit(1)).as("n_collapsed"))
  }

  /** Streaming twin of [[collapseBursts]] — `flatMapGroupsWithState`
    * keyed by (user, type), one [[OpenBurst]] (four longs) per live key:
    * a burst closes either when a later event's gap exceeds `gapUs`
    * in-data, or by event-time timeout once the watermark passes
    * `last_ts + gap` — so state is bounded by keys active inside the
    * watermark horizon, the correct shape for an unbounded telemetry
    * feed. Each burst is emitted EXACTLY once (append mode).
    *
    * Burst ordinals count 1,2,3... per key exactly like the batch window
    * formulation, provided events arrive within the watermark (the
    * [[sessionizeStream]] contract). streamed==batch and
    * restart-exactly-once are pinned in EventOpsSpec.
    */
  def collapseBurstsStream(
      events: Dataset[BurstEvent],
      gapUs: Long): Dataset[ClosedBurst] = {
    require(gapUs > 0, s"gapUs must be > 0, got $gapUs")
    val session = events.sparkSession
    import session.implicits._
    def usOf(t: java.sql.Timestamp): Long = t.getTime * 1000L
    def close(key: (Long, String), b: OpenBurst): ClosedBurst =
      ClosedBurst(key._1, key._2, b.ordinal, b.startUs, b.n)

    def onGroup(
        key: (Long, String),
        batch: Iterator[BurstEvent],
        state: GroupState[OpenBurst]): Iterator[ClosedBurst] = {
      if (state.hasTimedOut) {
        val b = state.get
        state.remove()
        Iterator(close(key, b))
      } else {
        val evs = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedBurst]
        var acc = state.getOption
        evs.foreach { e =>
          val t = usOf(e.ts)
          acc = acc match {
            case None => Some(OpenBurst(1L, t, t, 1L))
            case Some(b) if t - b.lastUs > gapUs =>
              closed += close(key, b)
              Some(OpenBurst(b.ordinal + 1, t, t, 1L))
            case Some(b) =>
              Some(b.copy(lastUs = math.max(b.lastUs, t), n = b.n + 1))
          }
        }
        acc.foreach { b =>
          val closeAtMs = (b.lastUs + gapUs) / 1000L
          if (state.getCurrentWatermarkMs() >= closeAtMs) {
            closed += close(key, b)
            state.remove()
          } else {
            state.update(b)
            state.setTimeoutTimestamp(closeAtMs)
          }
        }
        closed.iterator
      }
    }

    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[OpenBurst, ClosedBurst](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(onGroup)
  }

  /** Sliding context windows over per-user event sequences — the
    * training-pair extraction for next-event models (and the event-stream
    * analogue of token-window chunking in [[graft.ops.PrepOps]]): each
    * event becomes one example whose context is the types of up to
    * `ctxLen` immediately preceding events, oldest first, joined by '|'
    * ('' when the event opens its user's history).
    *
    * Scale shape: ONE (user_id)-keyed Exchange + sort; the bounded
    * ROWS-frame `collect_list` buffers at most `ctxLen` strings per row
    * (never a whole user history), so memory is O(ctxLen) per in-flight
    * row and the output is input-sized. Deterministic because the sort
    * key (ts, event_id) is unique per user.
    *
    * Output: (user_id, event_id, context, target).
    */
  /** First-order Markov transition matrix over per-user event-type
    * sequences: for every (prev_type, next_type) pair, the global count
    * of consecutive occurrences and the row-conditional probability
    * P(next | prev). The standard behavioral summary (and the smoothing
    * target for sequence models over [[sequenceWindows]] pairs).
    *
    * Counts are exact integers from one lag window + one
    * map-side-combined aggregate; the probability is ONE correctly
    * rounded IEEE division per output row (engine-portable). The
    * per-prev totals are a window over the aggregated PAIR frame
    * (|types|² rows) — a totals-side join would re-scan and re-sort the
    * whole event table a second time (observed in the physical plan),
    * which at 100 TB doubles the dominant cost for a frame that fits in
    * one page.
    *
    * Output: (prev_type, next_type, n, p).
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("row_total").cast("double")).as("p"))
  }

  def sequenceWindows(events: DataFrame, ctxLen: Int): DataFrame = {
    require(ctxLen >= 1, s"ctxLen must be >= 1, got $ctxLen")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-ctxLen, -1)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("context",
        array_join(collect_list(col("event_type")).over(w), "|"))
      .select(col("user_id"), col("event_id"), col("context"),
        col("event_type").as("target"))
  }

  /** EWMA anomaly flags over per-key ordered series (monitoring the
    * volume of an ingest feed, an event type, a source partition — the
    * drop/spike detector a 100 TB pipeline runs over its own meters).
    *
    * Input: `(key STRING, ord DATE, x LONG)` — one point per (key, ord).
    * Recurrence in 256-scaled integer fixed point (bit-portable, no
    * float accumulation): `e_0 = 256·x_0`,
    * `e_i = (3·e_{i-1} + 256·x_i) div 4` (α = 1/4), and point i ≥ 1 is
    * anomalous iff `x_i > (hiNum/hiDen)·ewma_prev` or
    * `x_i < (loNum/loDen)·ewma_prev`, both evaluated as exact integer
    * cross-products. The first point of a key is never anomalous.
    *
    * Scale shape: an EWMA is inherently sequential PER KEY, so the whole
    * series of one key must meet in one place — but series points are
    * pre-aggregated (one row per key×day), i.e. meter-sized, not
    * corpus-sized. `groupByKey(key).flatMapSortedGroups(ord)` is exactly
    * that contract: ONE hash Exchange on key + a partition-local sort,
    * then a streaming O(1)-state fold over each group's iterator (never
    * materializes a group in memory). Keys parallelize; a window with an
    * unbounded frame could not express the recurrence (the weights decay
    * geometrically), and a driver-side loop would serialize all keys.
    *
    * Returns `(key, ord, x, ewma, anomaly)`; `ewma` is the 256-scaled
    * fixed-point state, `anomaly` ∈ {0, 1}.
    */
  def ewmaAnomalies(
      series: DataFrame,
      hiNum: Long = 5, hiDen: Long = 4,
      loNum: Long = 4, loDen: Long = 5): DataFrame = {
    val ss = series.sparkSession
    import ss.implicits._
    series
      .select(col("key").cast("string"), col("ord").cast("date"),
        col("x").cast("long"))
      .as[(String, java.sql.Date, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ord")) { (key, it) =>
        var e = -1L
        it.map { case (_, ord, x) =>
          val prev = e
          val scaled = 256L * x
          e = if (prev < 0) scaled else (3L * prev + scaled) / 4L
          val flag =
            prev >= 0 &&
              (scaled * hiDen > hiNum * prev || scaled * loDen < loNum * prev)
          (key, ord, x, e, if (flag) 1 else 0)
        }
      }
      .toDF("key", "ord", "x", "ewma", "anomaly")
  }

  /** Two-sided CUSUM change-point detection over per-key ordered series
    * (Page 1954): `s_hi += (x − μ) − slack` and `s_lo += (μ − x) − slack`,
    * both clamped at 0, alarm when either exceeds `threshold`. CUSUM
    * accumulates small persistent shifts that a point threshold (or the
    * EWMA ratio test, [[ewmaAnomalies]]) misses — the level-shift
    * complement to EWMA's spike test. μ seeds from each key's FIRST
    * observation (the same deterministic seed rule as ewmaAnomalies);
    * all arithmetic is int64, so results are engine- and
    * partitioning-exact. State per key is three longs; the fold is a
    * `flatMapSortedGroups` over one keyed Exchange.
    *
    * Input columns `(key, ord, x)`; output
    * `(key, ord, x, s_hi, s_lo, alarm)`.
    */
  def cusumShifts(series: DataFrame, slack: Long, threshold: Long): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val ss = series.sparkSession
    import ss.implicits._
    series
      .select(col("key").cast("string"), col("ord").cast("date"),
        col("x").cast("long"))
      .as[(String, java.sql.Date, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ord")) { (key, it) =>
        var seeded = false
        var mu = 0L
        var sHi = 0L
        var sLo = 0L
        it.map { case (_, ord, x) =>
          if (!seeded) {
            seeded = true; mu = x
            (key, ord, x, 0L, 0L, 0)
          } else {
            sHi = math.max(0L, sHi + (x - mu) - slack)
            sLo = math.max(0L, sLo + (mu - x) - slack)
            val alarm = if (sHi > threshold || sLo > threshold) 1 else 0
            (key, ord, x, sHi, sLo, alarm)
          }
        }
      }
      .toDF("key", "ord", "x", "s_hi", "s_lo", "alarm")
  }

  /** EXACT rolling-window distinct users per day — DAU plus the trailing
    * `windowDays`-day active-user count for every observed day.
    *
    * Rolling COUNT(DISTINCT) is the classic scale trap: the naive plan
    * range-joins every day against a `windowDays`-wide slice of the fact
    * (W full re-scans' worth of join input), and a windowed
    * `collect_set(user)` materializes per-day user sets. This plan does
    * neither. Per user, a day `a` with successor active day `n` is the
    * MOST RECENT active day exactly on `[a, min(a + W - 1, n - 1)]` —
    * consecutive intervals are disjoint by construction, so exploding
    * each active day to its interval emits every (user, covered day)
    * pair EXACTLY once, at most W rows per active pair, all row-local.
    *
    * One Exchange collapses events to per-user sorted active-day arrays
    * (bounded by the calendar span, not the event count); the interval
    * explode is a higher-order function over that array (no second
    * window); one tiny day-keyed aggregate counts covering users. Days
    * nobody was active on are not reported (`dau > 0` — also what
    * filters coverage that dangles past the corpus end).
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val perUser = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("day"))).as("days"))
    val covered = perUser.select(
      explode(flatten(transform(col("days"), (d, i) => {
        val next = get(col("days"), i + lit(1))
        val cap = date_add(d, windowDays - 1)
        val end = least(cap, coalesce(date_sub(next, 1), cap))
        transform(sequence(d, end),
          cd => struct(cd.as("day"), (cd === d).cast("long").as("is_active")))
      }))).as("c"))
    covered
      .groupBy(col("c.day").as("day"))
      .agg(sum(col("c.is_active")).as("dau"), count(lit(1)).as("dau_w"))
      .filter(col("dau") > 0)
  }

  /** Seasonal-naive forecast backtest with MASE (Hyndman & Koehler '06 —
    * the scale-free accuracy metric production forecast monitors report):
    * forecast(d) = actual(d − season), scored against the one-step naive
    * baseline error. GAP-AWARE: both lags are value-range lookups
    * (`RANGE BETWEEN n PRECEDING AND n PRECEDING` on the day number),
    * never row-offset `lag()` — a missing day must yield no forecast,
    * not silently shift the season.
    *
    * Input: one row per (key, d, x) — `d` a day number, `x` the exact
    * integer daily total (fixed-point cents upstream; doubles would make
    * the error sums order-dependent). Both window frames share ONE
    * key-partitioned Exchange; the output is key-sized. MASE =
    * `(sae_seasonal · n_naive) / (n_eval · sae_naive)` — exact long
    * cross-products, one closing IEEE division; NULL when either leg has
    * no comparable days (degenerate series stay visible, not NaN).
    */
  def seasonalBacktest(daily: DataFrame, season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2 (1 is the naive baseline itself), got $season")
    val w = Window.partitionBy(col("key")).orderBy(col("d"))
    def at(n: Int) = max(col("x")).over(w.rangeBetween(-n, -n))
    val scored = daily
      .select(col("key"), col("d").cast("long").as("d"),
        col("x").cast("long").as("x"))
      .withColumn("xs", at(season))
      .withColumn("xn", at(1))
    scored.groupBy(col("key"))
      .agg(
        count(col("xs")).as("n_eval"),
        sum(abs(col("x") - col("xs"))).as("sae_seasonal"),
        count(col("xn")).as("n_naive"),
        sum(abs(col("x") - col("xn"))).as("sae_naive"))
      .withColumn("mase",
        when(col("n_eval") > 0 && col("sae_naive") > 0,
          (col("sae_seasonal") * col("n_naive")).cast("double") /
            (col("n_eval") * col("sae_naive")).cast("double")))
  }
}
