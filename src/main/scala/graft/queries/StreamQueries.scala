package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Event streams and time: windows, sessions, as-of/interval joins, drift and anomaly.
  *
  * Domain slice of the gated catalog (split out of PipelineQueries
  * in round 9); assembled and exposed by [[PipelineQueries]].
  */
private[queries] object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------------ event stream
    "q_events_hourly" -> ((s, dir) =>
      EventOps.hourlyStats(RefQueries.events(s, dir))),

    // Watermark late-data accounting: per hour, how many events a
    // 10-minute watermark would drop and their total lateness — the
    // prefix-max over arrival order runs as the two-phase distributed
    // scan (bucket maxima -> metadata-sized cross-bucket prefix ->
    // per-bucket parallel windows), never a global sort. The synthetic
    // feed arrives perfectly ordered (n_late would be identically 0), so
    // the gate plants deterministic ingest disorder: arrival order
    // reverses each 16-event block (a bijection both engines compute),
    // modeling multi-partition interleave — inter-event gaps make real
    // late drops fire. The oracle is the naive single-window
    // formulation — hash equality proves the distributed scan computes
    // the same watermark at every record.
    "q_late_data" -> ((s, dir) =>
      EventOps.lateDataReport(RefQueries.events(s, dir),
        delayUs = 600000000L,
        arrival = expr("event_id DIV 16 * 16 + 15 - event_id % 16"))),

    "q_sessionize" -> ((s, dir) =>
      EventOps.sessionStats(RefQueries.events(s, dir), gapMinutes = 30)),

    // Sliding (hopping) event-time windows — 1h length, 15min hop: each
    // event lands in exactly 4 windows via the native `window()` Expand
    // (row-local replication, ONE (type, window) shuffle; the same
    // aggregate runs watermarked as a stream). The oracle replicates each
    // event to its 4 aligned window starts with a range() cross join.
    "q_events_sliding" -> ((s, dir) =>
      EventOps.slidingStats(RefQueries.events(s, dir))),

    // Native session_window twin of q_sessionize: the built-in merging
    // session aggregate (ONE user-keyed shuffle; also the streaming form
    // with watermarked state expiry) vs the lag+cumsum island build.
    // Microsecond-exact on both sides: Spark merges while the gap is
    // < 30 min and stamps end = last_ts + gap; the oracle reproduces the
    // exact >= rule and arithmetic in epoch microseconds.
    "q_session_window" -> ((s, dir) =>
      RefQueries.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"))),

    // Time-weighted mean per user (piecewise-constant hold between
    // events): integer cents x integer microsecond durations keep the
    // accumulator reduction-order-proof; one user-keyed Exchange shared
    // by the lead window and the aggregate.
    "q_time_weighted_avg" -> ((s, dir) =>
      EventOps.timeWeightedAvg(RefQueries.events(s, dir))),

    // Retry-storm / double-fire collapse: (user, type) events within 30 s
    // of their predecessor merge into one burst row. Both window passes
    // share one keyed Exchange; integer-microsecond gaps only.
    "q_collapse_bursts" -> ((s, dir) =>
      EventOps.collapseBursts(RefQueries.events(s, dir), gapUs = 30000000L)),

    // Next-event training pairs: context = up to 3 preceding event types
    // per user, oldest first. One keyed Exchange; bounded ROWS frame.
    "q_seq_windows" -> ((s, dir) =>
      EventOps.sequenceWindows(RefQueries.events(s, dir), ctxLen = 3)),

    // First-order Markov transitions: exact pair counts + one portable
    // conditional-probability division per (prev, next) row.
    "q_transition_matrix" -> ((s, dir) =>
      EventOps.transitionMatrix(RefQueries.events(s, dir))),

    // Exact 7-day rolling distinct users per day: each active day covers
    // [a, min(a+6, next-1)] (disjoint by construction), so the count is
    // a bounded row-local explode + one tiny day-keyed aggregate — never
    // a W-wide range self-join or a windowed collect_set over the fact.
    "q_rolling_dau" -> ((s, dir) =>
      EventOps.rollingActiveUsers(RefQueries.events(s, dir), windowDays = 7)),

    // Point-in-time join: latest click at-or-before each error, per user.
    // One union + one window shuffle — never a range cross product.
    "q_asof_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts").as("click_ts"), col("click_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      JoinOps.asofJoin(errors, clicks,
        keys = Seq("user_id"), tsLeft = "ts", tsRight = "click_ts",
        payloadCols = Seq("click_id"))
        .select(col("error_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
          col("click_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("clicked_at"))
    }),

    // The NATIVE as-of join (custom LogicalPlan -> SparkStrategy ->
    // SparkPlan, plans/AsofJoinPlan.scala): same query as q_asof_join,
    // same DuckDB ASOF oracle — a green row proves the whole-operator
    // extension path end to end. One O(1)-state merge pass per
    // co-partitioned sorted partition; AsofJoinPlanSpec pins the
    // 2-Exchange plan and the equivalence with the composed operator.
    "q_asof_native" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id").as("c_uid"), col("ts").as("click_ts"),
          col("click_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      graft.plans.AsofJoinPlan.asofJoin(errors, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_uid"),
        leftTime = "ts", rightTime = "click_ts")
        .select(col("error_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
          col("click_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("clicked_at"))
    }),

    // Keyed interval join (the stream-stream join's batch semantics —
    // streamed==batch is EventOpsSpec-verified): each error paired with
    // the same user's clicks in the preceding 30 minutes.
    "q_clicks_before_errors" -> ((s, dir) =>
      EventOps.clicksBeforeErrors(RefQueries.events(s, dir), withinMinutes = 30)),

    // Stream-static enrichment (lookup-table decoration; streamed==batch
    // is EventOpsSpec-verified): dimension side broadcast, fact side never
    // shuffled — the per-event cost at 100 TB is a hash probe.
    "q_events_enriched" -> ((s, dir) =>
      EventOps.enrichEvents(RefQueries.events(s, dir), t(s, dir, "customer"))),

    // First-touch funnel signup -> view -> click -> purchase: ONE shuffle
    // (conditional min per user), then a global single-row reduction —
    // sequence analytics with no self-joins (a per-stage join chain would
    // shuffle the event table once per stage).
    "q_funnel" -> ((s, dir) => {
      val firsts = RefQueries.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("t1"),
          min(when(col("event_type") === "view", col("ts"))).as("t2"),
          min(when(col("event_type") === "click", col("ts"))).as("t3"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t4"))
      val s1 = col("t1").isNotNull
      val s2 = s1 && col("t2") >= col("t1")
      val s3 = s2 && col("t3") >= col("t2")
      val s4 = s3 && col("t4") >= col("t3")
      firsts.agg(
        sum(when(s1, 1L).otherwise(0L)).as("n_signup"),
        sum(when(s2, 1L).otherwise(0L)).as("n_view"),
        sum(when(s3, 1L).otherwise(0L)).as("n_click"),
        sum(when(s4, 1L).otherwise(0L)).as("n_purchase"))
    }),

    // Cohort retention: cohort = first active day per user; one row per
    // (cohort day, day offset 0..6) with distinct active users. The
    // (user, day) distinct is the only corpus-sized shuffle; the cohort
    // table is user-sized.
    "q_cohort_retention" -> ((s, dir) => {
      val days = RefQueries.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val firsts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      days.join(firsts, "user_id")
        .select(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
        .filter(col("day_offset") <= 6)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
    }),

    // EWMA drop/spike detection over the per-type daily volume series —
    // the feed-health monitor a pipeline runs over its own meters.
    // Integer fixed point (256-scaled, α = 1/4) via a keyed ordered fold
    // (flatMapSortedGroups): the recurrence is sequential per key but
    // the series is meter-sized (one row per key×day) — keys
    // parallelize, state is O(1). The oracle unrolls the identical
    // recurrence as a recursive CTE (the q_pagerank discipline).
    "q_anomaly_ewma" -> ((s, dir) => {
      val daily = RefQueries.events(s, dir)
        .groupBy(col("event_type").as("key"), to_date(col("ts")).as("ord"))
        .agg(count(lit(1)).as("x"))
      EventOps.ewmaAnomalies(daily)
        .select(col("key").as("event_type"),
          date_format(col("ord"), "yyyy-MM-dd").as("day"),
          col("x").as("n"), col("ewma"), col("anomaly"))
    }),

    // Seasonal-naive backtest with MASE on daily per-type revenue: the
    // forecast-accuracy readout production monitors report. Gap-aware
    // value-range lags (a missing day yields no forecast, never a
    // shifted season); exact fixed-point cents so the error sums are
    // merge-order-proof; MASE one closing division.
    "q_forecast_backtest" -> ((s, dir) => {
      val daily = RefQueries.events(s, dir)
        .groupBy(col("event_type").as("key"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      EventOps.seasonalBacktest(daily, season = 7)
        .withColumnRenamed("key", "event_type")
    }),

    // CUSUM level-shift detection on daily per-type volumes — the
    // persistent-drift complement to q_anomaly_ewma's spike test: int64
    // fold per key over ONE keyed Exchange, oracle replays the identical
    // recurrence in a recursive CTE.
    "q_cusum_shift" -> ((s, dir) => {
      val daily = RefQueries.events(s, dir)
        .groupBy(col("event_type").as("key"), to_date(col("ts")).as("ord"))
        .agg(count(lit(1)).as("x"))
      EventOps.cusumShifts(daily, slack = 4L, threshold = 40L)
        .select(col("key").as("event_type"),
          date_format(col("ord"), "yyyy-MM-dd").as("day"),
          col("x").as("n"), col("s_hi"), col("s_lo"), col("alarm"))
    }),

    // Range (interval) join: clicks inside the first 5 minutes of any hour
    // that saw an error. Bucketed equi-join on the hour id + residual
    // predicate — a raw range condition is a nested-loop join in Spark.
    "q_range_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val ranges = ev.filter(col("event_type") === "error")
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("r_start"))
        .distinct()
        .withColumn("r_end", col("r_start") + 300)
      val points = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          unix_timestamp(col("ts")).as("p_ts"))
      JoinOps.rangeJoin(points, ranges, "p_ts", "r_start", "r_end",
        bucketWidth = 3600)
        .groupBy(col("r_start"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
    }),

    // The SAME query as q_range_join written as the NAIVE inequality join
    // — no JoinOps.rangeJoin, no manual bucketing — executed with
    // plans/RangeJoinBucketRule active, which rewrites it to the bucketed
    // equi-join at the logical level. Gates the optimizer rule end to end:
    // the oracle is the plain predicate join, so a green row proves the
    // rewrite is result-identical. Runs on an isolated newSession() (own
    // SQLConf, shared context) so the width conf and rule never leak into
    // other catalog queries' plans.
    "q_range_join_sql" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.experimental.extraOptimizations = Seq(graft.plans.RangeJoinBucketRule)
      s2.conf.set(graft.plans.RangeJoinBucketRule.WidthKey, "3600")
      // session-scoped confs do not all survive newSession(): re-pin the
      // ones this query needs from the parent
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s2.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      val ev = RefQueries.events(s2, dir)
      val ranges = ev.filter(col("event_type") === "error")
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("r_start"))
        .distinct()
        .withColumn("r_end", col("r_start") + 300)
      val points = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          unix_timestamp(col("ts")).as("p_ts"))
      points.join(ranges,
          col("p_ts") >= col("r_start") && col("p_ts") < col("r_end"))
        .groupBy(col("r_start"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
    }),

    // Interval-overlap join (interval × interval, vs q_range_join's
    // point-in-interval): same-customer orders whose 15-day service
    // windows collide. Both sides bucket-replicated, true-overlap
    // residual, and each pair emitted ONLY in the bucket of
    // max(starts) — exactly-once with zero dedup shuffle. The oracle is
    // the naive inequality self-join, so the gate proves the bucketed
    // plan loses and invents nothing.
    "q_interval_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_custkey").as("cust"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("s"))
      val a = o.select(col("cust"), col("o_orderkey").as("a_id"),
        col("s").as("a_start"), (col("s") + 15).as("a_end"))
      val b = o.select(col("cust"), col("o_orderkey").as("b_id"),
        col("s").as("b_start"), (col("s") + 15).as("b_end"))
      JoinOps.intervalJoin(a, b, "a_start", "a_end", "b_start", "b_end",
        bucketWidth = 15, keys = Seq("cust"))
        .filter(col("a_id") < col("b_id"))
        .select(col("cust"), col("a_id"), col("b_id"),
          (least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start"))).as("overlap_days"))
    }),

    // Last-touch attribution: each purchase credits the latest click/view
    // of the same user within the preceding 2 hours (inclusive), NULLs
    // when there is none — the marketing-analytics shape of the as-of
    // join (one user-keyed window pass, never a range cross product).
    "q_attribution" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts").as("touch_ts"),
          col("event_id").as("touch_id"), col("event_type").as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      JoinOps.asofJoin(purchases, touches,
        keys = Seq("user_id"), tsLeft = "ts", tsRight = "touch_ts",
        payloadCols = Seq("touch_id", "channel"),
        tolerance = Some("2 hours"))
        .select(col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("touch_id"), col("channel"))
    }),

    // Semi-structured: JSON property extraction + aggregation over the
    // extracted key (reference has no JSON; engine completeness).
    "q_events_json" -> ((s, dir) =>
      RefQueries.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))),

    // Point-in-time (time-travel) enrichment against an SCD2 dimension —
    // the feature-store join that prevents training-serving leakage: each
    // purchase is labeled with the browsing state the user was in AT
    // purchase time (the validity interval containing ts), never a later
    // state. Because SCD2 segments tile each user's timeline, interval
    // containment IS the as-of join on segment starts — ONE user-keyed
    // shuffle via JoinOps.asofJoin, no interval replication. Ties: a
    // state change at exactly purchase time counts (right-before-left at
    // equal ts), and coincident changes resolve to the max (ts, state)
    // struct — both pinned by the oracle's rank ordering.
    "q_pit_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val states = ev
        .filter(col("event_type").isin("view", "click", "error"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("ts").as("state_ts"),
          col("event_type").as("state"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      JoinOps.asofJoin(purchases, states, Seq("user_id"), "ts", "state_ts",
        Seq("state"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          coalesce(col("state"), lit("none")).as("state_at_purchase"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("state_ts")))
            .as("state_age_secs"))
    }),

    // Linear multi-touch attribution: every touch in the 2h window
    // before a purchase splits the purchase value evenly (1/n credit) —
    // the complement of q_attribution's last-touch rule. The interval
    // rides the user equi-join as residual; the per-purchase count is a
    // window over MATCH-sized rows (bounded by touches-per-purchase);
    // credit divides exact cents, so the doubles are engine-identical.
    "q_attribution_multi" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("ts").as("touch_ts"),
          col("event_id").as("touch_id"), col("event_type").as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val joined = purchases.join(touches,
        col("user_id") === col("t_user") &&
          col("touch_ts") <= col("ts") &&
          col("touch_ts") >= col("ts") - expr("INTERVAL 2 HOURS"))
      val w = Window.partitionBy(col("purchase_id"))
      joined
        .withColumn("n_touches", count(lit(1)).over(w))
        .select(col("purchase_id"), col("touch_id"), col("channel"),
          col("n_touches"),
          (col("cents").cast("double") / 100 / col("n_touches")).as("credit"))
    }),

    // Missing-value imputation by last-observation-carried-forward
    // (LOCF): a deterministic 30% of readings masked out, refilled from
    // the latest PRECEDING non-null — ONE user-keyed window with an
    // ignore-nulls last(), the canonical gap-fill of sensor/feature
    // pipelines. Gaps before the first observation stay NULL: no
    // look-ahead, the leakage discipline.
    "q_impute_locf" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"), col("ts"),
          when(pmod(col("event_id"), lit(10)) < 3,
            lit(null).cast("double")).otherwise(col("value")).as("masked"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ev_ts"),
          col("masked"),
          last(col("masked"), ignoreNulls = true).over(w).as("filled"),
          (col("masked").isNull).cast("int").as("was_masked"))
    }),

    // Stream-stream interval join (conversion-path assembly): purchases
    // matched to the same user's clicks within the 2 hours before the
    // purchase. Registered in batch semantics; the SAME EventOps function
    // runs watermarked as a Structured Streaming stream-stream join whose
    // per-side state retention Spark derives from the time bound
    // (streamed==batch in EventOpsSpec). Batch scale shape: ONE
    // user-keyed shuffle with the interval as join residual.
    "q_stream_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      EventOps.clickPurchaseJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"))
    }),

    // Engaged-time interval union: each event opens a 4-hour attention
    // window; covered time per user counts overlaps ONCE (a naive
    // n·window double-counts, session islands lose partial-overlap
    // geometry). Running-max-frontier sweep — one user-keyed Exchange
    // shared by the window and the aggregate, integer microseconds,
    // intdiv coverage ppm.
    "q_interval_union" -> ((s, dir) =>
      EventOps.coveredTime(
        RefQueries.events(s, dir), windowUs = 14400000000L)),

    // The islands BEHIND the union: one row per maximal run of
    // chain-overlapping attention windows — when the user was engaged,
    // not just how long. Registered in batch semantics; the SAME
    // semantics run streaming via coveredIslandsStream (watermark-sealed
    // island state, streamed==batch in CoveredTimeSpec).
    "q_covered_islands" -> ((s, dir) =>
      EventOps.coveredIslands(
        RefQueries.events(s, dir), windowUs = 14400000000L)),
  )

  val oracleSql: Map[String, String] = Map(

    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |errors AS (
        |  SELECT event_id AS error_id, user_id, ts
        |  FROM events WHERE event_type = 'error')
        |SELECT error_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        |  c.click_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS clicked_at
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.click_ts""".stripMargin,

    // Same ASOF semantics checked against the NATIVE physical operator.
    "q_asof_native" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |errors AS (
        |  SELECT event_id AS error_id, user_id, ts
        |  FROM events WHERE event_type = 'error')
        |SELECT error_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        |  c.click_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS clicked_at
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.click_ts""".stripMargin,

    "q_clicks_before_errors" ->
      """SELECT e.event_id AS error_id, e.user_id, c.event_id AS click_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND c.ts >= e.ts - INTERVAL 30 MINUTE AND c.ts <= e.ts""".stripMargin,

    "q_events_enriched" ->
      """SELECT e.event_id, e.user_id, e.event_type,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ev_ts,
        |  c.c_name AS user_name, c.c_nationkey AS user_nation,
        |  c.c_mktsegment AS user_segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    "q_transition_matrix" ->
      """WITH pr AS (
        |  SELECT user_id, event_type, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, event_type AS next_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
        |      FROM c GROUP BY prev_type)
        |SELECT c.prev_type, next_type, n,
        |  CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS p
        |FROM c JOIN t ON c.prev_type = t.prev_type""".stripMargin,

    // Independent formulation: the W-wide range join the Spark plan
    // refuses to run — correct at oracle scale, and a hash match proves
    // the disjoint-interval explode counts every (user, day) exactly once.
    "q_rolling_dau" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM active)
        |SELECT d.day AS day,
        |  CAST(count(DISTINCT CASE WHEN a.day = d.day THEN a.user_id END)
        |    AS BIGINT) AS dau,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS dau_w
        |FROM days d JOIN active a ON a.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day""".stripMargin,

    // Window list() honors the bounded ROWS frame; an empty frame yields
    // NULL -> coalesce to '' matching Spark's empty-array array_join.
    "q_seq_windows" ->
      """SELECT user_id, event_id,
        |  coalesce(array_to_string(list(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '|'), '') AS context,
        |  event_type AS target
        |FROM events""".stripMargin,

    "q_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t2,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t3,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_signup,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 >= t1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2
        |    AND t4 >= t3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM f""".stripMargin,

    "q_cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |firsts AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(day - cohort AS INTEGER) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM days JOIN firsts USING (user_id)
        |WHERE day - cohort <= 6
        |GROUP BY 1, 2""".stripMargin,

    // same 256-scaled integer recurrence, unrolled as a recursive CTE
    // keyed by the per-type day index
    // Same value-range window lags over the same exact cents grid.
    "q_forecast_backtest" ->
      """WITH d0 AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, d, x,
        |  max(x) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS xs,
        |  max(x) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS xn
        |  FROM d0)
        |SELECT event_type,
        |  CAST(count(xs) AS BIGINT) AS n_eval,
        |  CAST(sum(abs(x - xs)) AS BIGINT) AS sae_seasonal,
        |  CAST(count(xn) AS BIGINT) AS n_naive,
        |  CAST(sum(abs(x - xn)) AS BIGINT) AS sae_naive,
        |  CASE WHEN count(xs) > 0 AND sum(abs(x - xn)) > 0
        |    THEN CAST(sum(abs(x - xs)) * count(xn) AS DOUBLE)
        |       / CAST(count(xs) * sum(abs(x - xn)) AS DOUBLE) END AS mase
        |FROM s GROUP BY event_type""".stripMargin,

    "q_anomaly_ewma" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY day) AS i
        |  FROM d0),
        |r AS (
        |  SELECT event_type, day, x, i, 256 * x AS ewma, 0 AS anomaly
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.event_type, d.day, d.x, d.i,
        |    (3 * r.ewma + 256 * d.x) // 4,
        |    CASE WHEN 256 * d.x * 4 > 5 * r.ewma
        |           OR 256 * d.x * 5 < 4 * r.ewma THEN 1 ELSE 0 END
        |  FROM r JOIN d ON d.event_type = r.event_type AND d.i = r.i + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(x AS BIGINT) AS n, CAST(ewma AS BIGINT) AS ewma,
        |  CAST(anomaly AS INTEGER) AS anomaly
        |FROM r""".stripMargin,

    // Identical recurrence, mu carried through the recursion; slack=4,
    // threshold=40 mirror the registered parameters.
    "q_cusum_shift" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY day) AS i
        |  FROM d0),
        |r AS (
        |  SELECT event_type, day, x, i, x AS mu,
        |    CAST(0 AS BIGINT) AS s_hi, CAST(0 AS BIGINT) AS s_lo,
        |    0 AS alarm
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.event_type, d.day, d.x, d.i, r.mu,
        |    greatest(CAST(0 AS BIGINT), r.s_hi + (d.x - r.mu) - 4),
        |    greatest(CAST(0 AS BIGINT), r.s_lo + (r.mu - d.x) - 4),
        |    CASE WHEN greatest(CAST(0 AS BIGINT), r.s_hi + (d.x - r.mu) - 4) > 40
        |           OR greatest(CAST(0 AS BIGINT), r.s_lo + (r.mu - d.x) - 4) > 40
        |      THEN 1 ELSE 0 END
        |  FROM r JOIN d ON d.event_type = r.event_type AND d.i = r.i + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(x AS BIGINT) AS n, CAST(s_hi AS BIGINT) AS s_hi,
        |  CAST(s_lo AS BIGINT) AS s_lo, CAST(alarm AS INTEGER) AS alarm
        |FROM r""".stripMargin,

    "q_range_join" ->
      """WITH ranges AS (
        |  SELECT DISTINCT
        |    CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS r_start
        |  FROM events WHERE event_type = 'error'),
        |points AS (
        |  -- floor, not cast: epoch() is fractional and CAST rounds while
        |  -- Spark's unix_timestamp truncates
        |  SELECT event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT r_start,
        |  CAST(count(*) AS BIGINT) AS n_clicks,
        |  min(click_id) AS first_click
        |FROM points JOIN ranges
        |  ON p_ts >= r_start AND p_ts < r_start + 300
        |GROUP BY r_start""".stripMargin,

    // each event replicated to its 4 aligned hop starts — the unrolled
    // form of the native sliding-window Expand
    "q_events_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS f
        |  FROM events),
        |w AS (
        |  SELECT event_type, value, f - 900 * i.i AS w_start
        |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS i) i)
        |SELECT event_type, w_start,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM w GROUP BY 1, 2""".stripMargin,

    // the naive inequality self-join the bucketed plan must reproduce
    "q_interval_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust, o_orderkey AS id,
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS s
        |  FROM orders)
        |SELECT a.cust AS cust, a.id AS a_id, b.id AS b_id,
        |  CAST(least(a.s + 15, b.s + 15) - greatest(a.s, b.s) AS BIGINT)
        |    AS overlap_days
        |FROM o a JOIN o b ON a.cust = b.cust AND a.id < b.id
        |  AND a.s < b.s + 15 AND b.s < a.s + 15""".stripMargin,

    // window formulation of the as-of-with-tolerance: rank touches per
    // purchase by (ts DESC, payload DESC) inside the 2h window — the
    // DESC payload matches asofJoin's greatest-tuple tie resolution
    "q_attribution" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id AS touch_id, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.purchase_id, t.touch_id, t.channel,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY t.ts DESC, t.touch_id DESC, t.channel DESC) AS rn
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 2 HOUR)
        |SELECT p.purchase_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  j.touch_id, j.channel
        |FROM p LEFT JOIN j ON j.purchase_id = p.purchase_id AND j.rn = 1""".stripMargin,

    // identical semantics to q_range_join — the Spark side differs only in
    // HOW the plan gets its bucketed shape (optimizer rule vs explicit op)
    "q_range_join_sql" ->
      """WITH ranges AS (
        |  SELECT DISTINCT
        |    CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS r_start
        |  FROM events WHERE event_type = 'error'),
        |points AS (
        |  SELECT event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT r_start,
        |  CAST(count(*) AS BIGINT) AS n_clicks,
        |  min(click_id) AS first_click
        |FROM points JOIN ranges
        |  ON p_ts >= r_start AND p_ts < r_start + 300
        |GROUP BY r_start""".stripMargin,

    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Naive global-window watermark replay (the formulation the engine's
    // two-phase prefix scan must equal), over the same block-16-reversed
    // planted arrival order.
    "q_late_data" ->
      """WITH e AS (
        |  SELECT event_id // 16 * 16 + 15 - event_id % 16 AS arrival,
        |    epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT ts_us, max(ts_us) OVER (ORDER BY arrival
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
        |  FROM e),
        |l AS (
        |  SELECT ts_us,
        |    CASE WHEN seen IS NOT NULL AND ts_us < seen - 600000000
        |         THEN 1 ELSE 0 END AS late,
        |    CASE WHEN seen IS NOT NULL AND ts_us < seen - 600000000
        |         THEN seen - 600000000 - ts_us ELSE 0 END AS lateness
        |  FROM s)
        |SELECT ts_us // 3600000000 * 3600000000 AS window_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(late) AS BIGINT) AS n_late,
        |  CAST(sum(lateness) AS BIGINT) AS late_us_sum
        |FROM l GROUP BY 1""".stripMargin,

    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sess GROUP BY 1, 2""".stripMargin,

    // session_window semantics, microsecond-exact: a session extends
    // while the inter-event gap is STRICTLY under 30 min (>= gap starts
    // a new one), and the window end is last_ts + gap.
    "q_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
        |  CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // Integer cents x integer microsecond durations — both sums are exact
    // int64 reductions, then the same two-division chain as the Spark
    // side ((num/den)/100, each correctly rounded).
    "q_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(dur_us) AS BIGINT) AS span_us,
        |  CAST(sum(cents * dur_us) AS DOUBLE) / CAST(sum(dur_us) AS DOUBLE)
        |    / 100.0 AS twa_value
        |FROM e WHERE dur_us IS NOT NULL GROUP BY user_id""".stripMargin,

    // Same lag-flag-and-running-sum sessionization in integer
    // microseconds; burst_id's HUGEINT window sum casts back to BIGINT.
    "q_collapse_bursts" ->
      """WITH x AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    sum(CASE WHEN gap IS NULL OR gap > 30000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS burst_id
        |  FROM x)
        |SELECT user_id, event_type, CAST(burst_id AS BIGINT) AS burst_id,
        |  CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(count(*) AS BIGINT) AS n_collapsed
        |FROM b GROUP BY user_id, event_type, burst_id""".stripMargin,

    "q_events_json" ->
      """SELECT event_type,
        | CAST(count(k) AS BIGINT) AS n,
        | CAST(sum(k) AS BIGINT) AS k_sum,
        | CAST(min(k) AS INTEGER) AS k_min,
        | CAST(max(k) AS INTEGER) AS k_max
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,

    // Tie parity with asofJoin: right-before-left at equal ts (state_ts
    // <= ts inclusive), coincident changes resolve to the max (state_ts,
    // state) struct — hence the (state_ts DESC, state DESC) rank.
    // state_age in whole seconds: epoch_us // 1e6 == Spark's
    // unix_timestamp floor on these post-epoch instants.
    "q_pit_join" ->
      """WITH st0 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events WHERE event_type IN ('view', 'click', 'error')),
        |states AS (SELECT user_id, ts AS state_ts, event_type AS state
        |           FROM st0 WHERE prev IS NULL OR prev <> event_type),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT p.event_id, p.user_id, p.ts, s.state_ts, s.state,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY s.state_ts DESC NULLS LAST, s.state DESC) AS rn
        |  FROM p LEFT JOIN states s
        |    ON p.user_id = s.user_id AND s.state_ts <= p.ts)
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  coalesce(state, 'none') AS state_at_purchase,
        |  epoch_us(ts) // 1000000 - epoch_us(state_ts) // 1000000
        |    AS state_age_secs
        |FROM m WHERE rn = 1""".stripMargin,

    "q_attribution_multi" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id AS touch_id, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.purchase_id, t.touch_id, t.channel, p.cents,
        |    count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 2 HOUR)
        |SELECT purchase_id, touch_id, channel, n_touches,
        |  CAST(cents AS DOUBLE) / 100 / n_touches AS credit
        |FROM j""".stripMargin,

    "q_impute_locf" ->
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ev_ts,
        |  masked,
        |  last_value(masked IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  CAST(masked IS NULL AS INTEGER) AS was_masked
        |FROM (SELECT user_id, event_id, ts,
        |        CASE WHEN event_id % 10 < 3 THEN NULL ELSE value END AS masked
        |      FROM events)""".stripMargin,

    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id,
        |  epoch_us(p.ts) // 1000000 - epoch_us(c.ts) // 1000000 AS gap_secs
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts <= p.ts""".stripMargin,

    // Same frontier sweep: strictly-preceding running max end per user,
    // per-interval uncovered-suffix contribution, intdiv ppm.
    "q_interval_union" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s FROM events),
        |f AS (
        |  SELECT user_id, s,
        |    max(s + 14400000000) OVER (PARTITION BY user_id
        |      ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
        |  FROM e),
        |c AS (
        |  SELECT user_id, s,
        |    CASE WHEN frontier IS NULL THEN 14400000000
        |         ELSE greatest(0, s + 14400000000 - greatest(s, frontier))
        |         END AS contrib
        |  FROM f)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(contrib) AS BIGINT) AS covered_us,
        |  CAST(max(s) + 14400000000 - min(s) AS BIGINT) AS span_us,
        |  CAST(sum(contrib) * 1000000
        |    // (max(s) + 14400000000 - min(s)) AS BIGINT) AS coverage_ppm
        |FROM c GROUP BY user_id""".stripMargin,

    // Same strict-frontier island flag and running sum; contiguous-union
    // identity makes covered = end - start per island.
    "q_covered_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s FROM events),
        |f AS (
        |  SELECT user_id, s,
        |    CASE WHEN max(s + 14400000000) OVER (PARTITION BY user_id
        |        ORDER BY s, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR s > max(s + 14400000000) OVER (PARTITION BY user_id
        |        ORDER BY s, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS nw,
        |    event_id
        |  FROM e),
        |i AS (
        |  SELECT user_id, s,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f)
        |SELECT user_id,
        |  CAST(min(s) AS BIGINT) AS island_start_us,
        |  CAST(max(s) + 14400000000 AS BIGINT) AS island_end_us,
        |  CAST(max(s) + 14400000000 - min(s) AS BIGINT) AS covered_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM i GROUP BY user_id, island""".stripMargin,
  )
}
