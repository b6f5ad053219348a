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

  test("slidingStats: each event lands in length/hop windows; streamed == batch") {
    // batch shape: 1h/15min -> exactly 4 windows per event
    val one = EventOps.slidingStats(fixture.limit(1))
    assert(one.count() == 4)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventOps.slidingStats(stream, watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.50),
        (2L, ts("2024-01-01 00:55:00"), 10L, "click", 2.25))
      q.processAllAvailable()
      mem.addData(
        (3L, ts("2024-01-01 01:10:00"), 10L, "view", 4.00),
        (4L, ts("2024-01-01 01:20:00"), 11L, "click", 8.00))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM sliding_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val batch = EventOps.slidingStats(fixture.filter($"event_id" <= 4)).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(streamed == batch && batch.nonEmpty)
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

  test("sessionizeStream (flatMapGroupsWithState) matches batch sessionStats after flush") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .as[SessionEvent]
    val q = EventOps.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // fixture events arrive out of order WITHIN a batch, in order across
      mem.addData((2L, ts("2024-01-01 00:55:00"), 10L),
        (1L, ts("2024-01-01 00:05:00"), 10L))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-01 01:10:00"), 10L),
        (4L, ts("2024-01-01 01:20:00"), 11L))
      q.processAllAvailable()
      mem.addData((5L, ts("2024-01-01 03:00:00"), 10L))
      q.processAllAvailable()
      // two flush ticks on a sentinel user: first advances the watermark
      // past every open session's end+gap, second lets timeouts fire
      mem.addData((90L, ts("2024-01-02 00:00:00"), 999L))
      q.processAllAvailable()
      mem.addData((91L, ts("2024-01-03 00:00:00"), 999L))
      q.processAllAvailable()

      val streamed = spark.sql(
        "SELECT * FROM sess_out WHERE user_id <> 999").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getString(3), r.getString(4))).toMap
      val batch = EventOps.sessionStats(
        fixture.select($"event_id", $"ts", $"user_id"), gapMinutes = 30)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getString(3), r.getString(4))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("collapseBurstsStream matches batch collapseBursts after flush") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .as[BurstEvent]
    val q = EventOps.collapseBurstsStream(stream, gapUs = 30000000L)
      .writeStream.format("memory").queryName("burst_out")
      .outputMode("append").start()
    val data = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "click"),
      (2L, ts("2024-01-01 00:00:20"), 10L, "click"),
      (3L, ts("2024-01-01 00:00:50"), 10L, "click"), // 30s exactly: same burst
      (4L, ts("2024-01-01 00:01:21"), 10L, "click"), // 31s: new burst
      (5L, ts("2024-01-01 00:00:25"), 10L, "view"),
      (6L, ts("2024-01-01 00:00:05"), 11L, "click"))
    try {
      // first two events out of order within a batch, then the rest
      mem.addData(data(1), data(0))
      q.processAllAvailable()
      mem.addData(data(2), data(3), data(4), data(5))
      q.processAllAvailable()
      // flush ticks on a sentinel key: advance watermark, then fire timeouts
      mem.addData((90L, ts("2024-01-02 00:00:00"), 999L, "flush"))
      q.processAllAvailable()
      mem.addData((91L, ts("2024-01-03 00:00:00"), 999L, "flush"))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM burst_out WHERE user_id <> 999").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      val batch = EventOps.collapseBursts(
        data.map { case (id, t, u, et) => (id, t, u, et, 0.0) }
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        gapUs = 30000000L)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("collapseBurstsStream restart resumes exactly-once from the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("burst_ckpt").toString
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .as[BurstEvent]
    def start() = EventOps.collapseBurstsStream(stream, gapUs = 30000000L)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:00"), 10L, "click"),
        (2L, ts("2024-01-01 00:00:20"), 10L, "click"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: open-burst state must survive
    val q2 = start()
    try {
      mem.addData((3L, ts("2024-01-01 00:01:00"), 10L, "click")) // 40s: new burst
      q2.processAllAvailable()
      mem.addData((90L, ts("2024-01-02 00:00:00"), 999L, "flush"))
      q2.processAllAvailable()
      mem.addData((91L, ts("2024-01-03 00:00:00"), 999L, "flush"))
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .filter($"user_id" =!= 999L).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      def us(s: String) = ts(s).getTime * 1000L
      // burst 1 (events 1,2) closed by the in-data gap; burst 2 by timeout
      assert(got == Map(
        (10L, "click", 1L) -> ((us("2024-01-01 00:00:00"), 2L)),
        (10L, "click", 2L) -> ((us("2024-01-01 00:01:00"), 1L))), s"got $got")
    } finally q2.stop()
  }

  test("clicksBeforeErrors stream-stream join matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L, "click", 0.0),
      (2L, ts("2024-01-01 00:20:00"), 10L, "error", 0.0), // joins click 1
      (3L, ts("2024-01-01 01:30:00"), 10L, "click", 0.0),
      (4L, ts("2024-01-01 01:35:00"), 10L, "error", 0.0), // joins click 3 only
      (5L, ts("2024-01-01 01:34:00"), 11L, "click", 0.0), // other user
      (6L, ts("2024-01-01 02:00:00"), 11L, "error", 0.0) // 26 min gap > 25 -> no join
    )
    val batchDf = data.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = EventOps.clicksBeforeErrors(batchDf, withinMinutes = 25)
      .select($"error_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((2L, 1L), (4L, 3L)))

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventOps.clicksBeforeErrors(stream, withinMinutes = 25,
      watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*)
      q.processAllAvailable()
      // flush: advance the watermark far past every event
      mem.addData((99L, ts("2024-01-02 00:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT error_id, click_id FROM ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("enrichEvents stream-static join matches batch; unmatched facts survive") {
    implicit val sqlCtx = spark.sqlContext
    val users = Seq(
      (10L, "Alice", 3L, 100.0, "BUILDING"),
      (11L, "Bob", 5L, 200.0, "MACHINERY")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val data = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L, "click", 0.0),
      (2L, ts("2024-01-01 00:06:00"), 11L, "view", 0.0),
      (3L, ts("2024-01-01 00:07:00"), 99L, "click", 0.0) // no dimension row
    )
    val batchDf = data.toDF("event_id", "ts", "user_id", "event_type", "value")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(4)) null else r.getString(4))
    val batch = EventOps.enrichEvents(batchDf, users).collect().map(key).toSet
    assert(batch == Set((1L, "Alice"), (2L, "Bob"), (3L, null)))

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventOps.enrichEvents(stream, users)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM enrich_out").collect().map(key).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamingDedup keeps first arrival per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "payload")
    val q = EventOps.streamingDedup(stream, col("payload"), watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:05:00"), "doc-a"),
        (2L, ts("2024-01-01 00:06:00"), "doc-b"),
        (3L, ts("2024-01-01 00:07:00"), "doc-a")) // duplicate in-batch
      q.processAllAvailable()
      mem.addData(
        (4L, ts("2024-01-01 00:30:00"), "doc-b"), // duplicate across batches
        (5L, ts("2024-01-01 00:31:00"), "doc-c"))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, payload FROM dedup_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
      // first arrival of each payload survives, id 3 and 4 dropped
      assert(got == Set(1L -> "doc-a", 2L -> "doc-b", 5L -> "doc-c"))

      // batch twin dedups to the same key set
      val batch = EventOps.streamingDedup(
        Seq(
          (1L, ts("2024-01-01 00:05:00"), "doc-a"),
          (2L, ts("2024-01-01 00:06:00"), "doc-b"),
          (3L, ts("2024-01-01 00:07:00"), "doc-a"),
          (4L, ts("2024-01-01 00:30:00"), "doc-b"),
          (5L, ts("2024-01-01 00:31:00"), "doc-c")).toDF("event_id", "ts", "payload"),
        col("payload"))
      assert(batch.select($"payload").distinct().count() == 3 && batch.count() == 3)
    } finally q.stop()
  }

  test("timeWeightedAvg: hand-computed piecewise-constant hold") {
    val out = EventOps.timeWeightedAvg(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // user 10: 1.50 held 50 min, 2.25 held 15 min, 4.00 held 110 min;
    // the last event (03:00, value 0.25) has no successor and drops out.
    // twa = (150*50 + 225*15 + 400*110)/(175 min)/100
    val num = 150L * 50 + 225L * 15 + 400L * 110
    val den = 175L
    assert(out(10L) == ((3L, den * 60L * 1000000L,
      num.toDouble / den.toDouble / 100.0)))
    // user 11 has a single event: no interval, no row
    assert(!out.contains(11L))
  }

  test("collapseBursts: gap threshold is strict; bursts split per (user, type)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "click", 0.0),
      (2L, ts("2024-01-01 00:00:20"), 10L, "click", 0.0), // 20s gap -> same burst
      (3L, ts("2024-01-01 00:00:50"), 10L, "click", 0.0), // exactly 30s -> same (strict >)
      (4L, ts("2024-01-01 00:01:21"), 10L, "click", 0.0), // 31s -> NEW burst
      (5L, ts("2024-01-01 00:00:25"), 10L, "view", 0.0),  // other type: own burst
      (6L, ts("2024-01-01 00:00:05"), 11L, "click", 0.0)  // other user: own burst
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.collapseBursts(events, gapUs = 30000000L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4))))
      .toMap
    def us(s: String) = ts(s).getTime * 1000L
    assert(got == Map(
      (10L, "click", 1L) -> ((us("2024-01-01 00:00:00"), 3L)),
      (10L, "click", 2L) -> ((us("2024-01-01 00:01:21"), 1L)),
      (10L, "view", 1L) -> ((us("2024-01-01 00:00:25"), 1L)),
      (11L, "click", 1L) -> ((us("2024-01-01 00:00:05"), 1L))), s"got $got")
    // layout invariance
    val re = EventOps.collapseBursts(events.repartition(5), 30000000L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(re == got)
  }

  test("sequenceWindows: bounded context, oldest first, empty at history start") {
    val out = EventOps.sequenceWindows(fixture, ctxLen = 2)
      .collect().map(r => r.getLong(1) -> ((r.getString(2), r.getString(3))))
      .toMap
    // user 10 ordered: 1 click, 2 click, 3 view, 5 click
    assert(out(1L) == (("", "click")))
    assert(out(2L) == (("click", "click")))
    assert(out(3L) == (("click|click", "view")))
    assert(out(5L) == (("click|view", "click"))) // frame slides: event 1 aged out
    // user 11's single event opens its own history
    assert(out(4L) == (("", "click")))
  }

  test("transitionMatrix: exact counts and row-conditional probabilities") {
    val got = EventOps.transitionMatrix(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // user 10: click->click, click->view, view->click; user 11: none
    assert(got == Map(
      ("click", "click") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 0.5)),
      ("view", "click") -> ((1L, 1.0))), s"got $got")
  }

  test("ewmaAnomalies: hand-computed fixed-point recurrence, strict thresholds") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val series = Seq(
      ("a", d("2024-01-01"), 100L),
      ("a", d("2024-01-02"), 100L),
      ("a", d("2024-01-03"), 200L), // 200 > 1.25*100 -> spike
      ("a", d("2024-01-04"), 100L), // 100*5 == 4*ewma(32000/256=125) exactly -> NOT flagged (strict)
      ("a", d("2024-01-05"), 40L), //  40 < 0.8*118.75 -> drop
      ("b", d("2024-01-01"), 7L)) //   first point never anomalous
      .toDF("key", "ord", "x")
    val got = EventOps.ewmaAnomalies(series)
      .orderBy($"key", $"ord")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      ("a", 100L, 25600L, 0),
      ("a", 100L, 25600L, 0),
      ("a", 200L, 32000L, 1),
      ("a", 100L, 30400L, 0),
      ("a", 40L, 25360L, 1),
      ("b", 7L, 1792L, 0)))
    // the sequential fold is layout-invariant: the sort lives INSIDE the
    // keyed group, so input partitioning/order cannot change the result
    val shuffled = EventOps.ewmaAnomalies(series.repartition(7).sortWithinPartitions($"x"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    assert(shuffled == got.toSet)
  }

  test("clickPurchaseJoin: interval semantics; stream-stream == batch") {
    // purchases: user 10 at 01:00 (clicks 00:05/00:55 in window, the
    // 03:30 click after it is not), user 11 at 04:00 (click 01:20 is
    // outside the 2h window), user 12 at 02:00 (no clicks at all)
    val purchases = Seq(
      (100L, ts("2024-01-01 01:00:00"), 10L),
      (101L, ts("2024-01-01 04:00:00"), 11L),
      (102L, ts("2024-01-01 02:00:00"), 12L)
    ).toDF("event_id", "ts", "user_id")
    val clicks = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L),
      (2L, ts("2024-01-01 00:55:00"), 10L),
      (3L, ts("2024-01-01 03:30:00"), 10L),
      (4L, ts("2024-01-01 01:20:00"), 11L)
    ).toDF("event_id", "ts", "user_id")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val batch = EventOps.clickPurchaseJoin(purchases, clicks)
      .collect().map(key).toSet
    assert(batch == Set(
      (100L, 1L, 10L, 3300L),
      (100L, 2L, 10L, 300L)))

    // the SAME function as a watermarked stream-stream join
    implicit val sqlCtx = spark.sqlContext
    val memP = MemoryStream[(Long, Timestamp, Long)]
    val memC = MemoryStream[(Long, Timestamp, Long)]
    val q = EventOps.clickPurchaseJoin(
        memP.toDF().toDF("event_id", "ts", "user_id"),
        memC.toDF().toDF("event_id", "ts", "user_id"),
        wmPurchases = Some("1 hour"), wmClicks = Some("1 hour"))
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try {
      // clicks arrive first, purchases in a later batch — the join state
      // must hold the clicks until the purchase side catches up
      memC.addData((1L, ts("2024-01-01 00:05:00"), 10L),
        (2L, ts("2024-01-01 00:55:00"), 10L))
      q.processAllAvailable()
      memP.addData((100L, ts("2024-01-01 01:00:00"), 10L),
        (102L, ts("2024-01-01 02:00:00"), 12L))
      memC.addData((3L, ts("2024-01-01 03:30:00"), 10L),
        (4L, ts("2024-01-01 01:20:00"), 11L))
      q.processAllAvailable()
      memP.addData((101L, ts("2024-01-01 04:00:00"), 11L))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM ss_join_out").collect()
        .map(key).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("cusumShifts: hand-computed recurrence; sustained drift alarms, spikes do not") {
    // series A: mu=10; +3 drift per step (slack 2): s_hi accrues 1 per
    // step -> crosses threshold 3 at the 5th drifted point.
    // series B: one +100 spike then back to baseline: s_hi jumps but
    // decays by slack each quiet step (x=mu -> delta -slack).
    def day(i: Int) = java.sql.Date.valueOf(f"2024-03-$i%02d")
    val a = (1 to 8).map(i => ("A", day(i), if (i == 1) 10L else 13L))
    val b = Seq(("B", day(1), 10L), ("B", day(2), 110L),
      ("B", day(3), 10L), ("B", day(4), 10L))
    val out = EventOps.cusumShifts(
      (a ++ b).toDF("key", "ord", "x"), slack = 2L, threshold = 3L)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    // A: s_hi after steps 2..8 = 1,2,3,4,5,6,7; alarm from s_hi>3
    assert(out(("A", "2024-03-02")) == (1L, 0L, 0))
    assert(out(("A", "2024-03-04")) == (3L, 0L, 0))
    assert(out(("A", "2024-03-05")) == (4L, 0L, 1))
    assert(out(("A", "2024-03-08")) == (7L, 0L, 1))
    // B: spike 110 -> s_hi = 98 (alarm), then decays by slack=2 per step
    assert(out(("B", "2024-03-02")) == (98L, 0L, 1))
    assert(out(("B", "2024-03-03")) == (96L, 0L, 1))
    assert(out(("B", "2024-03-04")) == (94L, 0L, 1))
  }

  test("cusumShifts: downward shifts trip s_lo; partitioning-invariant") {
    def day(i: Int) = java.sql.Date.valueOf(f"2024-04-$i%02d")
    val s = (1 to 6).map(i => ("K", day(i), if (i == 1) 50L else 40L))
    val df = s.toDF("key", "ord", "x")
    val out = EventOps.cusumShifts(df, slack = 3L, threshold = 10L)
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    // each low step adds (50-40)-3 = 7 to s_lo: 7,14,21,28,35
    assert(out("2024-04-02") == (0L, 7L, 0))
    assert(out("2024-04-03") == (0L, 14L, 1))
    assert(out("2024-04-06") == (0L, 35L, 1))
    val one = EventOps.cusumShifts(df.repartition(1), 3L, 10L)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString)
    val eight = EventOps.cusumShifts(df.repartition(8), 3L, 10L)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString)
    assert(one == eight)
  }

  test("rollingActiveUsers: hand-computed DAU and trailing-3-day counts") {
    // u10 active days 1, 2 (twice — same-day events must collapse), 5;
    // u11 active days 1, 8. W=3 coverage: u10 {1},{2,3,4},{5,6,7};
    // u11 {1,2,3},{8,9,10}. Days with dau=0 are not reported.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "click", 1.0),
      (2L, ts("2024-01-02 09:00:00"), 10L, "view", 1.0),
      (3L, ts("2024-01-02 21:00:00"), 10L, "click", 1.0),
      (4L, ts("2024-01-05 12:00:00"), 10L, "click", 1.0),
      (5L, ts("2024-01-01 01:00:00"), 11L, "click", 1.0),
      (6L, ts("2024-01-08 23:00:00"), 11L, "error", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.rollingActiveUsers(events, windowDays = 3).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "2024-01-01" -> (2L, 2L),
      "2024-01-02" -> (1L, 2L),
      "2024-01-05" -> (1L, 1L),
      "2024-01-08" -> (1L, 1L)))
  }

  test("rollingActiveUsers matches the naive W-wide range join") {
    // pseudo-random (user, day) activity from an affine hash — no RNG
    val events = (0L until 3000L).map { i =>
      val u = (i * 2654435761L + 104729L) % 1000000007L
      (i, ts(f"2024-01-${(u % 28) + 1}%02d 12:00:00"), u % 37L, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.rollingActiveUsers(events, windowDays = 7).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap

    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = active.select(col("day").as("d")).distinct()
    val naive = days.join(active,
        col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d"))
      .agg(
        countDistinct(when(col("day") === col("d"), col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("dau_w"))
      .collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naive)
  }

  test("rollingActiveUsers: coverage caps at the next active day (no double count)") {
    // consecutive active days: each day's interval must stop before the
    // next, so dau_w on day 3 counts the user ONCE despite 3 covering days
    val events = Seq(
      (1L, ts("2024-02-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-02-02 10:00:00"), 7L, "click", 1.0),
      (3L, ts("2024-02-03 10:00:00"), 7L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.rollingActiveUsers(events, windowDays = 7).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "2024-02-01" -> (1L, 1L),
      "2024-02-02" -> (1L, 1L),
      "2024-02-03" -> (1L, 1L)))
  }

  test("seasonalBacktest: gap-aware lags, hand-computed MASE, degenerate NULL") {
    // key "a": days 0..9 except 6 missing, x = 10*d
    //   season-3 forecasts exist where d-3 present: d in 3,4,5,7(4),8(5),9(no 6)
    //     d=3..5: |10d - 10(d-3)| = 30 each; d=7: |70-40|=30; d=8: |80-50|=30;
    //     d=9: d-3=6 MISSING -> no forecast (gap-aware; row lag would fake one)
    //   naive-1: d=1..5 (|10|x5), d=7: d-1=6 missing -> none, d=8,9: |10|x2
    //   => n_eval=5, sae_s=150, n_naive=7, sae_n=70
    //   MASE = (150*7)/(5*70) = 3.0
    val a = Seq(0, 1, 2, 3, 4, 5, 7, 8, 9).map(d => ("a", d.toLong, 10L * d))
    // key "b": constant series -> sae_naive = 0 -> NULL mase, still a row
    val b = (0 to 4).map(d => ("b", d.toLong, 5L))
    val daily = (a ++ b).toDF("key", "d", "x")
    val out = EventOps.seasonalBacktest(daily, season = 3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(out("a") == (5L, 150L, 7L, 70L, Some(3.0)))
    assert(out("b") == (2L, 0L, 4L, 0L, None))
  }

  test("lateDataReport: hand-computed lateness; two-phase scan == naive; layout-invariant") {
    // arrival order 0..5; event times (s): 0, 100, 40, 95, 200, 30.
    // delay 50 s: seen-so-far maxima BEFORE each arrival are
    // -,0,100,100,100,200 -> late iff ts < seen-50: arr2 (40<50), arr5
    // (30<150). Lateness sums: (50-40)+(150-30) = 130 s.
    val rows = Seq((0L, 0L), (1L, 100L), (2L, 40L), (3L, 95L),
      (4L, 200L), (5L, 30L))
      .map { case (id, s) =>
        (id, new java.sql.Timestamp(s * 1000L), 1L, "t", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // windowUs = 1 minute -> windows 0s, 60s, 180s
    val got = EventOps.lateDataReport(rows, delayUs = 50000000L,
      windowUs = 60000000L, bucketWidth = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      0L -> ((3L, 2L, 130000000L)), // ts 0, 40, 30 (two late)
      60000000L -> ((2L, 0L, 0L)),  // ts 100, 95
      180000000L -> ((1L, 0L, 0L))))// ts 200
    // bucket width must not change the answer (prefix-scan correctness)
    val wide = EventOps.lateDataReport(rows, delayUs = 50000000L,
      windowUs = 60000000L, bucketWidth = 1000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(wide == got)
    // and neither does input layout
    val re = EventOps.lateDataReport(rows.repartition(5), delayUs = 50000000L,
      windowUs = 60000000L, bucketWidth = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(re == got)
  }
}
