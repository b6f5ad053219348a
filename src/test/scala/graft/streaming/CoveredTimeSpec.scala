package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[EventOps.coveredTime]]: brute-force interval-merge differential,
  * overlap/disjoint/swallowed geometry, tie invariance, and the
  * single-Exchange plan shape.
  */
class CoveredTimeSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000000L // 1 s windows for readable fixtures

  private def runUs(rows: Seq[(Long, Long, Long)], parts: Int = 4) =
    EventOps.coveredTime(
      rows.toDF("user_id", "event_id", "us")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"))
        .repartition(parts),
      windowUs = W)

  /** Scalar union-of-intervals measure. */
  private def merged(starts: Seq[Long]): Long = {
    val iv = starts.sorted.map(s => (s, s + W))
    var covered = 0L
    var frontier = Long.MinValue
    iv.foreach { case (s, e) =>
      val lo = math.max(s, frontier)
      if (e > lo) covered += e - lo
      frontier = math.max(frontier, e)
    }
    covered
  }

  test("disjoint, chained, and swallowed intervals measure correctly") {
    // user 1: disjoint -> 2W; user 2: half-overlap chain -> 1.5W;
    // user 3: duplicate start (swallowed) -> 1W
    val rows = Seq(
      (1L, 1L, 0L), (1L, 2L, 5000000L),
      (2L, 3L, 0L), (2L, 4L, 500000L),
      (3L, 5L, 0L), (3L, 6L, 0L))
    val got = runUs(rows).orderBy("user_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((1L, 2 * W), (2L, 3 * W / 2), (3L, W)))
    // span and ppm: user 2 spans 1.5W fully covered -> 1000000 ppm
    val u2 = got(1)
    assert(u2.getLong(3) === 3 * W / 2)
    assert(u2.getLong(4) === 1000000L)
  }

  test("brute-force differential on pseudo-random per-user streams") {
    val rows = for (u <- 1L to 7L; i <- 1L to 40L) yield {
      val s = ((u * 7919 + i * 104729) % 30) * (W / 4)
      (u, u * 1000 + i, s)
    }
    val got = runUs(rows, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val starts = rs.map(_._3)
      val (n, cov, span) = got(u)
      assert(n === rs.size.toLong)
      assert(cov === merged(starts.toSeq), s"user $u covered")
      assert(span === starts.max + W - starts.min, s"user $u span")
    }
  }

  test("partition-count invariance and tie invariance") {
    val rows = (1 to 200).map(i =>
      ((i % 5).toLong, i.toLong, ((i * 31) % 17) * (W / 3)))
    val a = runUs(rows, 1).orderBy("user_id").collect().map(_.toSeq).toSeq
    val b = runUs(rows, 16).orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // shuffled tie order (descending event_id) leaves per-user sums alone
    val c = runUs(rows.map { case (u, id, s) => (u, 1000 - id, s) }, 16)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(a === c)
  }

  test("coveredIslands: island lengths sum to coveredTime's union measure") {
    val rows = for (u <- 1L to 5L; i <- 1L to 30L) yield
      (u, u * 100 + i, ((u * 13 + i * 104729) % 23) * (W / 3))
    val islands = EventOps.coveredIslands(
      rows.toDF("user_id", "event_id", "us")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts")), windowUs = W)
      .collect()
    val union = runUs(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    islands.groupBy(_.getLong(0)).foreach { case (u, is) =>
      assert(is.map(_.getLong(3)).sum === union(u), s"user $u")
      // islands are disjoint with real gaps between them
      val sorted = is.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("coveredIslandsStream: streamed == batch under out-of-order delivery") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    // second-grain fixture (watermark advances in ms); user 2's late
    // event (00:00:30) arrives in batch 2, inside the watermark, and
    // BRIDGES two islands that would otherwise look sealed on data
    def ts(s: String) = Timestamp.valueOf(s)
    val w = 60000000L // 1-minute windows
    val evs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 00:00:30"), 1L),
      (3L, ts("2024-01-01 00:05:00"), 1L),  // gap -> 2 islands for user 1
      (4L, ts("2024-01-01 00:00:00"), 2L),
      (5L, ts("2024-01-01 00:01:30"), 2L))  // 30s gap after [0,60): 2 islands
    val late = (6L, ts("2024-01-01 00:00:30"), 2L) // bridges user 2's pair
    val sentinel = (7L, ts("2024-01-01 09:00:00"), 99L) // advances watermark

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val q = EventOps.coveredIslandsStream(
      mem.toDF().toDF("event_id", "ts", "user_id")
        .withWatermark("ts", "30 minutes")
        .as[SessionEvent], windowUs = w)
      .writeStream.format("memory").queryName("islands_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(late)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM islands_out WHERE user_id <> 99 ORDER BY user_id, island_start_us")
        .collect().map(_.toSeq)
      val batch = EventOps.coveredIslands(
        (evs :+ late).toDF("event_id", "ts", "user_id"), windowUs = w)
        .orderBy("user_id", "island_start_us").collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq)
      // the bridge actually exercised the merge: user 2 has ONE island of 3
      assert(batch.count(_.head == 2L) === 1)
    } finally q.stop()
  }

  test("plan: one user-keyed Exchange shared by window and aggregate; never SinglePartition") {
    val df = runUs((1 to 50).map(i => ((i % 3).toLong, i.toLong, i * W / 2)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected the window Exchange (+repartition) only:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") ||
      plan.contains("AdaptiveSparkPlan"), // AQE may coalesce tiny test data
      s"no global gather in the sweep:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"), s"user-keyed sweep:\n$plan")
  }
}
