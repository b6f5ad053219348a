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
