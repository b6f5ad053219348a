package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DqOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("a"), Some(10L)),
    (2L, Some(""), Some(-5L)),   // empty text, negative value
    (2L, Some("b"), None),       // duplicate key, NULL value
    (3L, None, Some(7L))         // NULL text
  ).toDF("id", "s", "v")

  test("check: exact violation counts; NULL predicate counts as violation") {
    val out = DqOps.check(rows,
      rules = Seq(
        "v_nonneg" -> ($"v" >= 0),       // row2 violates; row3's NULL violates
        "s_nonempty" -> (length($"s") > 0)), // row2 empty, row4 NULL
      uniqueKeys = Seq("id"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out("v_nonneg") == ((4L, 2L, "fail")))
    assert(out("s_nonempty") == ((4L, 2L, "fail")))
    assert(out("unique_id") == ((4L, 1L, "fail")))
  }

  test("check: all-holding rules report pass with zero violations") {
    val out = DqOps.check(rows,
      rules = Seq("id_pos" -> ($"id" > 0)), uniqueKeys = Nil)
      .collect().head
    assert(out.getString(0) == "id_pos" && out.getLong(2) == 0L &&
      out.getString(3) == "pass")
  }

  test("check on an empty frame: zero rows, zero violations, pass") {
    val out = DqOps.check(rows.filter($"id" > 100),
      rules = Seq("any" -> ($"v" >= 0)), uniqueKeys = Seq("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      "any" -> ((0L, 0L, "pass")), "unique_id" -> ((0L, 0L, "pass"))))
  }

  test("check rejects colliding or unresolvable constraint names") {
    intercept[IllegalArgumentException] {
      DqOps.check(rows, rules = Seq("unique_id" -> ($"v" >= 0)),
        uniqueKeys = Seq("id")) // collides with the generated unique_id
    }
    intercept[IllegalArgumentException] {
      DqOps.check(rows, rules = Seq("a.b" -> ($"v" >= 0)))
    }
  }

  test("checkReferential: orphan and NULL foreign keys count; clean FK passes") {
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val child = Seq(Some(10L), Some(10L), Some(99L), None)
      .toDF("fk") // one orphan, one NULL
    val bad = DqOps.checkReferential(
      child, $"fk", parent, $"pk", "child_parent_fk").collect().head
    assert(bad.getString(0) == "child_parent_fk" && bad.getLong(1) == 4L &&
      bad.getLong(2) == 2L && bad.getString(3) == "fail")
    val clean = DqOps.checkReferential(
      child.filter($"fk" < 50), $"fk", parent, $"pk", "ok").collect().head
    assert(clean.getLong(2) == 0L && clean.getString(3) == "pass")
  }

  test("checkWindowed: per-window verdicts, streamed == batch") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = Timestamp.valueOf(s)
    val data = Seq(
      (1L, ts("2024-01-01 00:05:00"), "click", 1.50),
      (2L, ts("2024-01-01 00:55:00"), "bogus", 2.25),   // hour 0 fails
      (3L, ts("2024-01-01 01:10:00"), "view", -4.00),   // hour 1 fails other rule
      (4L, ts("2024-01-01 01:20:00"), "click", 8.00))
    val rules = Seq(
      "value_pos" -> ($"value" > 0),
      "type_known" -> $"event_type".isin("click", "view"))
    val batchDf = data.toDF("event_id", "ts", "event_type", "value")
    val batch = DqOps.checkWindowed(batchDf, "ts", "1 hour", rules)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    assert(batch(("2024-01-01 00:00:00", "type_known")) == ((2L, 1L, "fail")))
    assert(batch(("2024-01-01 00:00:00", "value_pos")) == ((2L, 0L, "pass")))
    assert(batch(("2024-01-01 01:00:00", "type_known")) == ((2L, 0L, "pass")))
    assert(batch(("2024-01-01 01:00:00", "value_pos")) == ((2L, 1L, "fail")))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = DqOps.checkWindowed(stream, "ts", "1 hour", rules,
      watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("dq_out")
      .outputMode("complete").start()
    try {
      mem.addData(data.take(2))
      q.processAllAvailable()
      mem.addData(data.drop(2))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM dq_out").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("check plan: one scan, no row shuffle") {
    val q = DqOps.check(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      rules = Seq("nonneg" -> (col("n_chars") >= 0)),
      uniqueKeys = Seq("doc_id"))
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert("FileScan|BatchScan".r.findAllIn(plan).size == 1,
      s"expected one scan:\n$plan")
    assert(plan.contains("SinglePartition"),
      s"global partial/final aggregate expected:\n$plan")
  }

  test("benford: exact grid shares, literal expectations, non-positives dropped") {
    import spark.implicits._
    val vals = Seq(5L, 19L, 23L, 345L, 67L, 8L, 91L, 111L, -3L, 0L)
    val out = DqOps.benford(vals.toDF("x"), col("x")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // digits of the 8 positive values: 5,1,2,3,6,8,9,1 -> total 8
    assert(out(1) == (2L, 250000L, 301030L))
    assert(out(5) == (1L, 125000L, 79181L))
    // zero-count digits STILL emit a row: n=0, obs=0, delta=-exp — the
    // strongest fabrication signal must be visible, not an absent row
    assert(out(4) == (0L, 0L, 96910L))
    assert(out(7) == (0L, 0L, 57992L))
    assert(out.size == 9)
    // expectations are a partition of unity on the micro grid
    assert(DqOps.benfordMicro.values.sum == 1000000L)
  }

  test("benford: a 10^k-spread sample tracks the law; a flat sample does not") {
    import spark.implicits._
    // multi-magnitude sample: for each magnitude, counts proportional to
    // the Benford shares themselves -> deltas collapse to rounding
    val benfordish = (for {
      mag <- Seq(1L, 10L, 100L)
      d <- 1 to 9
      rep <- 0L until (DqOps.benfordMicro(d) / 10000L)
    } yield d * mag + rep % mag).toDF("x")
    val deltas = DqOps.benford(benfordish, col("x")).collect()
      .map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(deltas.values.forall(d => math.abs(d) < 40000L),
      s"multi-scale sample should track Benford: $deltas")

    // flat sample 100..999: every first digit equally likely -> digit 1
    // shows a strong NEGATIVE deviation (111111 vs 301030 expected)
    val flat = (100L until 1000L).toDF("x")
    val flatDeltas = DqOps.benford(flat, col("x")).collect()
      .map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(flatDeltas(1) < -150000L,
      s"flat data must flunk the screen: $flatDeltas")
  }
}
