package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs() =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("profile: exact counts, nulls, distincts, min/max on a known frame") {
    val df = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, Some("a"), None),
      (3L, None, Some(30L)),
      (4L, Some("a"), Some(10L))).toDF("id", "s", "v")
    val p = ProfileOps.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap

    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("profileApprox: agrees with exact on everything but n_distinct, " +
    "and n_distinct stays inside the HLL error envelope") {
    val df = docs()
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val rsd = 0.02
    val exact = ProfileOps.profile(df, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = ProfileOps.profileApprox(df, cols, rsd).collect()
      .map(r => r.getString(0) -> r).toMap

    assert(exact.keySet == approx.keySet)
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(1) == e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) == e.getLong(2), s"$c n_null")
      assert(a.getString(4) == e.getString(4), s"$c min_val")
      assert(a.getString(5) == e.getString(5), s"$c max_val")
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      // 5x rsd: ~3-sigma for HLL++ plus slack for small-cardinality bias
      assert(math.abs(ad - ed) <= math.max(5 * rsd * ed, 2.0),
        s"$c n_distinct: exact $ed approx $ad")
    }
  }

  test("profileApprox plan: ONE scan, no row shuffle — the aggregate is " +
    "partial/final over a single pass") {
    val q = ProfileOps.profileApprox(docs(), Seq("doc_id", "lang"))
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val scans = "FileScan|BatchScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
    // the only Exchange is the single-partition gather of partial
    // aggregate buffers (rows never shuffle)
    val exchanges =
      "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one partial-agg gather:\n$plan")
    assert(plan.contains("SinglePartition"),
      s"the one Exchange should be the global-agg gather:\n$plan")
  }

  test("profile == profileApprox on layout: repartition invariance") {
    val df = docs().repartition(13)
    val one = ProfileOps.profile(docs(), Seq("lang")).collect().head
    val many = ProfileOps.profile(df, Seq("lang")).collect().head
    assert(one == many)
  }
}
