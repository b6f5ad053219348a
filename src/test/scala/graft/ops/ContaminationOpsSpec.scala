package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContaminationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq("a b c d").toDF("text") // shingles: {a b c, b c d}

  private def scores(docs: Seq[(Long, String)]): Map[Long, Option[Double]] =
    ContaminationOps.contaminationScores(
      docs.toDF("doc_id", "text"), "text", bench, "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("contamination = fraction of distinct doc shingles in the benchmark") {
    val got = scores(Seq(
      1L -> "a b c",         // {a b c} fully in bench -> 1.0
      2L -> "x y z w",       // {x y z, y z w} disjoint -> 0.0
      3L -> "a b c x y",     // {a b c, b c x, c x y}: 1 of 3
      4L -> "a b",           // < k tokens: no shingles -> NULL
      5L -> "a b c a b c"))  // {a b c, b c a, c a b}: repeats dedup, 1 of 3
    assert(got(1L).contains(1.0))
    assert(got(2L).contains(0.0))
    assert(got(3L).contains(1.0 / 3.0))
    assert(got(4L).isEmpty)
    assert(got(5L).contains(1.0 / 3.0))
  }

  test("corpus side never shuffles: only a broadcast meets the scan") {
    val docs = spark.range(100)
      .select($"id".as("doc_id"), concat_ws(" ", lit("a"), lit("b"), $"id").as("text"))
    val df = ContaminationOps.contaminationScores(docs, "text", bench, "text", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"benchmark set not broadcast:\n$plan")
    // the docs side reaches the join without a hash-partition exchange
    val docSideShuffles = "Exchange hashpartitioning\\([^\\n]*doc_id".r
      .findAllIn(plan).length
    assert(docSideShuffles == 0, s"corpus was shuffled:\n$plan")
  }

  test("benchmarkShingleSet is sorted distinct (SortedIntersectCount contract)") {
    val row = ContaminationOps.benchmarkShingleSet(
      Seq("a b c d", "b c d e", "a b c d").toDF("text"), "text", 3)
      .collect().head.getSeq[Long](0)
    assert(row == row.sorted && row.distinct == row)
    assert(row.size == 3) // {a b c, b c d, c d e}
  }

  test("overlapMatrix: exact pairwise jaccard over distinct slice shingles") {
    // sliceA: {a b c, b c d}; sliceB: {b c d, c d e} (via two docs, one a
    // duplicate — distinct must collapse it); sliceC: {x y z}
    val docs = Seq(
      ("A", "a b c d"),
      ("B", "b c d e"),
      ("B", "b c d"), // duplicate shingle within B
      ("C", "x y z")
    ).toDF("source", "text")
    val got = ContaminationOps.overlapMatrix(docs, "source", "text", k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == Set(("A", "B"))) // C shares nothing -> absent
    assert(got(("A", "B")) == ((1L, 2L, 2L, 1.0 / 3.0)))
  }
}
