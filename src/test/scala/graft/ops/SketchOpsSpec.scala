package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def refMix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def refPos(key: Long, j: Int, w: Int): Int =
    ((refMix(key * 2654435761L + j) >>> 1) % w).toInt

  test("cmsSketch counters equal the reference grid") {
    val keys = Seq(1L, 1L, 1L, 2L, 2L, 9L)
    val w = 32; val d = 3
    val got = SketchOps.cmsSketch(keys.toDF("k"), $"k", w, d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = keys.flatMap(k => (0 until d).map(j => (j, refPos(k, j, w))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
  }

  test("estimates never undercount; exact when the grid is collision-free") {
    val keys = (1L to 50L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = (1L to 60L).toDF("p") // 51..60 absent

    // tight grid: collisions certain, but min-fold still never undercounts
    val tight = SketchOps.cmsEstimate(
      SketchOps.cmsSketch(keys.toDF("k"), $"k", 16, 3),
      probes, $"p", 16, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- 1L to 60L)
      assert(tight(p) >= exact.getOrElse(p, 0L), s"undercount at $p")

    // wide grid: 2^20 cells for 50 keys — collisions would need a
    // degenerate family; estimates must be exact and absents must read 0
    val wide = SketchOps.cmsEstimate(
      SketchOps.cmsSketch(keys.toDF("k"), $"k", 1 << 20, 3),
      probes, $"p", 1 << 20, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- 1L to 60L)
      assert(wide(p) == exact.getOrElse(p, 0L), s"inexact at $p")
  }

  private def kmvRow(keys: Seq[Long], k: Int) = {
    val df = keys.map(x => ("g", x)).toDF("g", "key")
    SketchOps.kmvDistinct(df, Seq("grp" -> $"g"), $"key", k)
      .collect().map(r => (r.getAs[Long]("n_kept"),
        Option(r.getAs[java.lang.Long]("kth_hash")).map(_.longValue),
        r.getAs[Double]("est_distinct"))).head
  }

  test("kmvDistinct: kth hash is the exact k-th smallest; duplicates collapse") {
    val k = 8
    val keys = (1L to 40L) ++ (1L to 40L) // every key twice
    val hashes = (1L to 40L).map(x => refMix(x * 2654435761L) >>> 1).sorted
    val (nKept, kth, est) = kmvRow(keys, k)
    assert(nKept == k && kth.contains(hashes(k - 1)))
    assert(est == 7.0 * (9223372036854775808.0 / hashes(k - 1).toDouble))
    // the estimate lands in sane territory for n=40, k=8 (sigma ~ 38%)
    assert(est > 10.0 && est < 160.0, s"estimate $est wildly off for n=40")
  }

  test("kmvDistinct: under-k group degrades to the exact distinct count") {
    val (nKept, kth, est) = kmvRow(Seq(5L, 5L, 9L, 9L, 13L), 8)
    assert(nKept == 3L && kth.isEmpty && est == 3.0)
  }

  test("kmvIntersect: union/intersection estimates from sketches alone") {
    // A = 1..300, B = 201..500 -> |union| 500, |inter| 100, jaccard 0.2
    val a = (1L to 300L).toDF("key")
    val b = (201L to 500L).toDF("key")
    val r = SketchOps.kmvIntersect(a, $"key", b, $"key", 64).collect().head
    val nKept = r.getAs[Long]("n_kept_union")
    val unionEst = r.getAs[Double]("union_est")
    val interEst = r.getAs[Double]("inter_est")
    assert(nKept == 64L)
    // the merged kth equals the true kth smallest hash of A union B
    val all = (1L to 500L).map(x => refMix(x * 2654435761L) >>> 1).sorted
    assert(r.getAs[Long]("kth_union") == all(63))
    assert(unionEst == 63.0 * (9223372036854775808.0 / all(63).toDouble))
    // k=64 => sigma ~ 12.5%; allow 4 sigma on union, looser on inter
    // (jaccard adds binomial noise) — deterministic values, bounds are
    // documentation not flake tolerance
    assert(unionEst > 250.0 && unionEst < 750.0, s"union_est $unionEst")
    assert(interEst > 20.0 && interEst < 250.0, s"inter_est $interEst")
  }

  test("kmvIntersect: disjoint and under-k sets stay exact") {
    val r = SketchOps.kmvIntersect(
      (1L to 20L).toDF("key"), $"key",
      (100L to 120L).toDF("key"), $"key", 64).collect().head
    // 41 distinct hashes < k: the merged sketch IS the exact union set
    assert(r.getAs[Long]("n_kept_union") == 41L)
    assert(r.isNullAt(r.fieldIndex("kth_union")))
    assert(r.getAs[Double]("union_est") == 41.0)
    assert(r.getAs[Long]("n_common") == 0L)
    assert(r.getAs[Double]("inter_est") == 0.0)
  }

  test("kmvSegmented: merged row (fold of segment sketches) == whole-feed sketch") {
    val feed = (1L to 400L).map(x => (x % 3, x % 151))
    val seg = SketchOps.kmvSegmented(
      feed.toDF("seg", "key"), $"seg", $"key", k = 32)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Long](2)),
          r.getDouble(3)))).toMap
    assert(seg.keySet == Set("0", "1", "2", "merged"))
    // the merged row must equal the sketch built directly on the union
    val whole = SketchOps.kmvDistinct(
      feed.map { case (_, k) => ("all", k) }.toDF("g", "key"),
      Seq("grp" -> $"g"), $"key", 32)
      .collect().map(r =>
        (r.getLong(1), Option(r.getAs[java.lang.Long](2)), r.getDouble(3)))
      .head
    assert(seg("merged") == whole)
    // per-segment sketches are genuinely different inputs (not vacuous)
    assert(seg("0") != seg("merged") || seg("1") != seg("merged"))
  }

  test("kmvDistinct merges: 1-partition == 8-partition sketch") {
    val keys = (1L to 500L).map(x => ("g", x % 97))
    val one = SketchOps.kmvDistinct(
      keys.toDF("g", "key").repartition(1), Seq("grp" -> $"g"), $"key", 16)
      .collect().map(_.toSeq).toSeq
    val eight = SketchOps.kmvDistinct(
      keys.toDF("g", "key").repartition(8), Seq("grp" -> $"g"), $"key", 16)
      .collect().map(_.toSeq).toSeq
    assert(one == eight)
  }
}
