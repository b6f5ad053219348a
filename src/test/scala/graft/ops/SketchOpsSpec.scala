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
}
