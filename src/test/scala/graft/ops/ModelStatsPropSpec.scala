package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential checks for the round-8 statistical machinery: every
  * distributed statistic is re-derived by a SCALAR brute-force replica
  * over a grid of pseudo-random inputs — the HLL / Adamic-Adar /
  * bootstrap differential discipline. Sizes stay small (these pin
  * SEMANTICS; the oracles and bench pin scale behavior).
  */
class ModelStatsPropSpec extends SparkSpec {
  import spark.implicits._

  private val grid = Seq((11, 3L), (20, 5L), (33, 7L), (57, 9L))

  test("rocAuc == brute-force pairwise P(pos > neg) + half-ties") {
    for ((n, mod) <- grid) {
      val rows = (1 to n).map(i => (i % 3 == 0, (i.toLong * 37) % mod))
      val got = ExperimentOps.rocAuc(rows.toDF("y", "s"), col("y"), col("s"))
        .collect().head.getAs[Double]("auc")
      val pos = rows.filter(_._1).map(_._2)
      val neg = rows.filter(!_._1).map(_._2)
      val u2 = (for (p <- pos; q <- neg) yield
        if (p > q) 2L else if (p == q) 1L else 0L).sum
      val want = u2.toDouble / (2.0 * pos.size * neg.size)
      assert(math.abs(got - want) < 1e-12, s"n=$n mod=$mod")
    }
  }

  test("ksTest d_num == brute-force max CDF gap over all values") {
    for ((n, mod) <- grid) {
      val rows = (1 to n).map(i => (i % 2 == 0, (i.toLong * 13) % mod))
      val got = ExperimentOps.ksTest(rows.toDF("a", "v"), col("a"), col("v"))
        .collect().head
      val as = rows.filter(_._1).map(_._2)
      val bs = rows.filter(!_._1).map(_._2)
      val want = rows.map(_._2).distinct.map { v =>
        math.abs(as.count(_ <= v).toLong * bs.size -
          bs.count(_ <= v).toLong * as.size)
      }.max
      assert(got.getAs[Long]("d_num") == want, s"n=$n mod=$mod")
    }
  }

  test("mannWhitneyU u2 == brute-force doubled pairwise wins") {
    for ((n, mod) <- grid) {
      val rows = (1 to n).map(i => (i % 2 == 1, (i.toLong * 29) % mod))
      val got = ExperimentOps.mannWhitneyU(
        rows.toDF("a", "v"), col("a"), col("v")).collect().head
      val as = rows.filter(_._1).map(_._2)
      val bs = rows.filter(!_._1).map(_._2)
      // U_A with half-ties doubled: u2 = 2*#[x>y] + #[x==y]
      val u2 = (for (x <- as; y <- bs) yield
        if (x > y) 2L else if (x == y) 1L else 0L).sum
      assert(got.getAs[Long]("u2_a") == u2, s"n=$n mod=$mod")
    }
  }

  test("olsTrend == scalar closed form on jittered linear series") {
    for ((a0, b0, n) <- Seq((-50L, 7L, 12), (40L, -13L, 25), (0L, 0L, 9))) {
      val pts = (0 until n).map(i => (i.toLong, a0 + b0 * i + (i * i) % 5))
      val row = ModelOps.olsTrend(
        pts.map(p => ("g", p._1, p._2)).toDF("g", "x", "y"),
        col("g"), col("x"), col("y")).collect().head
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val den = n * sxx - sx * sx
      val num = (n * sxy - sx * sy) * 1000000L
      assert(row.getAs[Long]("slope_micro") == num / den, s"$a0 $b0 $n")
      val ic = (sy * 1000000L - (num / den) * sx) / n
      assert(row.getAs[Long]("intercept_micro") == ic, s"$a0 $b0 $n")
    }
  }

  test("theilSen == scalar lower-median of pairwise slopes + sign sum") {
    for ((n, mod) <- grid) {
      val pts = (0 until n).map(i => (i.toLong, (i.toLong * 31) % mod))
      val row = ModelOps.theilSen(
        pts.map(p => ("g", p._1, p._2)).toDF("g", "x", "y"),
        col("g"), col("x"), col("y")).collect().head
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
      } yield {
        val dy = pts(j)._2 - pts(i)._2
        val dx = pts(j)._1 - pts(i)._1
        (dy * 1000000L / dx, pts(i)._1, pts(j)._1)
      }).sorted
      val want = slopes((slopes.size + 1) / 2 - 1)._1
      assert(row.getAs[Long]("slope_micro") == want, s"n=$n mod=$mod")
      val sStat = (for {
        i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
      } yield java.lang.Long.signum(pts(j)._2 - pts(i)._2).toLong).sum
      assert(row.getAs[Long]("s_stat") == sStat, s"n=$n mod=$mod")
    }
  }

  test("concentration hhi == scalar truncated-share replica") {
    for ((n, g) <- Seq((17, 3), (40, 5), (61, 7))) {
      val rows = (1 to n).map(i => s"s${i % g}")
      val got = ProfileOps.concentration(rows.toDF("grp"), col("grp"))
        .collect().head
      val counts = rows.groupBy(identity).map { case (_, v) => v.size.toLong }
      val shares = counts.map(c => c * 1000000L / n)
      val hhi = shares.map(s => s * s).sum / 1000000L
      assert(got.getAs[Long]("hhi_micro") == hhi, s"n=$n g=$g")
    }
  }
}
