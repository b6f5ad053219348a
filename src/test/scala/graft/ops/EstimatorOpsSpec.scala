package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EstimatorOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Local replica of [[graft.expr.BloomExprs.splitmixHash]]'s scalar
    * kernel — the differential anchor for the HLL register build.
    */
  private def smix(key: Long, salt: Int): Long = {
    var z = key * 2654435761L + salt + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def localRegisters(keys: Seq[Long], salt: Int): Map[Long, Long] =
    keys.map { k =>
      val h = smix(k, salt)
      val idx = h >>> 56
      val w = h & ((1L << 56) - 1)
      val rho = if (w == 0) 57L else 56L - (63 - java.lang.Long.numberOfLeadingZeros(w))
      (idx, rho)
    }.groupMapReduce(_._1)(_._2)(math.max)

  test("hllRegisters matches the scalar replica and is layout-invariant") {
    val keys = (1L to 4000L).map(_ * 7919L)
    val df = keys.toDF("k")
    val got = EstimatorOps.hllRegisters(df, $"k", salt = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == localRegisters(keys, 5))
    val shuffled = EstimatorOps.hllRegisters(df.repartition(13), $"k", salt = 5)
      .as[(Long, Long)].collect().toMap
    assert(shuffled == got, "register table must not depend on layout")
  }

  test("hll registers merge by max: sketch(A ++ B) == merge(sketch(A), sketch(B))") {
    val a = (1L to 2500L).map(_ * 104729L)
    val b = (2000L to 5000L).map(_ * 104729L) // overlapping
    val ra = localRegisters(a, 9)
    val rb = localRegisters(b, 9)
    val merged = (ra.keySet ++ rb.keySet).map(i =>
      i -> math.max(ra.getOrElse(i, 0L), rb.getOrElse(i, 0L))).toMap
    val whole = EstimatorOps.hllRegisters((a ++ b).toDF("k"), $"k", 9)
      .as[(Long, Long)].collect().toMap
    assert(whole == merged)
  }

  test("hllEstimate lands within the sketch's error regime and is exact-integer inside") {
    for (n <- Seq(1000L, 5000L, 20000L)) {
      val df = (1L to n).map(_ * 6364136223846793005L).toDF("k")
      val row = EstimatorOps.hllEstimate(
        EstimatorOps.hllRegisters(df, $"k", salt = 3)).collect().head
      val est = row.getAs[Double]("est_raw")
      assert(math.abs(est / n - 1.0) < 0.2,
        s"n=$n est=$est — outside 20% (expected ~6.5% sigma)")
      assert(row.getAs[Long]("s_scaled") > 0L)
    }
  }

  test("goodTuring: hand corpus — counts-of-counts, r*, unseen mass") {
    // tokens: a x4, b x2, c x2, d x1, e x1, f x1 -> N=11, vocab=6
    // N_1=3, N_2=2, N_4=1; r*=1: 2*N_2/N_1 = 4/3 -> 1333333 micro
    // P0 = 3/11 -> 272727 micro
    val docs = Seq("a a b c d", "a a b c e f").toDF("text")
    val rows = EstimatorOps.goodTuring(
      docs, TextOps.tokens(lower(col("text"))), maxR = 4)
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_r") == 3L)
    assert(r1.getAs[Long]("n_r_next") == 2L)
    assert(r1.getAs[Long]("n_tokens") == 11L)
    assert(r1.getAs[Long]("vocab") == 6L)
    assert(r1.getAs[Long]("r_star_micro") == 2L * 2L * 1000000L / 3L)
    assert(r1.getAs[Long]("p_unseen_micro") == 3L * 1000000L / 11L)
    // top count r=4 has no successor: r* = 0 by the N_5=0 convention
    assert(rows(4L).getAs[Long]("r_star_micro") == 0L)
  }

  test("goodTuring is layout-invariant") {
    val docs = (1 to 200).map(i =>
      (1 to (1 + i % 7)).map(_ => s"w${i % 37}").mkString(" ")).toDF("text")
    val a = EstimatorOps.goodTuring(docs, TextOps.tokens(lower(col("text"))))
      .collect().sortBy(_.getAs[Long]("r")).toSeq
    val b = EstimatorOps.goodTuring(
      docs.repartition(11), TextOps.tokens(lower(col("text"))))
      .collect().sortBy(_.getAs[Long]("r")).toSeq
    assert(a == b)
  }

  test("hllEstimate on an empty frame yields the all-zero-register row, no crash") {
    val row = EstimatorOps.hllEstimate(
      EstimatorOps.hllRegisters(Seq.empty[Long].toDF("k"), $"k", 1))
      .collect().head
    assert(row.getAs[Long]("v_zero") == 256L)
    assert(row.getAs[Long]("s_scaled") == 256L * (1L << EstimatorOps.RhoCap))
  }

  test("adamicAdarTopK matches a local brute force on a small bipartite graph") {
    // 40 centers x up to 6 leaves, deterministic pattern incl. a hub to cap
    val edges = (for {
      c <- 1L to 40L
      l <- 1L to (c % 6 + 1)
    } yield (c, (c * l) % 13)) ++ (1L to 30L).map(l => (99L, l)) // hub center
    val df = edges.toDF("ctr", "leaf")
    val got = EstimatorOps.adamicAdarTopK(df, "ctr", "leaf",
      maxCenterDegree = 10L, k = 15)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // local brute
    val e = edges.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val w = deg.collect { case (c, d) if d >= 2 && d <= 10 =>
      c -> EstimatorOps.AaMicroNum / SelectionOps.log2Fixed(d) }
    val pairs = e.groupBy(_._1).toSeq.flatMap { case (c, ls) =>
      if (!w.contains(c)) Nil
      else {
        val s = ls.map(_._2).distinct.sorted
        for (i <- s.indices; j <- (i + 1) until s.size)
          yield ((s(i), s(j)), w(c))
      }
    }
    val scored = pairs.groupBy(_._1).view.mapValues(vs =>
      (vs.size.toLong, vs.map(_._2).sum)).toMap
    val expect = scored.toSeq
      .map { case ((a, b), (n, s)) => (a, b, n, s) }
      .sortBy { case (a, b, _, s) => (-s, a, b) }.take(15)
    assert(got == expect)
  }

  test("kthSmallest equals local sort across shapes (dups, negatives, bounds)") {
    val cases = Seq(
      Seq(5L, 3L, 3L, 3L, 9L, 1L),
      (1L to 1000L).map(i => (i * 7919L) % 217L),
      Seq(-50L, -1L, 0L, 1L << 40, 7L, -50L),
      Seq(42L))
    for (vs <- cases) {
      val df = vs.toDF("r")
      val sorted = vs.sorted
      for (k <- Seq(1, (vs.size + 1) / 2, vs.size)) {
        assert(EstimatorOps.kthSmallest(df, "r", k) == Some(sorted(k - 1)),
          s"k=$k over $vs")
      }
      assert(EstimatorOps.kthSmallest(df, "r", vs.size + 1L).isEmpty)
    }
  }

  test("poissonBootstrapCi is deterministic, ordered, and brackets the point") {
    val rows = (1L to 3000L).map(i => (i, 10000L + (i * 7919L) % 5000L))
      .toDF("id", "cents")
    def run() = EstimatorOps.poissonBootstrapCi(rows, $"id", $"cents",
      reps = 32, loRank = 2, hiRank = 31, salt = 11).collect().head
    val a = run()
    assert(a == run(), "bootstrap must be deterministic")
    val (pt, lo, hi) = (a.getAs[Double]("point_mean"),
      a.getAs[Double]("ci_lo"), a.getAs[Double]("ci_hi"))
    assert(lo < hi && lo < pt && pt < hi, s"pt=$pt lo=$lo hi=$hi")
    // exact mean of the weight-1 pseudo-replicate
    val mean = rows.agg(sum($"cents"), count(lit(1))).as[(Long, Long)]
      .collect().head match { case (s, n) => s.toDouble / n.toDouble / 100.0 }
    assert(pt == mean)
  }

  test("splitConformal: q_hat is the exact order statistic; coverage near level") {
    // g must not be correlated with the split: i%5 vs parity mixes both
    // splits into every group (an i%4 group would leave the odd groups
    // modelless and the inner model join would drop every test row)
    val rows = (1L to 8000L).map { i =>
      ((i % 5).toString, 100000L + (i * 6364136223846793005L) % 9001L, i % 2 == 0)
    }.toDF("g", "y", "cal")
    val row = EstimatorOps.splitConformal(rows, $"g", $"y", $"cal")
      .collect().head
    val nCal = row.getAs[Long]("n_cal")
    val k = row.getAs[Long]("k_rank")
    assert(k == math.min(((nCal + 1) * 9 + 9) / 10, nCal))
    // re-derive q_hat locally from the same model
    val local = rows.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val preds = local.filter(_._3).groupBy(_._1).view
      .mapValues(vs => vs.map(_._2).sum / vs.size).toMap
    val calResid = local.filter(_._3)
      .map(t => math.abs(t._2 - preds(t._1))).sorted
    assert(row.getAs[Long]("q_hat_cents") == calResid(k.toInt - 1))
    assert(row.getAs[Long]("n_test") > 0L)
    val cov = row.getAs[Double]("coverage")
    assert(cov >= 0.85 && cov <= 0.95, s"coverage $cov drifted from 0.9")
  }

  test("hllRegistersBy grouped registers max-merge into the union's registers") {
    val a = (1L to 1500L).map(i => ("a", i * 31L))
    val b = (700L to 2500L).map(i => ("b", i * 31L))
    val byG = EstimatorOps.hllRegistersBy(
      (a ++ b).toDF("src", "k"), $"src", $"k", salt = 7)
      .as[(String, Long, Long)].collect()
    val merged = byG.groupMapReduce(_._2)(_._3)(math.max)
    val union = localRegisters((a ++ b).map(_._2).distinct, 7)
    assert(merged == union,
      "per-group registers must max-merge into the union sketch")
  }

  test("looDeltas matches local exact algebra and handles the whole-corpus group") {
    val rows = (1L to 600L).map(i => (s"s${i % 3}", i % 17)).toDF("g", "v")
    val got = EstimatorOps.looDeltas(rows, $"g", $"v")
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    val local = (1L to 600L).map(i => (s"s${i % 3}", (i % 17).toLong))
    val tAll = local.map(_._2).sum
    val nAll = local.size.toLong
    for ((g, n, mAll, mWo, d) <- got) {
      val (tg, ng) = (local.filter(_._1 == g).map(_._2).sum,
        local.count(_._1 == g).toLong)
      assert(n == ng && mAll == tAll.toDouble / nAll.toDouble)
      assert(mWo.contains((tAll - tg).toDouble / (nAll - ng).toDouble))
      assert(d.contains(mWo.get - mAll))
    }
    // single group owning the corpus: mean_without must be NULL, not a 0/0
    val one = EstimatorOps.looDeltas(
      Seq(("only", 5L), ("only", 7L)).toDF("g", "v"), $"g", $"v")
      .collect().head
    assert(one.isNullAt(one.fieldIndex("mean_without")))
  }

  test("splitConformal survives an empty frame") {
    val row = EstimatorOps.splitConformal(
      Seq.empty[(String, Long, Boolean)].toDF("g", "y", "cal"),
      $"g", $"y", $"cal").collect().head
    assert(row.getAs[Long]("n_cal") == 0L && row.getAs[Long]("n_test") == 0L)
  }

  test("captureRecapture: hand Chapman estimate over multi-event units") {
    // 6 units: 1,2,3,4 in capture 1; 3,4,5 in capture 2; 6 unseen-flagged
    val events = Seq(
      (1L, true, false), (1L, true, false), (2L, true, false),
      (3L, true, false), (3L, false, true), (4L, true, true),
      (5L, false, true), (5L, false, true), (6L, false, false))
    val out = EstimatorOps.captureRecapture(
      events.toDF("u", "c1", "c2"), $"u", $"c1", $"c2").collect().head
    assert(out.getAs[Long]("n1") == 4L && out.getAs[Long]("n2") == 3L)
    assert(out.getAs[Long]("m_both") == 2L)
    assert(out.getAs[Long]("n_seen") == 5L, "never-captured unit excluded")
    assert(out.getAs[Long]("n_hat") == 5L * 4L / 3L - 1L) // Chapman = 5
    assert(out.getAs[Long]("unseen_hat") == 0L,
      "estimate below the union floors at zero")
  }

  test("captureRecapture: null flags coalesce to uncaptured; empty frame " +
    "yields the zero row") {
    val events = Seq(
      (1L, Some(true), None), (2L, None, Some(true)), (3L, None, None))
    val out = EstimatorOps.captureRecapture(
      events.toDF("u", "c1", "c2"), $"u", $"c1", $"c2").collect().head
    assert(out.getAs[Long]("n1") == 1L && out.getAs[Long]("n2") == 1L &&
      out.getAs[Long]("m_both") == 0L && out.getAs[Long]("n_seen") == 2L)
    // (1+1)*(1+1) DIV 1 - 1 = 3: one unseen implied
    assert(out.getAs[Long]("n_hat") == 3L &&
      out.getAs[Long]("unseen_hat") == 1L)

    val empty = EstimatorOps.captureRecapture(
      Seq.empty[(Long, Boolean, Boolean)].toDF("u", "c1", "c2"),
      $"u", $"c1", $"c2").collect().head
    assert(empty.getAs[Long]("n_seen") == 0L &&
      empty.getAs[Long]("n_hat") == 0L)
  }

  /** Brute-force pair-agreement replica over (pred, truth) labels. */
  private def pairEvalScalar(rows: Seq[(Long, Long)])
  : (Long, Long, Long, Long) = {
    var (both, pred, truth) = (0L, 0L, 0L)
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val sp = rows(i)._1 == rows(j)._1
      val st = rows(i)._2 == rows(j)._2
      if (sp) pred += 1
      if (st) truth += 1
      if (sp && st) both += 1
    }
    (rows.size.toLong, both, pred, truth)
  }

  test("clusteringPairEval == the brute-force pair counts; identical " +
    "clusterings score ARI 1") {
    val rows = Seq( // (pred, truth): pred splits truth cluster 10
      (1L, 10L), (1L, 10L), (1L, 10L), (2L, 10L), (2L, 10L),
      (3L, 20L), (3L, 20L), (4L, 30L), (5L, 30L), (3L, 20L))
    val out = EstimatorOps.clusteringPairEval(
      rows.toDF("p", "t"), $"p", $"t").collect().head
    val (n, both, pred, truth) = pairEvalScalar(rows)
    assert(out.getAs[Long]("n") == n)
    assert(out.getAs[Long]("pairs_both") == both &&
      out.getAs[Long]("pairs_pred") == pred &&
      out.getAs[Long]("pairs_true") == truth)
    assert(out.getAs[Long]("precision_micro") == 1000000L * both / pred)
    assert(out.getAs[Long]("recall_micro") == 1000000L * both / truth)
    assert(out.getAs[Long]("f1_micro") == 2000000L * both / (pred + truth))
    // ARI via the doubled-sum closed form
    val (s2, sa2, sb2) = (2 * both, 2 * pred, 2 * truth)
    val c2d = n * (n - 1)
    val ari = 2.0 * (BigInt(c2d) * s2 - BigInt(sa2) * sb2).toDouble /
      (BigInt(c2d) * (sa2 + sb2) - 2 * BigInt(sa2) * sb2).toDouble
    assert(out.getAs[Double]("ari") == ari)

    val same = rows.map { case (_, t) => (t, t) }
    val ri = EstimatorOps.clusteringPairEval(
      same.toDF("p", "t"), $"p", $"t").collect().head
    assert(ri.getAs[Double]("ari") == 1.0 &&
      ri.getAs[Long]("f1_micro") == 1000000L)
  }

  test("clusteringPairEval: trivial clusterings yield NULL ARI; " +
    "layout-invariant") {
    // all singletons on both sides: sa2 = sb2 = 0
    val singles = (1L to 6L).map(i => (i, i + 100L))
    val rs = EstimatorOps.clusteringPairEval(
      singles.toDF("p", "t"), $"p", $"t").collect().head
    assert(rs.isNullAt(rs.fieldIndex("ari")) &&
      rs.isNullAt(rs.fieldIndex("precision_micro")))

    val rows = (0L until 60L).map(i => (i % 7, i % 5))
    val one = EstimatorOps.clusteringPairEval(
      spark.createDataFrame(rows).toDF("p", "t").repartition(1),
      $"p", $"t").collect().head
    val eight = EstimatorOps.clusteringPairEval(
      spark.createDataFrame(rows).toDF("p", "t").repartition(8),
      $"p", $"t").collect().head
    assert(one == eight)
  }
}
