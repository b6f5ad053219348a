package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExperimentOpsSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of the portable affine arm split (SamplingOps.portableAffine
    * % 2) — the spec recomputes assignments independently of Catalyst.
    */
  private def arm(id: Long): Int = {
    val p = 999999937L
    (((id % p) * 2654435761L + 104729L) % p % 2L).toInt
  }

  test("armOf: deterministic, matches the JVM twin, both arms populated") {
    val ids = (0L until 200L).toDF("id")
    val got = ids.select(col("id"), ExperimentOps.armOf(col("id"), 2).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    (0L until 200L).foreach(i => assert(got(i) == arm(i), s"id $i"))
    assert(got.values.toSet == Set(0, 1), "both arms must be populated")
  }

  test("abTest: counts, rates, and z match a hand-computed fixture") {
    val units = (0L until 100L).map(i => (i, if (i % 3 == 0) 1L else 0L))
    val out = ExperimentOps.abTest(
      units.toDF("id", "conv"), col("id"), col("conv")).collect().head

    val (a, b) = units.partition { case (i, _) => arm(i) == 0 }
    val (na, nb) = (a.size.toLong, b.size.toLong)
    val (ca, cb) = (a.map(_._2).sum, b.map(_._2).sum)
    assert(out.getLong(0) == na && out.getLong(1) == nb)
    assert(out.getLong(2) == ca && out.getLong(3) == cb)
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    assert(out.getDouble(4) == ra && out.getDouble(5) == rb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (ra - rb) / math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(out.getDouble(6) == z, "z must be the exact IEEE chain")
  }

  test("abTest: degenerate pools (nobody / everybody converts) give NULL z") {
    Seq(0L, 1L).foreach { c =>
      val out = ExperimentOps.abTest(
        (0L until 50L).map(i => (i, c)).toDF("id", "conv"),
        col("id"), col("conv")).collect().head
      assert(out.isNullAt(6), s"constant conversion $c must yield NULL z")
    }
  }

  test("abTest: empty input yields one all-guarded row, no division error") {
    val out = ExperimentOps.abTest(
      Seq.empty[(Long, Long)].toDF("id", "conv"), col("id"), col("conv"))
      .collect().head
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L)
    assert(out.isNullAt(4) && out.isNullAt(5) && out.isNullAt(6))
  }

  test("abTest: partitioning-invariant (1 vs 8 input partitions)") {
    val units = (0L until 300L).map(i => (i, (i % 7) / 5))
    val one = ExperimentOps.abTest(
      units.toDF("id", "conv").repartition(1), col("id"), col("conv"))
      .collect().head.toSeq
    val eight = ExperimentOps.abTest(
      units.toDF("id", "conv").repartition(8), col("id"), col("conv"))
      .collect().head.toSeq
    assert(one == eight)
  }

  test("cuped: theta and adjusted means match the JVM moment identities") {
    // y correlated with x plus an arm-dependent shift — CUPED must
    // reproduce the exact moment arithmetic, not an approximation
    val units = (0L until 200L).map { i =>
      val x = (i * 7 % 13) + 1
      val y = 2 * x + (i % 5) + (if (arm(i) == 1) 3 else 0)
      (i, x, y)
    }
    val out = ExperimentOps.cuped(
      units.toDF("id", "x", "y"), col("id"), col("x"), col("y"))
      .collect().head

    val n = units.size.toLong
    val sx = units.map(_._2).sum; val sy = units.map(_._3).sum
    val sxy = units.map(u => u._2 * u._3).sum
    val sxx = units.map(u => u._2 * u._2).sum
    val syy = units.map(u => u._3 * u._3).sum
    val (ua, ub) = units.partition(u => arm(u._1) == 0)
    val num = (n * sxy - sx * sy).toDouble
    val denx = (n * sxx - sx * sx).toDouble
    val deny = (n * syy - sy * sy).toDouble
    val theta = num / denx
    val meanX = sx.toDouble / n
    def adj(g: Seq[(Long, Long, Long)]) = {
      val m = g.size.toLong
      g.map(_._3).sum.toDouble / m -
        theta * (g.map(_._2).sum.toDouble / m - meanX)
    }
    assert(out.getLong(0) == ua.size && out.getLong(1) == ub.size)
    assert(out.getDouble(2) == theta)
    assert(out.getDouble(5) == adj(ua) && out.getDouble(6) == adj(ub))
    assert(out.getDouble(7) == num * num / (denx * deny))
    // CUPED removes the x-driven variance: rho^2 must be substantial here
    assert(out.getDouble(7) > 0.5)
    // the adjusted treatment effect stays close to the designed +3 shift
    val effect = out.getDouble(6) - out.getDouble(5)
    assert(math.abs(effect - 3.0) < 1.0, s"adjusted effect $effect")
  }

  test("cuped: zero covariate variance degrades to raw means (theta = 0)") {
    val units = (0L until 60L).map(i => (i, 5L, i % 4))
    val out = ExperimentOps.cuped(
      units.toDF("id", "x", "y"), col("id"), col("x"), col("y"))
      .collect().head
    assert(out.getDouble(2) == 0.0, "theta must be 0 when var(x) = 0")
    assert(out.getDouble(5) == out.getDouble(3) &&
      out.getDouble(6) == out.getDouble(4),
      "adjusted means must equal raw means")
    assert(out.isNullAt(7), "var_reduction undefined when var(x) = 0")
  }

  test("cuped: empty input yields a fully guarded row") {
    val out = ExperimentOps.cuped(
      Seq.empty[(Long, Long, Long)].toDF("id", "x", "y"),
      col("id"), col("x"), col("y")).collect().head
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L)
    (2 to 7).foreach(i => assert(out.isNullAt(i), s"col $i must be NULL"))
  }

  test("mannWhitneyU: hand ranks with a tie — doubled midranks exact") {
    // A = {1, 3, 3}, B = {2, 5}: sorted 1,2,3,3,5; midranks 1,2,3.5,3.5,5
    // R_A = 1 + 3.5 + 3.5 = 8 -> r2a = 16; U_A = 8 - 3*4/2 = 2 -> u2 = 4
    // ties: one group of 2 -> T = 2^3 - 2 = 6
    val df = Seq((true, 1L), (true, 3L), (true, 3L), (false, 2L), (false, 5L))
      .toDF("a", "v")
    val out = ExperimentOps.mannWhitneyU(df, col("a"), col("v"))
      .collect().head
    assert(out.getAs[Long]("n_a") == 3L && out.getAs[Long]("n_b") == 2L)
    assert(out.getAs[Long]("u2_a") == 4L)
    assert(out.getAs[Long]("t_ties") == 6L)
    // z2 = 3*(4-6)^2*5*4 / (3*2*((6*5*4)-6)) = 240/684
    assert(math.abs(out.getAs[Double]("z2") - 240.0 / 684.0) < 1e-12)
    assert(out.getAs[Int]("significant") == 0)
  }

  test("mannWhitneyU: clean separation is significant; degenerate inputs NULL") {
    val sep = ((1L to 40L).map(v => (true, v)) ++
      (101L to 140L).map(v => (false, v))).toDF("a", "v")
    val out = ExperimentOps.mannWhitneyU(sep, col("a"), col("v"))
      .collect().head
    assert(out.getAs[Int]("significant") == 1,
      s"fully separated samples must reject: $out")
    // one-group-only input: z2 guarded to NULL
    val solo = (1L to 9L).map(v => (true, v)).toDF("a", "v")
    val s = ExperimentOps.mannWhitneyU(solo, col("a"), col("v"))
      .collect().head
    assert(s.isNullAt(s.fieldIndex("z2")))
    // all values tied: m = 0 -> NULL
    val tied = Seq((true, 7L), (true, 7L), (false, 7L), (false, 7L))
      .toDF("a", "v")
    val t2 = ExperimentOps.mannWhitneyU(tied, col("a"), col("v"))
      .collect().head
    assert(t2.isNullAt(t2.fieldIndex("z2")))
  }

  test("ksTest: hand CDFs — exact cross-multiplied gap") {
    // A = {1, 2, 3}, B = {3, 4}: at v=2 F_A=2/3, F_B=0 -> gap 2/3
    // d_num = max|cumA*nB - cumB*nA| = |2*2 - 0*3| = 4; D = 4/6
    val df = Seq((true, 1L), (true, 2L), (true, 3L), (false, 3L), (false, 4L))
      .toDF("a", "v")
    val out = ExperimentOps.ksTest(df, col("a"), col("v")).collect().head
    assert(out.getAs[Long]("n_a") == 3L && out.getAs[Long]("n_b") == 2L)
    assert(out.getAs[Long]("d_num") == 4L)
    assert(math.abs(out.getAs[Double]("d_stat") - 4.0 / 6.0) < 1e-12)
    // tiny samples: 0.444 < c^2*(5)/(6) = 1.54 -> not significant
    assert(out.getAs[Int]("significant") == 0)
  }

  test("ksTest: disjoint supports reject at scale; identical samples gap 0") {
    val sep = ((1L to 200L).map(v => (true, v)) ++
      (1001L to 1200L).map(v => (false, v))).toDF("a", "v")
    val s = ExperimentOps.ksTest(sep, col("a"), col("v")).collect().head
    assert(s.getAs[Long]("d_num") == 200L * 200L, "full separation: D = 1")
    assert(s.getAs[Int]("significant") == 1)
    val same = (1L to 50L).flatMap(v => Seq((true, v), (false, v)))
      .toDF("a", "v")
    val t2 = ExperimentOps.ksTest(same, col("a"), col("v")).collect().head
    assert(t2.getAs[Long]("d_num") == 0L)
    assert(t2.getAs[Int]("significant") == 0)
    val b = ExperimentOps.ksTest(sep.repartition(13), col("a"), col("v"))
      .collect().head
    assert(s == b, "layout-invariant")
  }

  test("rocAuc: perfect, random-tie, and inverted scorers") {
    // perfect: every positive outscores every negative -> AUC 1
    val perfect = ((1L to 10L).map(s0 => (false, s0)) ++
      (11L to 20L).map(s0 => (true, s0))).toDF("y", "s")
    val p = ExperimentOps.rocAuc(perfect, col("y"), col("s")).collect().head
    assert(p.getAs[Double]("auc") == 1.0)
    // constant scorer: all tied -> AUC exactly 0.5
    val tied = ((1 to 6).map(i => (i % 2 == 0, 7L))).toDF("y", "s")
    val t2 = ExperimentOps.rocAuc(tied, col("y"), col("s")).collect().head
    assert(t2.getAs[Double]("auc") == 0.5)
    // inverted: AUC 0
    val inv = ((1L to 10L).map(s0 => (true, s0)) ++
      (11L to 20L).map(s0 => (false, s0))).toDF("y", "s")
    val i2 = ExperimentOps.rocAuc(inv, col("y"), col("s")).collect().head
    assert(i2.getAs[Double]("auc") == 0.0)
    // hand mid case: pos {3, 1}, neg {2}: pairs (3>2)=1, (1<2)=0 -> 0.5
    val mid = Seq((true, 3L), (true, 1L), (false, 2L)).toDF("y", "s")
    val m = ExperimentOps.rocAuc(mid, col("y"), col("s")).collect().head
    assert(m.getAs[Double]("auc") == 0.5)
    assert(m.getAs[Long]("u2_pos") == 2L)
  }

  test("permutationTest: planted shift rejects, null effect accepts, deterministic") {
    // strong effect: group A ~ +1000 cents over B
    val eff = ((1L to 200L).map(i => (i, true, 2000L + (i % 7))) ++
      (201L to 400L).map(i => (i, false, 1000L + (i % 7))))
      .toDF("id", "a", "c")
    val r = ExperimentOps.permutationTest(
      eff, col("id"), col("a"), col("c")).collect().head
    assert(r.getAs[Long]("n_units") == 400L)
    // no relabeling should reproduce a 1000-cent gap: only the +1 smooths
    assert(r.getAs[Long]("n_ge") == 0L)
    assert(r.getAs[Long]("p_micro") == 1000000L / 65L)
    // null effect: identical distributions -> p far from significant
    val nul = ((1L to 200L).map(i => (i, i % 2 == 0, 1000L + (i % 13))))
      .toDF("id", "a", "c")
    val n = ExperimentOps.permutationTest(
      nul, col("id"), col("a"), col("c")).collect().head
    assert(n.getAs[Long]("p_micro") > 100000L,
      s"null effect must not reject: $n")
    // deterministic under layout
    val r2 = ExperimentOps.permutationTest(
      eff.repartition(7), col("id"), col("a"), col("c")).collect().head
    assert(r == r2)
  }

  test("stratifiedEffect: exact per-stratum means/weights; planted stratum gap") {
    // stratum s1 pays +500 in arm 0 only; weights 3:1
    val rows = (1L to 300L).map(i =>
      (i, "s1", if (arm(i) == 0) 1500L else 1000L)) ++
      (301L to 400L).map(i => (i, "s2", 2000L))
    val out = ExperimentOps.stratifiedEffect(
      rows.toDF("id", "s", "c"), col("id"), col("s"), col("c"))
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Double]("mean_a") == 1500.0)
    assert(s1.getAs[Double]("mean_b") == 1000.0)
    assert(s1.getAs[Double]("diff") == 500.0)
    assert(s1.getAs[Long]("weight_micro") == 300L * 1000000L / 400L)
    val s2 = out("s2")
    assert(s2.getAs[Double]("diff") == 0.0)
    assert(s2.getAs[Long]("weight_micro") == 100L * 1000000L / 400L)
  }

  test("mannWhitneyU is layout-invariant") {
    val df = (1 to 500).map(i => (i % 3 == 0, (i * 37L) % 91L)).toDF("a", "v")
    val a = ExperimentOps.mannWhitneyU(df, col("a"), col("v")).collect().head
    val b = ExperimentOps.mannWhitneyU(df.repartition(17), col("a"), col("v"))
      .collect().head
    assert(a == b)
  }

  test("welchT == the scalar replica; layout-invariant; degenerate arms NULL") {
    val vals = (1 to 400).map(i => (i % 3 == 0, (i * 37L) % 211L - 50L))
    val df = vals.toDF("a", "v")
    val r = ExperimentOps.welchT(df, col("a"), col("v")).collect().head
    // scalar replica with the SAME fixed IEEE chain
    def stats(xs: Seq[Long]) = {
      val n = xs.length.toLong
      val s = xs.sum
      val q = xs.map(x => x * x).sum
      val mean = s.toDouble / n.toDouble
      val vr = q.toDouble / (n - 1).toDouble -
        (s.toDouble / n.toDouble) * (s.toDouble / (n - 1).toDouble)
      (n, mean, vr)
    }
    val (na, ma, va) = stats(vals.filter(_._1).map(_._2))
    val (nb, mb, vb) = stats(vals.filterNot(_._1).map(_._2))
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Double]("mean_a") == ma && r.getAs[Double]("mean_b") == mb)
    assert(r.getAs[Double]("var_a") == va && r.getAs[Double]("var_b") == vb)
    val ta = va / na.toDouble; val tb = vb / nb.toDouble
    val se2 = ta + tb; val d = ma - mb
    assert(r.getAs[Double]("t2") == d * d / se2)
    assert(r.getAs[Double]("df_welch") ==
      se2 * se2 / (ta * ta / (na - 1).toDouble + tb * tb / (nb - 1).toDouble))
    val r17 = ExperimentOps.welchT(df.repartition(17), col("a"), col("v"))
      .collect().head
    assert(r == r17)
    // single-row arms have no variance -> NULL t2
    val degen = Seq((true, 5L), (false, 7L), (false, 9L)).toDF("a", "v")
    val rd = ExperimentOps.welchT(degen, col("a"), col("v")).collect().head
    assert(rd.isNullAt(rd.fieldIndex("t2")))
  }

  test("bhFdr == the scalar step-up; boundary ranks behave") {
    // hand-built p grid: with alpha=0.05 and m=8, row k passes iff
    // p <= 6250*k. h4 (26000 > 25000) FAILS its own row but h5
    // (31000 <= 31250) passes rank 5 — the step-up must rescue h4.
    val ps = Seq(
      ("h1", 1000L), ("h2", 12000L), ("h3", 18000L), ("h4", 26000L),
      ("h5", 31000L), ("h6", 390000L), ("h7", 500000L), ("h8", 900000L))
    val out = ExperimentOps.bhFdr(
      ps.toDF("h", "p"), col("h"), col("p"))
      .collect().map(r => r.getAs[String]("hyp") ->
        (r.getAs[Long]("rank"), r.getAs[Int]("rejected"))).toMap
    // scalar BH: sort, find max k with p*m <= k*50000
    val sorted = ps.sortBy(p => (p._2, p._1))
    val kmax = sorted.zipWithIndex
      .filter { case ((_, p), i) => p * 8 <= (i + 1).toLong * 50000L }
      .map(_._2 + 1).maxOption.getOrElse(0)
    for (((h, _), i) <- sorted.zipWithIndex) {
      assert(out(h)._1 == i + 1)
      assert(out(h)._2 == (if (i + 1 <= kmax) 1 else 0),
        s"$h rank ${i + 1} vs kmax $kmax")
    }
    // the planted step-up boundary actually fired: h4 fails its own row
    // test yet is rejected (rescued by h5's rank passing)
    assert(kmax == 5, s"fixture must plant kmax=5, got $kmax")
    assert(out("h4")._2 == 1, "step-up must rescue h4")
    assert(out("h6")._2 == 0)
  }

  test("powerMde: exact scalar replay of counts and the MDE chain") {
    val units = (1L to 300L).map(id => (id, (id % 3 == 0)))
    val row = ExperimentOps.powerMde(
      units.toDF("id", "conv"), col("id"), col("conv").cast("long"))
      .collect().head
    val nA = units.count(u => arm(u._1) == 0).toLong
    val nB = units.count(u => arm(u._1) == 1).toLong
    val xA = units.count(u => arm(u._1) == 0 && u._2).toLong
    val xB = units.count(u => arm(u._1) == 1 && u._2).toLong
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((nA, nB, xA, xB)))
    val pool = (xA + xB).toDouble / (nA + nB).toDouble
    val mde = ExperimentOps.PowerZSum *
      math.sqrt(pool * (1.0 - pool) * (1.0 / nA.toDouble + 1.0 / nB.toDouble))
    assert(row.getDouble(4) === pool)
    assert(row.getDouble(5) === mde)
    assert(row.getDouble(6) === mde / pool)
  }

  test("powerMde: MDE shrinks as traffic grows; degenerate pools yield NULL") {
    def mdeAt(n: Long): Double = ExperimentOps.powerMde(
      (1L to n).map(id => (id, id % 5 == 0)).toDF("id", "conv"),
      col("id"), col("conv").cast("long")).collect().head.getDouble(5)
    assert(mdeAt(2000) < mdeAt(200))
    val allConv = ExperimentOps.powerMde(
      (1L to 50L).map(id => (id, true)).toDF("id", "conv"),
      col("id"), col("conv").cast("long")).collect().head
    assert(allConv.isNullAt(5) && allConv.isNullAt(6))
  }

  test("calibrationEce == the scalar replica; calibrated beats inverted") {
    // scores on the micro grid; label rate within each bin tracks the
    // score for the calibrated set, opposes it for the inverted one
    val rows = (0 until 1000).map { i =>
      val b = i % 10 // bin 0..9, 100 rows each
      val s = b * 100000L + 50000L
      ((i / 10) % 10 <= b, s) // positive rate (b+1)/10 tracks conf b/10+.05
    }
    val r = ExperimentOps.calibrationEce(rows.toDF("y", "s"), col("y"),
      col("s")).collect()
    // scalar replica
    val byBin = rows.groupBy(_._2 / 100000L)
    val devTot = byBin.values.map { xs =>
      math.abs(xs.count(_._1).toLong * 1000000L - xs.map(_._2).sum) }.sum
    val ece = devTot.toDouble / rows.length.toDouble / 1000000.0
    assert(r.map(_.getAs[Double]("ece")).distinct.toSeq == Seq(ece))
    val got = r.map(x => x.getAs[Long]("bin") -> x).toMap
    byBin.foreach { case (b, xs) =>
      assert(got(b).getAs[Long]("n") == xs.length.toLong, s"n bin $b")
      assert(got(b).getAs[Long]("acc_micro") ==
        xs.count(_._1).toLong * 1000000L / xs.length, s"acc bin $b")
      assert(got(b).getAs[Long]("conf_micro") ==
        xs.map(_._2).sum / xs.length, s"conf bin $b")
    }
    // an anti-calibrated labeling must score a much larger ECE
    val inv = rows.map { case (y, s) => (!y, s) }
    val eceInv = ExperimentOps.calibrationEce(inv.toDF("y", "s"), col("y"),
      col("s")).collect().head.getAs[Double]("ece")
    assert(eceInv > ece * 2)
    // out-of-range scores clamp instead of minting bins
    val cl = ExperimentOps.calibrationEce(
      Seq((true, -50L), (false, 2000000L)).toDF("y", "s"),
      col("y"), col("s")).collect().map(_.getAs[Long]("bin")).toSet
    assert(cl == Set(0L, 10L))
  }

  test("isotonicCalibration == classic stack PAV; monotone; fixes inversions") {
    // non-monotone raw rates: bins 0..5 with rates .9 .2 .4 .3 .8 .1
    val spec = Seq((0, 10, 9), (1, 20, 4), (2, 10, 4), (3, 10, 3),
      (4, 10, 8), (5, 30, 3))
    val rows = spec.flatMap { case (b, n, p) =>
      (0 until n).map(i => (i < p, b * 100000L + 1L)) }
    val out = ExperimentOps.isotonicCalibration(rows.toDF("y", "s"),
      col("y"), col("s")).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("raw_micro"), r.getAs[Long]("iso_micro")))
      .sortBy(_._1)
    // classic pool-adjacent-violators with exact rational comparisons
    case class Pool(n: Long, p: Long)
    val pools = spec.foldLeft(List.empty[Pool]) { case (st, (_, n, p)) =>
      var cur = Pool(n.toLong, p.toLong) :: st
      while (cur.tail.nonEmpty &&
        cur.tail.head.p * cur.head.n >= cur.head.p * cur.tail.head.n) {
        cur = Pool(cur.head.n + cur.tail.head.n, cur.head.p + cur.tail.head.p) ::
          cur.tail.tail
      }
      cur
    }.reverse
    val pavFit = pools.flatMap(pl => List.fill(1)(pl))
    // expand pools back over bins in order
    val fitted = {
      val per = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      pools.foreach { pl =>
        var left = pl.n
        while (left > 0) {
          per += pl.p * 1000000L / pl.n
          left -= spec(i)._2.toLong
          i += 1
        }
      }
      per.toSeq
    }
    assert(pavFit.nonEmpty)
    out.zipWithIndex.foreach { case ((b, (raw, iso)), idx) =>
      assert(b == idx.toLong)
      assert(raw == spec(idx)._3.toLong * 1000000L / spec(idx)._2, s"raw $b")
      assert(iso == fitted(idx), s"iso bin $b: got $iso want ${fitted(idx)}")
    }
    // monotone non-decreasing by construction
    assert(out.map(_._2._2).sliding(2).forall(w => w(0) <= w(1)))
    // the pooled fit must differ from raw where raw inverts
    assert(out.exists { case (_, (raw, iso)) => raw != iso })
  }

  test("anovaF == the scalar replica; empty groups drop from k; invariant") {
    val groups = Seq("g0", "g1", "g2")
    val vals = (1 to 300).map(i => (s"g${i % 3}", (i * 37L) % 211L - 50L))
    val df = vals.toDF("g", "v")
    val r = ExperimentOps.anovaF(df, col("g"), col("v"), groups)
      .collect().head
    // scalar replica with the SAME fixed left-assoc chains
    val by = groups.map(g => vals.filter(_._1 == g).map(_._2))
    val ns = by.map(_.length.toLong)
    val ss = by.map(_.sum)
    val qs = by.map(_.map(x => x * x).sum)
    val k = ns.map(n => if (n > 0) 1L else 0L).reduce(_ + _)
    val n = ns.reduce(_ + _)
    val s = ss.reduce(_ + _)
    val bT = groups.indices.map(i => if (ns(i) > 0)
      (ss(i).toDouble / ns(i).toDouble) * ss(i).toDouble else 0.0)
    val wT = groups.indices.map(i => if (ns(i) > 0)
      qs(i).toDouble - (ss(i).toDouble / ns(i).toDouble) * ss(i).toDouble
      else 0.0)
    val ssb = bT.reduce(_ + _) - (s.toDouble / n.toDouble) * s.toDouble
    val ssw = wT.reduce(_ + _)
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("n") == n)
    assert(r.getAs[Double]("ss_between") == ssb)
    assert(r.getAs[Double]("ss_within") == ssw)
    assert(r.getAs[Double]("f_stat") ==
      (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble))
    assert(r.getAs[Double]("eta2") == ssb / (ssb + ssw))
    val r17 = ExperimentOps.anovaF(df.repartition(17), col("g"), col("v"),
      groups).collect().head
    assert(r == r17)
    // a listed-but-empty group contributes nothing and drops from k
    val r2 = ExperimentOps.anovaF(df, col("g"), col("v"),
      groups :+ "g_absent").collect().head
    assert(r2.getAs[Long]("k") == k && r2.getAs[Long]("n") == n)
    assert(r2.getAs[Double]("ss_within") == ssw)
  }

  test("cliffsDelta == the brute-force pair count; magnitude labels") {
    val vals = (1 to 150).map(i => (i % 3 == 0, (i * 53L) % 97L))
    val df = vals.toDF("a", "v")
    val r = ExperimentOps.cliffsDelta(df, col("a"), col("v")).collect().head
    val as = vals.filter(_._1).map(_._2)
    val bs = vals.filterNot(_._1).map(_._2)
    val wins = as.map(a => bs.count(a > _).toLong).sum
    val losses = as.map(a => bs.count(a < _).toLong).sum
    assert(r.getAs[Long]("n_a") == as.length.toLong)
    assert(r.getAs[Long]("n_b") == bs.length.toLong)
    assert(r.getAs[Long]("dom_diff") == wins - losses)
    assert(r.getAs[Double]("delta") ==
      (wins - losses).toDouble / (as.length.toLong * bs.length).toDouble)
    // total dominance -> delta = 1, 'large'; identical -> 0, 'negligible'
    val dom = (Seq.tabulate(5)(i => (true, 100L + i)) ++
      Seq.tabulate(5)(i => (false, i.toLong))).toDF("a", "v")
    val rd = ExperimentOps.cliffsDelta(dom, col("a"), col("v")).collect().head
    assert(rd.getAs[Double]("delta") == 1.0 &&
      rd.getAs[String]("magnitude") == "large")
    val same = (1 to 10).map(i => (i % 2 == 0, 7L)).toDF("a", "v")
    val rs = ExperimentOps.cliffsDelta(same, col("a"), col("v")).collect().head
    assert(rs.getAs[Double]("delta") == 0.0 &&
      rs.getAs[String]("magnitude") == "negligible")
  }

  /** Scalar Kruskal-Wallis replica: doubled midranks, the identical
    * fixed-order double chain.
    */
  private def kwScalar(
      data: Seq[(String, Long)], groups: Seq[String]): Option[Double] = {
    val n = data.size.toLong
    if (n == 0) return None
    val byV = data.groupBy(_._2)
    val sorted = byV.keys.toSeq.sorted
    val cumBelow = sorted.scanLeft(0L)((acc, v) => acc + byV(v).size).init
    val dblRank = sorted.zip(cumBelow).map { case (v, c) =>
      v -> (2L * c + byV(v).size + 1L)
    }.toMap
    val r2 = groups.map(g => data.filter(d => d._1 == g && true)
      .map(d => dblRank(d._2)).sum)
    val ng = groups.map(g => data.count(_._1 == g).toLong)
    val tt = byV.values.map { rows =>
      val t = rows.size.toLong; t * t * t - t
    }.sum
    val tieDen = (n + 1) * n * (n - 1)
    if (tieDen <= tt) return None
    val sumTerms = groups.indices.map { i =>
      if (ng(i) > 0) r2(i).toDouble * r2(i).toDouble / ng(i).toDouble
      else 0.0
    }.reduce(_ + _)
    val nD = n.toDouble
    val hRaw = 3.0 * sumTerms / (nD * (nD + 1.0)) - 3.0 * (nD + 1.0)
    Some(hRaw / (1.0 - tt.toDouble / tieDen.toDouble))
  }

  test("kruskalWallis == the scalar replica; separated groups reject") {
    val gs = Seq("a", "b", "c")
    // ties across and within groups; c clearly shifted
    val data = Seq(
      "a" -> 10L, "a" -> 12L, "a" -> 12L, "a" -> 15L, "a" -> 18L,
      "b" -> 11L, "b" -> 12L, "b" -> 14L, "b" -> 15L, "b" -> 15L,
      "c" -> 40L, "c" -> 41L, "c" -> 41L, "c" -> 45L, "c" -> 50L)
    val out = ExperimentOps.kruskalWallis(
      data.toDF("g", "v"), col("g"), col("v"), gs,
      ExperimentOps.Chi2Crit2Df).collect().head
    assert(out.getAs[Long]("k") == 3L && out.getAs[Long]("n") == 15L)
    assert(out.getAs[Double]("h") == kwScalar(data, gs).get,
      "H must be the exact IEEE chain")
    assert(out.getAs[Int]("significant") == 1, "planted shift must reject")
  }

  test("kruskalWallis: all-tied NULL; empty listed group drops k and " +
    "guards significance; layout-invariant") {
    val tied = Seq("a" -> 5L, "b" -> 5L, "a" -> 5L, "b" -> 5L).toDF("g", "v")
    val rt = ExperimentOps.kruskalWallis(
      tied, col("g"), col("v"), Seq("a", "b"),
      ExperimentOps.Chi2Crit2Df).collect().head
    assert(rt.isNullAt(rt.fieldIndex("h")), "all values tied: NULL H")

    val data = Seq("a" -> 1L, "a" -> 3L, "b" -> 2L, "b" -> 9L)
    val re = ExperimentOps.kruskalWallis(
      data.toDF("g", "v"), col("g"), col("v"), Seq("a", "b", "zzz"),
      ExperimentOps.Chi2Crit2Df).collect().head
    assert(re.getAs[Long]("k") == 2L)
    assert(!re.isNullAt(re.fieldIndex("h")), "H over the populated groups")
    assert(re.isNullAt(re.fieldIndex("significant")),
      "df shifted: the literal critical value no longer applies")

    val big = (0 until 400).map(i => (s"g${i % 3}", (i * 7 % 23).toLong))
    val one = ExperimentOps.kruskalWallis(
      spark.createDataFrame(big).toDF("g", "v").repartition(1),
      col("g"), col("v"), Seq("g0", "g1", "g2"),
      ExperimentOps.Chi2Crit2Df).collect().head
    val eight = ExperimentOps.kruskalWallis(
      spark.createDataFrame(big).toDF("g", "v").repartition(8),
      col("g"), col("v"), Seq("g0", "g1", "g2"),
      ExperimentOps.Chi2Crit2Df).collect().head
    assert(one == eight, "layout must not change any output bit")
  }

  test("kendallTauB == the brute-force pair count") {
    val levels = Seq("lo", "mid", "hi")
    val rnk = levels.zipWithIndex.toMap
    val data = Seq(
      ("lo", 5L), ("lo", 9L), ("lo", 9L), ("mid", 9L), ("mid", 12L),
      ("mid", 3L), ("hi", 14L), ("hi", 12L), ("hi", 2L), ("hi", 14L))
    val out = ExperimentOps.kendallTauB(
      data.toDF("g", "v"), col("v"), col("g"), levels).collect().head
    // brute force over unordered pairs
    var (p, q, tx2, ty2) = (0L, 0L, 0L, 0L)
    for (i <- data.indices; j <- data.indices if i < j) {
      val dv = data(i)._2.compare(data(j)._2)
      val dg = rnk(data(i)._1).compare(rnk(data(j)._1))
      if (dv == 0) tx2 += 2
      if (dg == 0) ty2 += 2
      if (dv * dg > 0) p += 1
      if (dv * dg < 0) q += 1
    }
    assert(out.getAs[Long]("n") == data.size.toLong)
    assert(out.getAs[Long]("p_conc") == p, "concordant pairs")
    assert(out.getAs[Long]("q_disc") == q, "discordant pairs")
    assert(out.getAs[Long]("tx2") == tx2 && out.getAs[Long]("ty2") == ty2)
    val n = data.size.toLong
    val pairs2 = n * (n - 1)
    val tau = 2.0 * (p - q).toDouble /
      math.sqrt((pairs2 - tx2).toDouble * (pairs2 - ty2).toDouble)
    assert(out.getAs[Double]("tau_b") == tau, "exact IEEE chain")
    val gm = if (p >= q) 1000000L * (p - q) / (p + q)
    else -(1000000L * (q - p) / (p + q))
    assert(out.getAs[Long]("gamma_micro") == gm)
  }

  test("kendallTauB: perfect concordance tau 1; gamma sign split exact " +
    "on a discordance-heavy fixture") {
    val levels = Seq("l0", "l1", "l2")
    val perf = Seq(("l0", 1L), ("l1", 2L), ("l2", 3L)).toDF("g", "v")
    val rp = ExperimentOps.kendallTauB(
      perf, col("v"), col("g"), levels).collect().head
    assert(rp.getAs[Double]("tau_b") == 1.0)
    assert(rp.getAs[Long]("gamma_micro") == 1000000L)
    // 2 discordant, 1 concordant: gamma = -1/3 -> truncation toward zero
    val disc = Seq(("l0", 3L), ("l1", 2L), ("l2", 1L), ("l2", 4L))
      .toDF("g", "v")
    val rd = ExperimentOps.kendallTauB(
      disc, col("v"), col("g"), levels).collect().head
    val (p, q) = (rd.getAs[Long]("p_conc"), rd.getAs[Long]("q_disc"))
    assert(q > p, "fixture must be discordance-heavy")
    assert(rd.getAs[Long]("gamma_micro") ==
      -(1000000L * (q - p) / (p + q)),
      "negative gamma must truncate toward zero via the sign split")
  }

  test("mcnemar: hand-counted discordant cells; agreement gives NULL") {
    // rows: (model1 correct, model2 correct)
    val data = Seq(
      (true, true), (true, true), (true, false), (true, false),
      (true, false), (false, true), (false, false))
    val out = ExperimentOps.mcnemar(
      data.toDF("r1", "r2"), col("r1"), col("r2")).collect().head
    assert(out.getAs[Long]("n") == 7L)
    assert(out.getAs[Long]("b_only") == 3L && out.getAs[Long]("c_only") == 1L)
    assert(out.getAs[Double]("chi2") == (2.0 * 2.0) / 4.0)
    assert(out.getAs[Int]("significant") == 0)

    val agree = Seq((true, true), (false, false)).toDF("r1", "r2")
    val ra = ExperimentOps.mcnemar(agree, col("r1"), col("r2")).collect().head
    assert(ra.isNullAt(ra.fieldIndex("chi2")), "no discordance: NULL")
  }

  test("cochranQ == the scalar replica; constant treatments give NULL") {
    val data = Seq( // (t0, t1, t2) judgments per row
      (1L, 1L, 0L), (1L, 0L, 0L), (1L, 1L, 1L), (0L, 0L, 0L),
      (1L, 0L, 0L), (1L, 1L, 0L), (0L, 1L, 0L), (1L, 0L, 1L))
    val out = ExperimentOps.cochranQ(
      data.toDF("t0", "t1", "t2"),
      Seq("a" -> col("t0"), "b" -> col("t1"), "c" -> col("t2")),
      ExperimentOps.Chi2Crit2Df).collect().head
    val g = Seq(data.map(_._1).sum, data.map(_._2).sum, data.map(_._3).sum)
    val ls = data.map(r => r._1 + r._2 + r._3)
    assert(out.getAs[Long]("n_a") == g(0) && out.getAs[Long]("n_b") == g(1) &&
      out.getAs[Long]("n_c") == g(2))
    val sumG2 = g.map(x => x.toDouble * x.toDouble).reduce(_ + _)
    val (sl, sl2) = (ls.sum.toDouble, ls.map(l => l * l).sum.toDouble)
    val qs = 2.0 * (3.0 * sumG2 - sl * sl) / (3.0 * sl - sl2)
    assert(out.getAs[Double]("q_stat") == qs, "exact IEEE chain")

    val const = Seq((1L, 1L, 1L), (1L, 1L, 1L)).toDF("t0", "t1", "t2")
    val rc = ExperimentOps.cochranQ(const,
      Seq("a" -> col("t0"), "b" -> col("t1"), "c" -> col("t2")),
      ExperimentOps.Chi2Crit2Df).collect().head
    assert(rc.isNullAt(rc.fieldIndex("q_stat")),
      "all rows pass everything: zero denominator, NULL Q")
  }

  test("runsTest: hand-counted runs; bucket width never changes a bit " +
    "(the two-phase boundary correction)") {
    // F F T T T F T F -> 5 runs, boundaries at 2,5,6,7
    val flags = Seq(false, false, true, true, true, false, true, false)
    val df = flags.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("s", "f")
    for (w <- Seq(1L, 2L, 3L, 4096L)) {
      val out = ExperimentOps.runsTest(df, col("s"), col("f"), w)
        .collect().head
      assert(out.getAs[Long]("runs") == 5L, s"width $w")
      assert(out.getAs[Long]("n1") == 4L && out.getAs[Long]("n0") == 4L)
      val (n, n1, n0, r) = (8L, 4L, 4L, 5L)
      val a = 2L * n1 * n0
      val d = r * n - n - a
      val z2 = (d.toDouble * d.toDouble) * (n - 1).toDouble /
        (a.toDouble * (a - n).toDouble)
      assert(out.getAs[Double]("z2") == z2, s"exact chain, width $w")
    }
    // single-flag sequence: no variance, NULL z2
    val mono = (0L until 6L).map(i => (i, true)).toDF("s", "f")
    val rm = ExperimentOps.runsTest(mono, col("s"), col("f")).collect().head
    assert(rm.getAs[Long]("runs") == 1L)
    assert(rm.isNullAt(rm.fieldIndex("z2")))
  }

  test("simpsonParadox: the classic engineered reversal flags; uniform " +
    "mix does not; empty arms census as undefined") {
    // textbook: A beats B inside BOTH strata, but B concentrates in the
    // easy stratum and wins pooled.
    // s1: A 9/10, B 80/100 -> A better. s2: A 30/100, B 2/10 -> A better.
    // pooled: A 39/110 (0.35) vs B 82/110 (0.75) -> B better. paradox.
    def rows(s: String, a: Boolean, conv: Int, n: Int) =
      Seq.fill(n)((s, a, true)).take(conv) ++
        Seq.fill(n - conv)((s, a, false))
    val data = rows("s1", true, 9, 10) ++ rows("s1", false, 80, 100) ++
      rows("s2", true, 30, 100) ++ rows("s2", false, 2, 10)
    val out = ExperimentOps.simpsonParadox(
      data.toDF("s", "a", "y"), col("s"), col("a"), col("y"))
      .collect().head
    assert(out.getAs[Long]("n_strata") == 2L)
    assert(out.getAs[Long]("pooled_dir") == -1L, "B wins pooled")
    assert(out.getAs[Long]("n_with") == 0L &&
      out.getAs[Long]("n_against") == 2L)
    assert(out.getAs[Int]("paradox") == 1)

    // balanced mix: pooled agrees with the strata, no flag
    val ok = rows("s1", true, 9, 10) ++ rows("s1", false, 5, 10) ++
      rows("s2", true, 6, 10) ++ rows("s2", false, 2, 10)
    val ro = ExperimentOps.simpsonParadox(
      ok.toDF("s", "a", "y"), col("s"), col("a"), col("y")).collect().head
    assert(ro.getAs[Long]("pooled_dir") == 1L &&
      ro.getAs[Int]("paradox") == 0 && ro.getAs[Long]("n_with") == 2L)

    // a stratum with one empty arm is censored, not a direction
    val mixed = ok ++ rows("s3", true, 3, 5)
    val rm = ExperimentOps.simpsonParadox(
      mixed.toDF("s", "a", "y"), col("s"), col("a"), col("y"))
      .collect().head
    assert(rm.getAs[Long]("n_undef") == 1L &&
      rm.getAs[Long]("n_strata") == 3L)
  }

  test("liftGains == the brute-force threshold sweep") {
    val data = Seq( // (label, score)
      (true, 9L), (false, 9L), (true, 7L), (true, 7L), (false, 5L),
      (false, 5L), (false, 5L), (true, 3L), (false, 3L), (false, 1L))
    val out = ExperimentOps.liftGains(
      data.toDF("y", "v"), col("y"), col("v"))
      .collect().map(r => r.getAs[Long]("score") -> r).toMap
    val (totP, tot) = (data.count(_._1).toLong, data.size.toLong)
    data.map(_._2).distinct.foreach { thr =>
      val sel = data.filter(_._2 >= thr)
      val (nGe, posGe) = (sel.size.toLong, sel.count(_._1).toLong)
      val r = out(thr)
      assert(r.getAs[Long]("n_ge") == nGe && r.getAs[Long]("pos_ge") == posGe)
      assert(r.getAs[Long]("depth_micro") == 1000000L * nGe / tot)
      assert(r.getAs[Long]("precision_micro") == 1000000L * posGe / nGe)
      assert(r.getAs[Long]("recall_micro") == 1000000L * posGe / totP)
      assert(r.getAs[Double]("lift") ==
        (posGe.toDouble / nGe.toDouble) / (totP.toDouble / tot.toDouble))
    }
    assert(out.size == data.map(_._2).distinct.size)
  }
}
