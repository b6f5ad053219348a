package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SurvivalOps]]: hand-computed Kaplan-Meier life tables, brute-force
  * scalar differentials for the log-rank terms and the sequential
  * monitor, DiD algebra, censoring/extinction edges, and the
  * partition-count invariance that certifies the two-phase prefix scans
  * merge correctly.
  */
class SurvivalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(Long, Long)], parts: Int = 4): Array[org.apache.spark.sql.Row] =
    SurvivalOps.kmLifeTable(
      rows.toDF("dur", "ev").repartition(parts), col("dur"), col("ev"))
      .orderBy("t").collect()

  // classic textbook fixture: durations (1,e) (2,e) (2,c) (3,e) (4,c)
  private val classic = Seq(1L -> 1L, 2L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L)

  test("kmLifeTable: hand-computed life table (risk sets, deaths, censors, hazard)") {
    val r = km(classic)
    // t, n_risk, d, c
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq ===
      Seq((1L, 5L, 1L, 0L), (2L, 4L, 1L, 1L), (3L, 2L, 1L, 0L), (4L, 1L, 0L, 1L)))
    // hazard_micro = d*1e6 div n_risk; cumhaz = Nelson-Aalen prefix
    assert(r.map(_.getLong(4)).toSeq === Seq(200000L, 250000L, 500000L, 0L))
    assert(r.map(_.getLong(5)).toSeq === Seq(200000L, 450000L, 950000L, 950000L))
  }

  test("kmLifeTable: km_log2fx tracks log2 of the true KM product within fixed-point slack") {
    val r = km(classic)
    // S(t): 4/5, 4/5*3/4=3/5, 3/5*1/2=3/10, unchanged at censor-only t=4
    val s = Seq(0.8, 0.6, 0.3, 0.3)
    r.zip(s).foreach { case (row, surv) =>
      val expected = math.log(surv) / math.log(2.0) * (1 << 20)
      val got = row.getLong(6).toDouble
      // each Log2Fixed is round-down with error < 2^-20; k summed terms
      // keep the difference within a few fixed-point units
      assert(math.abs(got - expected) <= 8.0,
        s"t=${row.getLong(0)}: got $got expected ~$expected")
      assert(row.getInt(7) === 0)
    }
  }

  test("kmLifeTable: extinction nulls the log-survival from the first total-death time") {
    // everyone at risk dies at t=2: S(2)=0, log undefined
    val r = km(Seq(1L -> 1L, 2L -> 1L, 2L -> 1L))
    val at1 = r.find(_.getLong(0) == 1L).get
    assert(at1.getInt(7) === 0 && !at1.isNullAt(6))
    val at2 = r.find(_.getLong(0) == 2L).get
    assert(at2.getInt(7) === 1 && at2.isNullAt(6))
    // Nelson-Aalen stays defined through extinction: 1e6/3 + 1e6
    assert(at2.getLong(5) === 333333L + 1000000L)
  }

  test("kmLifeTable: no events at all (all censored) keeps survival at 1") {
    val r = km(Seq(3L -> 0L, 5L -> 0L))
    assert(r.forall(_.getLong(2) == 0L))
    assert(r.forall(_.getLong(5) == 0L)) // zero hazard accumulates to zero
    assert(r.forall(_.getLong(6) == 0L)) // log2(1) = 0
  }

  test("kmLifeTable: partition-count invariance (1 vs 16 partitions)") {
    val rows = (1 to 400).map(i => ((i % 23).toLong, (i % 3 == 0).compare(false).toLong))
    assert(km(rows, 1).map(_.toSeq).toSeq === km(rows, 16).map(_.toSeq).toSeq)
  }

  test("logRankTerms: brute-force scalar differential") {
    val rows = (1 to 300).map { i =>
      (((i * 7) % 19).toLong, (i % 4 != 0).compare(false).toLong, i % 2 == 0)
    }
    val got = SurvivalOps.logRankTerms(
      rows.toDF("dur", "ev", "a").repartition(8),
      col("dur"), col("ev"), col("a"))
      .orderBy("t").collect()
    // scalar replay
    val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var expected = Vector.empty[(Long, Long, Long, Long, Long, Double, Double)]
    for ((t, grp) <- byT) {
      val n = rows.count(_._1 >= t).toLong
      val nA = rows.count(r => r._1 >= t && r._3).toLong
      val d = grp.count(_._2 == 1L).toLong
      val dA = grp.count(r => r._2 == 1L && r._3).toLong
      if (d > 0) {
        val oe = dA.toDouble - d.toDouble * nA.toDouble / n.toDouble
        val vr = d.toDouble * (n - d).toDouble * nA.toDouble * (n - nA).toDouble /
          (n.toDouble * n.toDouble * (n - 1).toDouble)
        expected :+= ((t, n, nA, d, dA, oe, vr))
      }
    }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (row, (t, n, nA, d, dA, oe, vr)) =>
      assert(row.getLong(0) === t)
      assert(row.getLong(1) === n)
      assert(row.getLong(2) === nA)
      assert(row.getLong(3) === d)
      assert(row.getLong(4) === dA)
      assert(row.getDouble(5) === oe) // identical fixed IEEE chain
      assert(row.getDouble(6) === vr)
    }
  }

  test("logRankTerms: identical groups give zero O-E in aggregate") {
    // perfectly mirrored arms: every (dur, ev) appears once per arm
    val rows = (1 to 50).flatMap(i =>
      Seq(((i % 11).toLong, 1L, true), ((i % 11).toLong, 1L, false)))
    val terms = SurvivalOps.logRankTerms(
      rows.toDF("dur", "ev", "a"), col("dur"), col("ev"), col("a")).collect()
    terms.foreach(r => assert(math.abs(r.getDouble(5)) < 1e-12))
  }

  test("seqMonitor: brute-force per-look counts and z2; monotone filtration") {
    val units = (1L to 200L).map { id =>
      val entry = id % 20
      val conv = if (id % 3 == 0) Some(entry + id % 9) else None
      (id, entry, conv)
    }
    val df = units.map { case (id, e, c) => (id, e, c.map(Long.box).orNull) }
      .toDF("id", "entry", "conv")
      .select(col("id"), col("entry"), col("conv").cast("long").as("conv"))
    val looks = Seq(5L, 10L, 15L)
    val got = SurvivalOps.seqMonitor(
      df, col("id"), col("entry"), col("conv"), looks)
      .orderBy("look").collect()
    assert(got.map(_.getLong(0)).toSeq === looks)
    def armOf(id: Long): Long = {
      val p = 999999937L
      (((id % p) * 2654435761L + 104729L) % p + p) % p % 2
    }
    for ((row, look) <- got.zip(looks)) {
      val in = units.filter(_._2 <= look)
      val nA = in.count(u => armOf(u._1) == 0).toLong
      val nB = in.count(u => armOf(u._1) == 1).toLong
      val xA = in.count(u => armOf(u._1) == 0 && u._3.exists(_ <= look)).toLong
      val xB = in.count(u => armOf(u._1) == 1 && u._3.exists(_ <= look)).toLong
      assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ===
        ((nA, xA, nB, xB)))
      val ra = xA.toDouble / nA.toDouble
      val rb = xB.toDouble / nB.toDouble
      val pool = (xA + xB).toDouble / (nA + nB).toDouble
      val z2 = (ra - rb) * (ra - rb) /
        (pool * (1.0 - pool) * (1.0 / nA.toDouble + 1.0 / nB.toDouble))
      assert(row.getDouble(5) === z2)
    }
    // cumulative filtration: denominators and conversions never shrink
    val ns = got.map(r => r.getLong(1) + r.getLong(3))
    val xs = got.map(r => r.getLong(2) + r.getLong(4))
    assert(ns.sorted.toSeq === ns.toSeq)
    assert(xs.sorted.toSeq === xs.toSeq)
  }

  test("seqMonitor: stop_look is the first crossing look on every row") {
    // force a crossing: arm decides conversion deterministically
    val units = (1L to 400L).map(id => (id, 0L, Some(0L).filter(_ => {
      val p = 999999937L
      ((id % p) * 2654435761L + 104729L) % p % 2 == 0
    })))
    val df = units.map { case (id, e, c) => (id, e, c.map(Long.box).orNull) }
      .toDF("id", "entry", "conv")
      .select(col("id"), col("entry"), col("conv").cast("long").as("conv"))
    val got = SurvivalOps.seqMonitor(
      df, col("id"), col("entry"), col("conv"), Seq(1L, 2L))
      .orderBy("look").collect()
    assert(got.forall(_.getInt(6) == 1))
    assert(got.forall(_.getLong(7) == 1L))
  }

  test("did: hand-computed two-by-two panel") {
    // treat: pre mean 10, post mean 30 (delta 20)
    // control: pre mean 5, post mean 15 (delta 10) -> did = 10
    val cells = Seq(
      (true, false, 10L), (true, false, 10L),
      (true, true, 30L), (true, true, 30L),
      (false, false, 5L), (false, true, 15L))
    val r = SurvivalOps.did(
      cells.toDF("tr", "po", "y"), col("tr"), col("po"), col("y"))
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 20L) // n_t_pre, s_t_pre
    assert(r.getDouble(8) === 10.0 && r.getDouble(9) === 30.0)
    assert(r.getDouble(10) === 5.0 && r.getDouble(11) === 15.0)
    assert(r.getDouble(12) === 10.0)
  }

  test("did: empty cell yields NULL effect, never a division error") {
    val cells = Seq((true, false, 10L), (true, true, 30L), (false, false, 5L))
    val r = SurvivalOps.did(
      cells.toDF("tr", "po", "y"), col("tr"), col("po"), col("y"))
      .collect().head
    assert(r.getLong(6) === 0L) // n_c_post
    assert(r.isNullAt(11) && r.isNullAt(12))
  }

  test("kmLifeTable risk sets are consistent: n_risk telescopes by cnt") {
    val rows = (1 to 500).map(i => ((i % 37).toLong, (i % 2).toLong))
    val r = km(rows, 8)
    // n_risk(t_{i+1}) = n_risk(t_i) - (d_i + c_i)
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) === a.getLong(1) - a.getLong(2) - a.getLong(3))
      case _ =>
    }
    assert(r.head.getLong(1) === 500L)
  }
}
