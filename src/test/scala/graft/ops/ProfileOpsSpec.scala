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

  test("madOutliers: hand-computed median/MAD, robust to one wild value") {
    // group g: values 10,11,12,13,14 and one wild 10000 (cents)
    val df = Seq(("g", 10L), ("g", 11L), ("g", 12L), ("g", 13L), ("g", 14L),
      ("g", 10000L), ("h", 5L), ("h", 5L))
      .toDF("k", "c")
    val out = ProfileOps.madOutliers(df, $"k", $"c").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    // g: sorted 10,11,12,13,14,10000 -> med = 12.5; deviations
    // 2.5,1.5,0.5,0.5,1.5,9987.5 -> sorted 0.5,0.5,1.5,1.5,2.5,9987.5,
    // MAD = 1.5; outliers: dev*10000 > 1.5*44780 = 67170 -> dev > 6.717:
    // only the wild point. The mean/std rule would have flagged nothing
    // (std ~ 4076 swallows every deviation).
    assert(out("g") == ((6L, 12.5, 1.5, 1L)))
    // h: constant group -> MAD 0, nothing beats a zero threshold strictly
    // except nonzero deviations; here all deviations are 0 -> no outliers
    assert(out("h") == ((2L, 5.0, 0.0, 0L)))
  }

  test("madOutliers is layout-invariant") {
    val df = (1L to 5000L).map(i => (s"t${i % 3}", (i * 7919) % 100000))
      .toDF("k", "c")
    val a = ProfileOps.madOutliers(df, $"k", $"c").collect().toSet
    val b = ProfileOps.madOutliers(df.repartition(17), $"k", $"c").collect().toSet
    assert(a == b)
  }

  test("skewReport: hand-computed percentiles, hot keys, nulls dropped") {
    import spark.implicits._
    // key 1: 60 rows (the hot key); keys 2..10: 4 rows each; one null key
    val rows = (1 to 60).map(_ => Option(1L)) ++
      (2L to 10L).flatMap(k => Seq.fill(4)(Option(k))) ++ Seq(None)
    val df = rows.map(k => (k, "x")).toDF("k", "payload")
    val got = ProfileOps.skewReport(df, col("k"), topK = 3).collect().head
    // 10 keys, 96 rows (null dropped), max 60; ranked counts ascending =
    // nine 4s then 60: p50 = rank 5 -> 4, p99 = rank ceil(9.9)=10 -> 60
    assert(got.getLong(0) == 10L && got.getLong(1) == 96L)
    assert(got.getLong(2) == 60L && got.getLong(3) == 4L && got.getLong(4) == 60L)
    assert(got.getLong(5) == 15L) // skew ratio 60 div 4
    // hottest first; count ties resolve to the greater key
    assert(got.getString(6) == "1:60,10:4,9:4")
    // layout invariance
    val again = ProfileOps.skewReport(df.repartition(13), col("k"), topK = 3)
      .collect().head
    assert(again.toSeq == got.toSeq)
  }

  test("chiSquareCells: hand-computed 2x2 table; independent table scores 0 terms") {
    import spark.implicits._
    // observed: (a1,b1)=10 (a1,b2)=10 (a2,b1)=10 (a2,b2)=30; N=60
    val rows = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val df = rows.toDF("a", "b")
    val got = ProfileOps.chiSquareCells(df, col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // margins: r(a1)=20 r(a2)=40 c(b1)=20 c(b2)=40
    // e(a1,b1) = 20*20/60; term = (10*60 - 20*20)^2 / (60*20*20)
    assert(got(("a1", "b1")) ==
      ((10L, 400.0 / 60.0, (200.0 * 200.0) / 24000.0)))
    assert(got(("a2", "b2")) ==
      ((30L, 1600.0 / 60.0, (200.0 * 200.0) / 96000.0)))
    // perfectly independent table: every term exactly 0
    val ind = (Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(40)(("y", "q"))).toDF("a", "b")
    val terms = ProfileOps.chiSquareCells(ind, col("a"), col("b"))
      .collect().map(_.getDouble(4))
    assert(terms.length == 4 && terms.forall(_ == 0.0))
  }

  test("bucketDrift: hand case with clamped tails; fractions exact") {
    import spark.implicits._
    // boundaries [10, 20] -> buckets: <10, [10,20), >=20
    val df = Seq(
      (true, 5L), (true, 5L), (true, 15L), (true, 25L),   // base: 2/1/1
      (false, 15L), (false, 15L), (false, 25L), (false, 99L)) // cur: 0/2/2
      .toDF("b", "x")
    val got = ProfileOps.bucketDrift(df, col("b"), col("x"), Seq(10.0, 20.0))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(0L) == ((2L, 0L, 0.5, 0.0, -0.5)), s"got $got")
    assert(got(1L) == ((1L, 2L, 0.25, 0.5, 0.25)))
    assert(got(2L) == ((1L, 2L, 0.25, 0.5, 0.25)))
    // layout invariance
    val re = ProfileOps.bucketDrift(df.repartition(5), col("b"), col("x"),
      Seq(10.0, 20.0)).collect().map(_.toSeq).toSet
    assert(re == ProfileOps.bucketDrift(df, col("b"), col("x"),
      Seq(10.0, 20.0)).collect().map(_.toSeq).toSet)
  }

  test("corrByGroup: perfect linear +1/-1, known mid value, degenerate NULL") {
    import spark.implicits._
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),      // y = 10x -> r=1
      ("dn", 1L, 6L), ("dn", 2L, 4L), ("dn", 3L, 2L),         // y = 8-2x -> r=-1
      ("mid", 1L, 1L), ("mid", 2L, 3L), ("mid", 3L, 2L),      // known hand value
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L))   // var(y)=0 -> NULL
      .toDF("g", "x", "y")
    val got = ProfileOps.corrByGroup(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))))
      .toMap
    assert(got("up") == ((3L, 1.0)))
    assert(got("dn") == ((3L, -1.0)))
    // mid: n=3 sx=6 sy=6 sxy=13 sxx=14 syy=14 -> r = 3/6 = 0.5
    assert(got("mid") == ((3L, 0.5)))
    assert(got("flat")._2.isNaN)
    // layout invariance: integer sums merge in any order
    val re = ProfileOps.corrByGroup(df.repartition(7), col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(re.toSeq.sortBy(_._1).toString ==
      got.map { case (k, v) => k -> v._2 }.toSeq.sortBy(_._1).toString)
  }

  test("giniByGroup: uniform 0, single-holder (n-1)/n, zero-total NULL; layout-invariant") {
    import spark.implicits._
    val df = (Seq.fill(4)(("u", 5L)) ++
      Seq(("c", 0L), ("c", 0L), ("c", 0L), ("c", 12L)) ++
      Seq(("z", 0L), ("z", 0L))).toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      ProfileOps.giniByGroup(d, col("g"), col("x"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    val got = run(df)
    assert(got("u") == ((4L, 20L, 0.0)), s"got $got")
    assert(got("c") == ((4L, 12L, 0.75))) // (2*48 - 5*12)/(4*12)
    assert(got("z")._3.isNaN) // undefined concentration -> NULL
    assert(run(df.repartition(7)).toSeq.sortBy(_._1).map(_.toString) ==
      got.toSeq.sortBy(_._1).map(_.toString))
  }

  test("cohenKappa: hand-computed cells, po/pe/kappa exact") {
    import spark.implicits._
    // cells: n11=4, n10=2, n01=1, n00=3 -> n=10, po=0.7,
    // a1=6, b1=5, chance=6*5+4*5=50, pe=0.5, kappa=(7-5)/(10-5)=0.4
    val rows = Seq.fill(4)((1L, 1L)) ++ Seq.fill(2)((1L, 0L)) ++
      Seq.fill(1)((0L, 1L)) ++ Seq.fill(3)((0L, 0L))
    val out = ProfileOps.cohenKappa(
      rows.toDF("a", "b"), col("a"), col("b")).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4)) == ((10L, 4L, 2L, 1L, 3L)))
    assert(out.getDouble(5) == 0.7 && out.getDouble(6) == 0.5)
    assert(out.getDouble(7) == 0.4)
  }

  test("cohenKappa: perfect agreement is 1; constant raters give NULL") {
    import spark.implicits._
    val perfect = ProfileOps.cohenKappa(
      Seq((1L, 1L), (0L, 0L), (1L, 1L)).toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert(perfect.getDouble(7) == 1.0)

    val constant = ProfileOps.cohenKappa(
      Seq((1L, 1L), (1L, 1L)).toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert(constant.isNullAt(7), "pe = 1 must yield NULL kappa")

    val empty = ProfileOps.cohenKappa(
      Seq.empty[(Long, Long)].toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(5) &&
      empty.isNullAt(6) && empty.isNullAt(7))
  }

  test("cohenKappa: out-of-domain rater values raise") {
    import spark.implicits._
    val ex = intercept[Exception] {
      ProfileOps.cohenKappa(
        Seq((1L, 2L)).toDF("a", "b"), col("a"), col("b")).collect()
    }
    assert(ex.getMessage.contains("outside {0,1}"))
  }

  test("cohenKappa: NULL rater rows are abstentions, dropped from both marginals") {
    import spark.implicits._
    val rows = Seq((Some(1L), Some(1L)), (Some(0L), Some(0L)),
      (None, Some(1L)), (Some(1L), None), (None, None))
    val out = ProfileOps.cohenKappa(
      rows.toDF("a", "b"), col("a"), col("b")).collect().head
    assert(out.getLong(0) == 2L, "only pairwise-complete rows count")
    assert(out.getLong(1) == 1L && out.getLong(4) == 1L)
    assert(out.getDouble(7) == 1.0)
  }

  test("concentration: uniform, dominated, and single-group cases exact") {
    import spark.implicits._
    // 4 equal groups: shares 250000 -> hhi = 4*250000^2/1e6 = 250000;
    // effective = 1e12/250000 = 4e6 micro = 4.0 groups
    val unif = (1 to 100).map(i => s"g${i % 4}").toDF("g")
    val u = ProfileOps.concentration(unif, col("g")).collect().head
    assert(u.getAs[Long]("n_units") == 100L && u.getAs[Long]("n_groups") == 4L)
    assert(u.getAs[Long]("hhi_micro") == 250000L)
    assert(u.getAs[Long]("effective_groups_micro") == 4000000L)
    // single group: hhi = 1e6, effective exactly 1.0
    val one = (1 to 7).map(_ => "only").toDF("g")
    val o = ProfileOps.concentration(one, col("g")).collect().head
    assert(o.getAs[Long]("hhi_micro") == 1000000L)
    assert(o.getAs[Long]("effective_groups_micro") == 1000000L)
    // dominated: 97/100 in one group -> hhi near 1e6, effective < 1.07
    val dom = ((1 to 97).map(_ => "big") ++ Seq("a", "b", "c")).toDF("g")
    val d = ProfileOps.concentration(dom, col("g")).collect().head
    assert(d.getAs[Long]("hhi_micro") > 900000L)
    assert(d.getAs[Long]("effective_groups_micro") < 1070000L)
  }

  test("fleissKappa3: perfect agreement = 1, hand panel matches the algebra") {
    import spark.implicits._
    val perfect = Seq((1L, 1L, 1L), (0L, 0L, 0L), (1L, 1L, 1L))
      .toDF("a", "b", "c")
    val p = ProfileOps.fleissKappa3(perfect, col("a"), col("b"), col("c"))
      .collect().head
    assert(p.getAs[Double]("kappa") == 1.0)
    // hand panel: c = 3, 2, 1, 0 -> c²+(3−c)²−3 = 6, 2, 2, 6 -> A = 16,
    // S = 6, N = 4
    val mixed = Seq((1L, 1L, 1L), (1L, 1L, 0L), (1L, 0L, 0L), (0L, 0L, 0L))
      .toDF("a", "b", "c")
    val m = ProfileOps.fleissKappa3(mixed, col("a"), col("b"), col("c"))
      .collect().head
    assert(m.getAs[Long]("n_items") == 4L)
    assert(m.getAs[Long]("s_sum") == 6L)
    assert(m.getAs[Long]("a_sum") == 16L)
    // num = 3·4·16 − 2·(36+36) = 192 − 144 = 48; den = 18·16 − 144 = 144
    assert(m.getAs[Double]("kappa") == 48.0 / 144.0)
  }

  test("fleissKappa3: degenerate all-identical panel -> NULL kappa; domain guard fires") {
    import spark.implicits._
    val allPos = Seq((1L, 1L, 1L), (1L, 1L, 1L)).toDF("a", "b", "c")
    val row = ProfileOps.fleissKappa3(allPos, col("a"), col("b"), col("c"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("kappa")),
      "P_e = 1 must yield NULL, not a division blow-up")
    val bad = Seq((1L, 2L, 0L)).toDF("a", "b", "c")
    val ex = intercept[Exception] {
      ProfileOps.fleissKappa3(bad, col("a"), col("b"), col("c")).collect()
    }
    assert(ex.getMessage.contains("outside {0,1}"))
  }

  // ------------------------------------------------- weighted median

  /** Scalar lower weighted median: smallest v with 2·cum(v) >= W. */
  private def scalarWMedian(vw: Seq[(Long, Long)]): Long = {
    val byV = vw.filter(_._2 > 0).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val total = byV.map(_._2).sum
    var cum = 0L
    byV.collectFirst {
      case (v, w) if { cum += w; 2 * cum >= total } => v
    }.get
  }

  test("weightedMedianByGroup: hand cases (skewed weights, even split, single value)") {
    val df = Seq(
      // group A: value 1 carries 9/10 of the weight -> median 1
      ("A", 1L, 9L), ("A", 100L, 1L),
      // group B: exact half at value 2 (2*cum == W at v=2) -> lower median 2
      ("B", 2L, 1L), ("B", 5L, 1L),
      // group C: one value
      ("C", 7L, 3L)).toDF("g", "v", "w")
    val got = ProfileOps.weightedMedianByGroup(
      df, col("g"), col("v"), col("w"))
      .orderBy("group").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("A", 1L, 10L), ("B", 2L, 2L), ("C", 7L, 3L)))
  }

  test("weightedMedianByGroup: brute-force differential; zero/negative weights excluded") {
    val rows = for (g <- Seq("x", "y", "z"); i <- 1 to 200) yield
      (g, ((i * 31 + g.hashCode.abs) % 43).toLong, (i % 7).toLong - 1L)
    val got = ProfileOps.weightedMedianByGroup(
      rows.toDF("g", "v", "w").repartition(9), col("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val vw = rs.map(r => (r._2, r._3))
      assert(got(g)._1 === scalarWMedian(vw), s"group $g median")
      assert(got(g)._2 === vw.filter(_._2 > 0).map(_._2).sum, s"group $g total")
    }
  }

  test("weightedMedianByGroup: unit weights equal the plain lower median") {
    val rows = (1 to 101).map(i => ("g", ((i * 17) % 37).toLong, 1L))
    val got = ProfileOps.weightedMedianByGroup(
      rows.toDF("g", "v", "w"), col("g"), col("v"), col("w"))
      .collect().head.getLong(1)
    val sorted = rows.map(_._2).sorted
    assert(got === sorted((sorted.size - 1) / 2))
  }

  // ------------------------------------------------- Jensen-Shannon

  private def jsRows(a: Seq[String], b: Seq[String]) = {
    val docs = a.map(t => ("sa", t)) ++ b.map(t => ("sb", t))
    ProfileOps.tokenJsDivergence(
      docs.toDF("src", "text"), col("src") === "sa", col("src") === "sb")
      .collect().head
  }

  test("tokenJsDivergence: identical slices sit at ~0 bits, disjoint at ~1 bit") {
    val same = jsRows(Seq("alpha beta gamma beta"), Seq("alpha beta gamma beta"))
    assert(math.abs(same.getDouble(5)) < 1e-4, s"identical: ${same.getDouble(5)}")
    val disjoint = jsRows(Seq("alpha beta alpha beta"), Seq("gamma delta gamma delta"))
    assert(math.abs(disjoint.getDouble(5) - 1.0) < 1e-4,
      s"disjoint: ${disjoint.getDouble(5)}")
  }

  test("tokenJsDivergence: exact scalar replay of the fixed-point formula") {
    val a = Seq("the cat sat on the mat", "a cat and a dog")
    val b = Seq("the dog ran to the park", "a bird and a dog ran")
    val row = jsRows(a, b)
    // scalar replay with the same tokenizer contract (lowercase, \s+ split)
    def toks(ss: Seq[String]) = ss.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val (ta, tb) = (toks(a), toks(b))
    val vocab = (ta ++ tb).distinct
    val (na, nb) = (ta.size.toLong, tb.size.toLong)
    def l(v: Long) = SelectionOps.log2Fixed(v)
    var (sa, sb) = (0L, 0L)
    vocab.foreach { t =>
      val (ca, cb) = (ta.count(_ == t).toLong, tb.count(_ == t).toLong)
      val lm = l(ca * nb + cb * na)
      val l2 = l(2L * na * nb)
      if (ca > 0) sa += ca * ((l(ca) - l(na)) - lm + l2)
      if (cb > 0) sb += cb * ((l(cb) - l(nb)) - lm + l2)
    }
    assert(row.getLong(0) === na)
    assert(row.getLong(1) === nb)
    assert(row.getLong(2) === vocab.size.toLong)
    assert(row.getLong(3) === sa)
    assert(row.getLong(4) === sb)
    val bits = (sa.toDouble / na + sb.toDouble / nb) / 2.0 / 1048576.0
    assert(row.getDouble(5) === bits)
  }

  test("tokenJsDivergence: symmetric in its arguments") {
    val a = Seq("red green blue red")
    val b = Seq("red yellow yellow")
    val docs = (a.map(t => ("sa", t)) ++ b.map(t => ("sb", t))).toDF("src", "text")
    val ab = ProfileOps.tokenJsDivergence(
      docs, col("src") === "sa", col("src") === "sb").collect().head
    val ba = ProfileOps.tokenJsDivergence(
      docs, col("src") === "sb", col("src") === "sa").collect().head
    assert(ab.getDouble(5) === ba.getDouble(5))
  }

  test("mutualInfo == the scalar replica; independent columns give ~0") {
    import graft.ops.SelectionOps.{log2Fixed => lf}
    val rows = (1 to 400).map(i => (s"x${i % 4}", s"y${(i * 7) % 5}"))
    val df = rows.toDF("x", "y")
    val r = ProfileOps.mutualInfo(df, col("x"), col("y")).collect().head
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rm = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val mi = cells.map { case ((x, y), o) =>
      o * (lf(o * n) - lf(rm(x) * cm(y))) }.sum
    val hx = cells.map { case ((x, _), o) => o * (lf(n) - lf(rm(x))) }.sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("cells") == cells.size.toLong)
    assert(r.getAs[Long]("mi_fixed") == mi)
    assert(r.getAs[Double]("hx_bits") == hx.toDouble / n.toDouble / 1048576.0)
    // x-mod-4 vs y-mod-5 over i=1..400 is an exact product design:
    // every cell has o = n/(4*5), so MI is 0 up to fixed-point grid
    assert(math.abs(r.getAs[Double]("mi_bits")) < 1e-4)
    assert(r.getAs[Double]("nmi") < 1e-4)
    // a fully dependent pair saturates NMI to ~1
    val dep = (1 to 100).map(i => (s"x${i % 4}", s"y${i % 4}")).toDF("x", "y")
    val rd = ProfileOps.mutualInfo(dep, col("x"), col("y")).collect().head
    assert(rd.getAs[Double]("nmi") > 0.999)
  }

  test("cramersV: micro-grid fold matches scalar; perfect dependence -> 1") {
    val rows = (1 to 300).map(i => (s"a${i % 3}", s"b${(i * 11) % 4}"))
    val r = ProfileOps.cramersV(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rm = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val sMicro = cells.toSeq.map { case ((a, b), o) =>
      math.floor(o.toDouble * o.toDouble * n.toDouble /
        (rm(a).toDouble * cm(b).toDouble) * 1000000.0).toLong
    }.sum
    val chi2micro = math.max(sMicro - n * 1000000L, 0L)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("chi2_micro") == chi2micro)
    val chi2 = chi2micro.toDouble / 1000000.0
    assert(r.getAs[Double]("v") == math.sqrt(chi2 / (n * 2L).toDouble))
    // perfect dependence: the zero cells must be accounted (the raw
    // observed-cell sum alone would report sqrt(2/3) here, not 1)
    val dep = (1 to 90).map(i => (s"a${i % 3}", s"b${i % 3}")).toDF("a", "b")
    val rv = ProfileOps.cramersV(dep, col("a"), col("b")).collect().head
      .getAs[Double]("v")
    assert(rv > 0.999 && rv <= 1.0)
    // independence: truncation may land a hair under 0 -> clamped, not NaN
    val ind = (1 to 120).map(i => (s"a${i % 3}", s"b${i % 4}")).toDF("a", "b")
    val ri = ProfileOps.cramersV(ind, col("a"), col("b")).collect().head
    assert(ri.getAs[Long]("chi2_micro") == 0L)
    assert(ri.getAs[Double]("v") == 0.0)
  }

  test("woeIv == the scalar replica; separating category carries the IV") {
    import graft.ops.SelectionOps.{log2Fixed => lf}
    // c0 heavily positive, c1 heavily negative, c2 balanced
    val rows = (1 to 300).map { i =>
      val c = s"c${i % 3}"
      val y = (i % 3) match {
        case 0 => i % 10 != 0
        case 1 => i % 10 == 0
        case _ => i % 2 == 0
      }
      (c, y)
    }
    val out = ProfileOps.woeIv(rows.toDF("c", "y"), col("c"), col("y"))
      .collect().map(r => r.getAs[String]("category") -> r).toMap
    val cats = rows.groupBy(_._1)
    val k = cats.size.toLong
    val pos = cats.view.mapValues(_.count(_._2).toLong).toMap
    val neg = cats.view.mapValues(_.count(!_._2).toLong).toMap
    val tp = pos.values.sum + k
    val tn = neg.values.sum + k
    val woe = cats.keys.map { c =>
      c -> ((lf(pos(c) + 1) - lf(tp)) - (lf(neg(c) + 1) - lf(tn)))
    }.toMap
    val ivFixed = cats.keys.toSeq.map { c =>
      ((pos(c) + 1) * tn - (neg(c) + 1) * tp) * woe(c) }.sum
    cats.keys.foreach { c =>
      assert(out(c).getAs[Long]("n_pos") == pos(c), s"n_pos $c")
      assert(out(c).getAs[Long]("woe_fixed") == woe(c), s"woe $c")
      assert(out(c).getAs[Double]("iv_bits") ==
        ivFixed.toDouble / (tp * tn).toDouble / 1048576.0, s"iv $c")
    }
    // signs: c0 positive WOE, c1 negative, and the IV is clearly > 0
    assert(out("c0").getAs[Long]("woe_fixed") > 0L)
    assert(out("c1").getAs[Long]("woe_fixed") < 0L)
    assert(out("c0").getAs[Double]("iv_bits") > 0.5)
  }

  test("trimmedMeanByGroup == the sorted-slice replica; outlier-proof") {
    // g0 clean; g1 = same values plus two wild outliers per tail
    val clean = (1 to 100).map(i => ("g0", (i * 37L) % 211L))
    val dirty = (1 to 100).map(i => ("g1", (i * 37L) % 211L)) ++
      Seq(("g1", 100000L), ("g1", 99999L), ("g1", -100000L), ("g1", -99999L))
    val df = (clean ++ dirty).toDF("g", "v")
    val out = ProfileOps.trimmedMeanByGroup(df, col("g"), col("v"), 100000L)
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    def replica(xs: Seq[Long]) = {
      val n = xs.length.toLong
      val lo = n * 100000L / 1000000L
      val kept = xs.sorted.slice(lo.toInt, (n - lo).toInt)
      (n, kept.length.toLong, kept.sum,
        kept.sum.toDouble / kept.length.toDouble)
    }
    Seq("g0" -> clean, "g1" -> dirty).foreach { case (g, rows) =>
      val (n, nk, ks, tm) = replica(rows.map(_._2))
      assert(out(g).getAs[Long]("n") == n, s"n $g")
      assert(out(g).getAs[Long]("n_kept") == nk, s"n_kept $g")
      assert(out(g).getAs[Long]("kept_sum") == ks, s"kept_sum $g")
      assert(out(g).getAs[Double]("t_mean") == tm, s"t_mean $g")
    }
    // 10% trim eats all four planted outliers: the two means agree
    assert(math.abs(out("g0").getAs[Double]("t_mean") -
      out("g1").getAs[Double]("t_mean")) < 3.0)
  }

  test("huberMeanByGroup == the scalar IRLS replay; outliers downweighted") {
    val base = (1 to 80).map(i => ("g", 1000L + (i * 13L) % 101L))
    val rows = base ++ Seq(("g", 1000000L), ("g", -1000000L), ("g", 900000L))
    val df = rows.toDF("g", "v")
    val k = 200L
    val r = ProfileOps.huberMeanByGroup(df, col("g"), col("v"), k, iters = 2)
      .collect().head
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    def refit(xs: Seq[Long], mu: Long): (Long, Long) = {
      val ws = xs.map { x =>
        val dev = math.abs(x - mu)
        if (dev <= k) 1000000L else (k * 1000000L) / dev
      }
      val wx = xs.zip(ws).map { case (x, w) => w * x }.sum
      val sw = ws.sum
      val m = if (wx >= 0) wx / sw else -((-wx) / sw)
      (m, sw)
    }
    val xs = rows.map(_._2)
    val mu0 = lowerMedian(xs)
    val (mu1, _) = refit(xs, mu0)
    val (mu2, sw2) = refit(xs, mu1)
    assert(r.getAs[Long]("n") == xs.length.toLong)
    assert(r.getAs[Long]("mu_median") == mu0)
    assert(r.getAs[Long]("mu_huber") == mu2)
    assert(r.getAs[Long]("w_sum_micro") == sw2)
    // the three million-scale outliers barely move the Huber location
    assert(math.abs(r.getAs[Long]("mu_huber") - mu0) < 60L)
  }

  test("spearman == the scalar midrank replica; monotone data -> 1") {
    val vals = (1 to 300).map(i => ((i * 37L) % 101L, (i * 53L) % 97L))
    val r = ProfileOps.spearman(vals.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    // scalar replica: centered doubled midranks
    def centered(xs: Seq[Long]): Map[Long, Long] = {
      val n = xs.length.toLong
      val byV = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      byV.keys.map { v =>
        val pre = byV.filter(_._1 < v).values.sum
        v -> (2 * pre + byV(v) - n)
      }.toMap
    }
    val dx = centered(vals.map(_._1)); val dy = centered(vals.map(_._2))
    val prods = vals.map { case (x, y) => (dx(x), dy(y)) }
    val sxy = prods.map { case (a, b) => BigInt(a) * b }.sum
    val sxx = prods.map { case (a, _) => BigInt(a) * a }.sum
    val syy = prods.map { case (_, b) => BigInt(b) * b }.sum
    assert(r.getAs[Long]("n") == vals.length.toLong)
    assert(r.getAs[Double]("rho") ==
      sxy.toDouble / math.sqrt(sxx.toDouble * syy.toDouble))
    // strictly increasing relation (with ties in neither axis) -> rho 1
    val mono = (1 to 50).map(i => (i.toLong, i * 7L)).toDF("x", "y")
    assert(ProfileOps.spearman(mono, col("x"), col("y"))
      .collect().head.getAs[Double]("rho") == 1.0)
    // monotone DECREASING -> -1, outlier-proof (Pearson would move)
    val dec = (1 to 50).map(i =>
      (i.toLong, if (i == 50) -1000000L else 1000L - i)).toDF("x", "y")
    assert(ProfileOps.spearman(dec, col("x"), col("y"))
      .collect().head.getAs[Double]("rho") == -1.0)
  }

  test("brownForsythe == anovaF over scalar median deviations") {
    val groups = Seq("g0", "g1")
    // g1 has ~4x the spread of g0 around its median
    val vals = (1 to 200).map { i =>
      val g = s"g${i % 2}"
      val base = (i * 37L) % 101L - 50L
      (g, if (i % 2 == 1) base * 4L else base)
    }
    val df = vals.toDF("g", "v")
    val r = ProfileOps.brownForsythe(df, col("g"), col("v"), groups)
      .collect().head
    // scalar lower median (smallest v with 2*cum >= n), then |v - med|
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.length + 1) / 2 - 1)
    }
    val devs = groups.flatMap { g =>
      val xs = vals.filter(_._1 == g).map(_._2)
      val med = lowerMedian(xs)
      xs.map(x => (g, math.abs(x - med)))
    }
    val expect = graft.ops.ExperimentOps.anovaF(
      devs.toDF("g", "v"), col("g"), col("v"), groups).collect().head
    assert(r == expect)
    // the engineered spread gap must register as a large F
    assert(r.getAs[Double]("f_stat") > 10.0)
  }

  test("fdProfile: a holding key, a quantified violation, and NULL " +
    "handling on both sides") {
    val rows = Seq( // (k unique, a -> b violated on a=1, c with nulls)
      (Some(10L), Some(1L), Some("x")), (Some(11L), Some(1L), Some("y")),
      (Some(12L), Some(2L), Some("z")), (Some(13L), Some(2L), Some("z")),
      (None, Some(3L), Some("w")), // NULL lhs row excluded for k->a
      (Some(14L), Some(3L), None)) // NULL rhs: no determination counted
    val df = rows.toDF("k", "a", "b")
    val out = ProfileOps.fdProfile(df,
      Seq("k" -> "a", "a" -> "b", "b" -> "k"))
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) -> r)
      .toMap
    val ka = out(("k", "a"))
    assert(ka.getAs[Long]("n_lhs_values") == 5L, "NULL k excluded")
    assert(ka.getAs[Int]("holds") == 1 && ka.getAs[Long]("n_violating") == 0L)
    val ab = out(("a", "b"))
    // a=1 -> {x,y} violates; a=2 -> {z} fine; a=3 -> {w, NULL} = {w} fine
    assert(ab.getAs[Long]("n_lhs_values") == 3L)
    assert(ab.getAs[Long]("n_violating") == 1L &&
      ab.getAs[Long]("max_rhs_per_lhs") == 2L &&
      ab.getAs[Long]("rows_in_violation") == 2L &&
      ab.getAs[Int]("holds") == 0)
    val bk = out(("b", "k"))
    // b=z -> {12,13} violates; NULL b rows excluded from lhs grain
    assert(bk.getAs[Long]("n_lhs_values") == 4L &&
      bk.getAs[Long]("n_violating") == 1L && bk.getAs[Int]("holds") == 0)
  }

  test("theilByGroup == the scalar log2Fixed replica; equal masses give " +
    "exactly 0; concentration orders above spread") {
    def scalar(xs: Seq[Long]): Long = {
      val n = xs.size.toLong
      val tot = xs.sum
      val num = xs.map(x => BigInt(x) *
        (SelectionOps.log2Fixed(x * n) - SelectionOps.log2Fixed(tot))).sum
      if (num >= 0) (num / tot).toLong else -((-num) / tot).toLong
    }
    val even = Seq.fill(8)(25L)
    val skew = Seq(160L, 5L, 5L, 5L, 5L, 5L, 5L, 10L)
    val rows = even.map(("even", _)) ++ skew.map(("skew", _)) ++
      Seq(("zero", 0L), ("zero", 7L)) // zero-mass row excluded
    val out = ProfileOps.theilByGroup(
      rows.toDF("g", "x"), col("g"), col("x"))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(out("even").getAs[Long]("theil_log2fx") == 0L)
    assert(out("even").getAs[Long]("theil_log2fx") == scalar(even))
    assert(out("skew").getAs[Long]("theil_log2fx") == scalar(skew))
    assert(out("skew").getAs[Long]("theil_log2fx") >
      out("even").getAs[Long]("theil_log2fx"))
    assert(out("zero").getAs[Long]("n") == 1L, "x <= 0 rows excluded")
    assert(out("zero").getAs[Long]("theil_log2fx") == 0L,
      "single surviving row: x*n == total, lg terms cancel exactly")
  }

  test("gTest == the scalar log2Fixed replica; planted association " +
    "rejects, exact independence scores G = 0") {
    val (as, bs) = (Seq("a1", "a2"), Seq("b1", "b2"))
    // planted: a1 mostly b1, a2 mostly b2
    val rows = Seq.fill(40)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(40)(("a2", "b2"))
    val out = ProfileOps.gTest(rows.toDF("a", "b"), col("a"), col("b"),
      as, bs, ExperimentOps.MwZ2Crit).collect().head
    // scalar replica over the observed cells
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong)
    val n = rows.size.toLong
    def rTot(a: String) = rows.count(_._1 == a).toLong
    def cTot(b: String) = rows.count(_._2 == b).toLong
    val num = cells.map { case ((a, b), o) =>
      BigInt(o) * (SelectionOps.log2Fixed(o * n) -
        SelectionOps.log2Fixed(rTot(a) * cTot(b)))
    }.sum
    val g2fx = (2 * num).toLong
    assert(out.getAs[Long]("n") == n && out.getAs[Long]("df") == 1L)
    assert(out.getAs[Long]("g_log2fx") == g2fx)
    assert(out.getAs[Double]("g_nats") ==
      g2fx.toDouble * ProfileOps.Ln2 / 1048576.0)
    assert(out.getAs[Int]("significant") == 1, "planted dependence rejects")

    // exact independence: every cell O = R*C/N exactly -> G = 0
    val ind = (for { a <- 0 until 2; b <- 0 until 3; _ <- 0 until (a + 1) * (b + 1) }
      yield (s"a$a", s"b$b"))
    val ri = ProfileOps.gTest(ind.toDF("a", "b"), col("a"), col("b"),
      Seq("a0", "a1"), Seq("b0", "b1", "b2"),
      ExperimentOps.Chi2Crit2Df).collect().head
    assert(ri.getAs[Long]("g_log2fx") == 0L, "product table: exact zero")
    assert(ri.getAs[Int]("significant") == 0)

    // a listed-but-empty level guards significance (df would shift)
    val rg = ProfileOps.gTest(rows.toDF("a", "b"), col("a"), col("b"),
      Seq("a1", "a2", "aZZ"), bs, ExperimentOps.Chi2Crit2Df).collect().head
    assert(rg.isNullAt(rg.fieldIndex("significant")))
  }

  test("lorenzDeciles == the scalar bottom-share replica; uniform mass " +
    "gives the diagonal; total concentration gives the hockey stick") {
    val uni = (1 to 20).map(i => ("u", 5L))
    val conc = (1 to 19).map(_ => ("c", 0L)) :+ ("c", 1000L)
    val skew = (1 to 10).map(i => ("s", i.toLong)) // 1..10
    val out = ProfileOps.lorenzDeciles(
      (uni ++ conc ++ skew).toDF("g", "x"), col("g"), col("x"))
      .collect()
      .map(r => (r.getAs[String]("group"), r.getAs[Long]("decile")) -> r)
      .toMap
    for (k <- 1L to 10L) {
      assert(out(("u", k)).getAs[Long]("share_micro") == k * 100000L,
        s"uniform decile $k sits on the diagonal")
      assert(out(("c", k)).getAs[Long]("share_micro") ==
        (if (k == 10L) 1000000L else 0L), "one row holds everything")
      // skew group: bottom k rows hold k(k+1)/2 of 55
      assert(out(("s", k)).getAs[Long]("share_micro") ==
        1000000L * (k * (k + 1) / 2) / 55L)
    }
    assert(out(("s", 10L)).getAs[Long]("boundary_rank") == 10L)
  }
}
