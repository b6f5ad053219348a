package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ModelOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- OLS

  test("olsTrend recovers an exact linear series bit-for-bit") {
    // y = 250 + 7x: slope/intercept land exactly on the micro grid
    val df = (0L to 20L).map(x => ("a", x, 250L + 7L * x)).toDF("g", "x", "y")
    val row = ModelOps.olsTrend(df, $"g", $"x", $"y").collect().head
    assert(row.getAs[Long]("slope_micro") == 7000000L)
    assert(row.getAs[Long]("intercept_micro") == 250000000L)
    assert(row.getAs[Long]("pred_next_micro") == (250L + 7L * 21L) * 1000000L)
  }

  test("olsTrend: negative slope divides toward zero (Java div semantics)") {
    // points (0,10),(1,3): slope = -7 exactly; then a non-exact case
    val exact = ModelOps.olsTrend(
      Seq(("a", 0L, 10L), ("a", 1L, 3L)).toDF("g", "x", "y"),
      $"g", $"x", $"y").collect().head
    assert(exact.getAs[Long]("slope_micro") == -7000000L)
    // points (0,1),(1,0),(2,0): num = -1e6*3... slope = -0.5 -> -500000
    val half = ModelOps.olsTrend(
      Seq(("a", 0L, 1L), ("a", 2L, 0L)).toDF("g", "x", "y"),
      $"g", $"x", $"y").collect().head
    assert(half.getAs[Long]("slope_micro") == -500000L)
  }

  test("olsTrend: zero x-variance group gets NULL fit, layout-invariant") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 9L)).toDF("g", "x", "y")
    val row = ModelOps.olsTrend(df, $"g", $"x", $"y").collect().head
    assert(row.isNullAt(row.fieldIndex("slope_micro")))
    val big = (0L to 29L).flatMap(x =>
      (1L to 7L).map(i => ("t", x, x * 13L + i))).toDF("g", "x", "y")
    val a = ModelOps.olsTrend(big, $"g", $"x", $"y").collect().head
    val b = ModelOps.olsTrend(big.repartition(17), $"g", $"x", $"y")
      .collect().head
    assert(a == b, "moment sums are integer — layout must not matter")
  }

  // --------------------------------------------------------- Zipf fit

  test("zipfFit recovers a planted exponent-1 power law") {
    // f(rank) = floor(16384 / rank): log2 f = 14 - log2 rank up to
    // <2^-10 flooring error; the 2^-8 grid adds ≤0.004/pt — the fitted
    // slope must land within ~1% of -1
    val docs = (1 to 8).flatMap { r =>
      Seq.fill(16384 / r)(s"t$r")
    }.grouped(500).map(_.mkString(" ")).toSeq.toDF("text")
    val row = ModelOps.zipfFit(docs, col("text"), topRanks = 8)
      .collect().head
    assert(row.getAs[Long]("n_ranks") == 8L)
    val slope = row.getAs[Long]("slope_micro")
    assert(math.abs(slope + 1000000L) < 10000L,
      s"planted exponent 1, fitted $slope")
  }

  test("zipfFit is layout-invariant and heap-bounded") {
    val docs = (1 to 400).map(i =>
      (1 to (400 / i)).map(_ => s"w$i").mkString(" ")).toDF("text")
    val a = ModelOps.zipfFit(docs, col("text")).collect().head
    val b = ModelOps.zipfFit(docs.repartition(13), col("text")).collect().head
    assert(a == b)
    assert(a.getAs[Long]("n_ranks") == 128L)
    assert(a.getAs[Long]("slope_micro") < 0L, "frequency falls with rank")
  }

  // ------------------------------------------------- Theil-Sen / MK

  test("theilSen: hand series — S statistic and lower-median slope") {
    // y: 1, 2, 9, 4 at x = 0..3 -> pairwise slopes (micro):
    // (0,1):1e6 (0,2):4e6 (0,3):1e6 (1,2):7e6 (1,3):1e6 (2,3):-5e6
    // sorted: -5e6, 1e6, 1e6, 1e6, 4e6, 7e6 -> lower median (rank 3) = 1e6
    // S = sign sum = +1 +1 +1 +1 +1 -1 = 4
    val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 9L), ("a", 3L, 4L))
      .toDF("g", "x", "y")
    val row = ModelOps.theilSen(df, $"g", $"x", $"y").collect().head
    assert(row.getAs[Long]("n_pairs") == 6L)
    assert(row.getAs[Long]("s_stat") == 4L)
    assert(row.getAs[Long]("slope_micro") == 1000000L)
  }

  test("theilSen ignores a gross outlier that drags OLS") {
    // clean slope 5, one wild point at the end
    val pts = (0L to 19L).map(x => ("a", x, 100L + 5L * x)) :+ ("a", 20L, 100000L)
    val df = pts.toDF("g", "x", "y")
    val ts = ModelOps.theilSen(df, $"g", $"x", $"y").collect().head
    assert(ts.getAs[Long]("slope_micro") == 5000000L,
      "median slope must shrug off one outlier")
    val ols = ModelOps.olsTrend(df, $"g", $"x", $"y").collect().head
    assert(ols.getAs[Long]("slope_micro") > 100L * 1000000L,
      "OLS should be dragged — that contrast is the operator's point")
  }

  test("theilSen is layout-invariant and enforces the series bound") {
    val df = (0L to 30L).map(x => ("a", x, (x * x) % 97L)).toDF("g", "x", "y")
    val a = ModelOps.theilSen(df, $"g", $"x", $"y").collect().head
    val b = ModelOps.theilSen(df.repartition(7), $"g", $"x", $"y")
      .collect().head
    assert(a == b)
    val err = intercept[Exception] {
      ModelOps.theilSen(df, $"g", $"x", $"y", maxPoints = 10).collect()
    }
    assert(err.getMessage.contains("exceeds"))
  }

  // ------------------------------------------------------ Naive Bayes

  test("naiveBayesConfusion separates two clean vocabularies") {
    // train: 4 docs per class with disjoint vocab; test: 2 per class
    val rows = Seq(
      (0L, "en", "data table join query"), (2L, "en", "table query data"),
      (4L, "en", "join data table"), (6L, "en", "query join table data"),
      (1L, "en", "data join query table"), (3L, "en", "table data query"),
      // zh vocab chosen bucket-disjoint from the en vocab under the
      // md5 % 64 feature hash (verified offline) — the clean-separation
      // assertion must not ride on collision luck
      (10L, "zh", "wong chen ling ming"), (12L, "zh", "chen ming wong"),
      (14L, "zh", "ling wong chen"), (16L, "zh", "ming ling chen wong"),
      (11L, "zh", "chen wong ming ling"), (13L, "zh", "ling ming wong"))
    val df = rows.toDF("doc_id", "lang", "text")
    val conf = ModelOps.naiveBayesConfusion(
      df, $"doc_id", $"lang", $"text", $"doc_id" % 2 === 0)
      .as[(String, String, Long)].collect().toSet
    assert(conf == Set(("en", "en", 2L), ("zh", "zh", 2L)),
      s"clean split must classify perfectly, got $conf")
  }

  test("naiveBayesConfusion is layout-invariant and drops null/token-free docs") {
    val rows = Seq(
      (0L, "en", "data table join"), (2L, "en", "table query"),
      (10L, "zh", "chen ling"), (12L, "zh", "wong ming chen"),
      (1L, "en", "data query"), (11L, "zh", "ling wong"),
      (3L, null.asInstanceOf[String], "data data"), (5L, "en", ""))
    val df = rows.toDF("doc_id", "lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      ModelOps.naiveBayesConfusion(
        d, $"doc_id", $"lang", $"text", $"doc_id" % 2 === 0)
        .as[(String, String, Long)].collect().sorted.toSeq
    val a = run(df)
    assert(a == run(df.repartition(5)))
    assert(a.map(_._3).sum == 2L, "null-lang and token-free docs drop")
  }

  // -------------------------------------------------- Bradley-Terry

  test("lengthBattles: bucket pairing, win orientation, tie to lower id") {
    val docs = Seq(
      (0L, "a", 100L), (1L, "b", 50L),  // bucket 0: a beats b
      (2L, "b", 80L), (3L, "a", 80L),   // bucket 0: tie -> id 2 (b) wins
      (8L, "a", 10L), (9L, "c", 90L),   // bucket 1: c beats a
      (10L, "a", 5L))                   // same bucket: c beats a, a vs a skipped? no second a
    val b = ModelOps.lengthBattles(
      docs.toDF("id", "p", "s"), $"id", $"p", $"s")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // bucket 0 pairs: (0,1) a(100)>b(50) win-a, (0,2) a(100)>b(80) win-a,
    // (1,3) b(50)<a(80) win-a, (2,3) b(80)=a(80) tie -> doc 2 (b) wins
    assert(b(("a", "b")) == (4L, 3L))
    // bucket 1: (8,9) c wins, (8? no) (9,10): c(90) vs a(5): c wins ->
    // pair (a, c): 2 games, 0 wins for a
    assert(b(("a", "c")) == (2L, 0L))
  }

  test("bradleyTerry ranks a dominant player on top, fixed point, layout-proof") {
    // a beats b 9/10, b beats c 9/10, a beats c 9/10
    val battles = Seq(
      ("a", "b", 10L, 9L), ("b", "c", 10L, 9L), ("a", "c", 10L, 9L))
      .toDF("pa", "pb", "n_games", "wins_a")
    val r = ModelOps.bradleyTerry(battles, iters = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r("a") > r("b") && r("b") > r("c"), s"ordering wrong: $r")
    assert(r("a") == ModelOps.BtScale, "max-normalized leader pins the scale")
    val r2 = ModelOps.bradleyTerry(battles.repartition(3), iters = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r == r2)
  }

  test("bradleyTerry: winless player floors at 1, never divides by zero") {
    val battles = Seq(("a", "b", 4L, 4L)).toDF("pa", "pb", "n_games", "wins_a")
    val r = ModelOps.bradleyTerry(battles, iters = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r("b") >= 1L && r("a") == ModelOps.BtScale)
  }

  test("heapsFit: recovers a planted growth exponent; layout-invariant") {
    import org.apache.spark.sql.functions.col
    // plant V(n) ~ n^0.5 exactly: doc r contributes 2r-1 tokens of which
    // ceil-sqrt growth introduces new types so cum tokens = r^2 and cum
    // types = r  ->  beta = log(r)/log(r^2) = 0.5
    val docs = (1 to 64).map { r =>
      val newTok = s"t$r" // one new type per doc
      val repeats = Seq.fill(2 * r - 2)("t1") // pad tokens with a known type
      (r.toLong, (newTok +: repeats).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = ModelOps.heapsFit(df, col("doc_id"), col("text"))
      .collect().head
    // checkpoints: ranks 1,2,4,8,16,32,64 (64 is both pow2 and last)
    assert(out.getAs[Long]("n_checkpoints") == 7L)
    val beta = out.getAs[Long]("beta_micro")
    assert(beta > 480000L && beta < 520000L, s"beta_micro $beta")
    val out7 = ModelOps.heapsFit(df.repartition(7), col("doc_id"), col("text"))
      .collect().head
    assert(out == out7)
  }

  test("acfSeries == the BigInt scalar replica; dw on lag 1 only") {
    // one value per day, two raw rows on day 3 to prove the day collapse
    val xs = Seq(100L, 140L, 90L, 260L, 130L, 170L, 60L, 220L)
    val rows = xs.zipWithIndex.flatMap { case (x, i) =>
      val d = f"2024-02-${i + 1}%02d"
      if (i == 3) Seq((d, x - 60L), (d, 60L)) else Seq((d, x))
    }
    val out = ModelOps.acfSeries(
      rows.toDF("dt", "c"), col("dt"), col("c"), maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    assert(out.size == 3)
    val n = BigInt(xs.size)
    val s = BigInt(xs.sum)
    val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
    val den = n * n * sxx - n * s * s
    for (l <- 1 to 3) {
      val pairs = (l until xs.size).map(t => (xs(t), xs(t - l)))
      val cross = pairs.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
      val tl = BigInt(pairs.map(_._1).sum)
      val hl = BigInt(pairs.map(_._2).sum)
      val num = n * n * cross - n * s * (hl + tl) + (n - l) * s * s
      val r = out(l)
      assert(r.getAs[Long]("n_pairs") == (xs.size - l).toLong)
      assert(r.getAs[Double]("acf") == num.toDouble / den.toDouble,
        s"lag $l acf must be the exact integer-ratio double")
      if (l == 1) {
        val sd2 = (1 until xs.size)
          .map(t => BigInt(xs(t) - xs(t - 1)).pow(2)).sum
        assert(r.getAs[Double]("dw") == (n * n * sd2).toDouble / den.toDouble)
      } else assert(r.isNullAt(r.fieldIndex("dw")), s"dw only on lag 1")
    }
    // layout invariance through the day-keyed collapse
    val p8 = ModelOps.acfSeries(
      rows.toDF("dt", "c").repartition(8), col("dt"), col("c"), 3)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    (1 to 3).foreach(l => assert(out(l) == p8(l)))
  }

  test("acfSeries: lags past the series end are NULL; constant series " +
    "has zero variance and yields NULL acf") {
    val short = Seq(("2024-03-01", 5L), ("2024-03-02", 9L),
      ("2024-03-03", 7L))
    val out = ModelOps.acfSeries(
      short.toDF("dt", "c"), col("dt"), col("c"), maxLag = 5)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    assert(out(1).getAs[Long]("n_pairs") == 2L)
    assert(out(3).getAs[Long]("n_pairs") == 0L &&
      out(3).isNullAt(out(3).fieldIndex("acf")))
    assert(out(5).isNullAt(out(5).fieldIndex("acf")))

    val const = (1 to 6).map(i => (f"2024-03-$i%02d", 42L))
    val rc = ModelOps.acfSeries(
      const.toDF("dt", "c"), col("dt"), col("c"), maxLag = 2)
      .collect()
    rc.foreach(r => assert(r.isNullAt(r.fieldIndex("acf")),
      "zero-variance series: NULL acf, no division error"))
  }

  test("changepointScan finds a planted level shift exactly; == the " +
    "BigInt argmax replica; degenerate series yields no row") {
    import java.time.LocalDate
    val d0 = LocalDate.of(2024, 4, 1)
    // 100s for 9 days, 300s for 11 days: optimal split after day 9
    val xs = Seq.fill(9)(100L) ++ Seq.fill(11)(300L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (d0.plusDays(i).toString, x)
    }
    val out = ModelOps.changepointScan(
      rows.toDF("dt", "c"), col("dt"), col("c")).collect().head
    assert(out.getAs[Long]("n_left") == 9L &&
      out.getAs[Long]("n_right") == 11L)
    assert(out.getAs[Long]("split_d") == d0.plusDays(8).toEpochDay)
    assert(out.getAs[Long]("sum_left") == 900L &&
      out.getAs[Long]("sum_right") == 3300L)
    // replica of the fixed-grid score at the winning split
    val (n, s) = (20L, xs.sum)
    def score(i: Int): BigInt = {
      val s1 = BigInt(xs.take(i).sum)
      val s2 = BigInt(s) - s1
      (s1 * s1 * (n - i) + s2 * s2 * i) * 1048576 /
        (BigInt(i) * (n - i) * s)
    }
    val best = (1 until 20).maxBy(score)
    assert(best == 9 && out.getAs[Long]("score_fx") == score(9).toLong)
    assert(out.getAs[Long]("base_fx") == BigInt(s) * 1048576 / n)
    assert(out.getAs[Long]("score_fx") > out.getAs[Long]("base_fx"),
      "a real shift must beat the no-split score")

    // all-zero series: no defined split, empty frame (not a crash)
    val zero = (0 until 5).map(i => (d0.plusDays(i).toString, 0L))
    assert(ModelOps.changepointScan(
      zero.toDF("dt", "c"), col("dt"), col("c")).collect().isEmpty)
  }

  test("hillTailIndex == the scalar log2Fixed replica on a planted " +
    "power tail; short frames yield NULLs; boundary ties are harmless") {
    val k = 8
    // tail values 2^20 / rank (integer) + bulk noise below the threshold
    val tail = (1 to k + 1).map(r => (1L << 20) / r)
    val bulk = (1 to 100).map(i => 50L + i % 7)
    val xs = tail ++ bulk
    val out = ModelOps.hillTailIndex(
      xs.toDF("x"), col("x"), k).collect().head
    assert(out.getAs[Long]("n_top") == (k + 1).toLong)
    assert(out.getAs[Long]("x_threshold") == tail.last)
    val t = tail.take(k).map(SelectionOps.log2Fixed).sum -
      k * SelectionOps.log2Fixed(tail.last)
    assert(out.getAs[Long]("h_log2fx") == t / k)
    assert(out.getAs[Double]("alpha") ==
      (k.toLong * 1048576L).toDouble / (t.toDouble * ProfileOps.Ln2))
    // 1/x tail: alpha should read near 1
    val a = out.getAs[Double]("alpha")
    assert(a > 0.7 && a < 1.4, s"planted 1/rank tail, got alpha $a")

    // a tie straddling the k-boundary cannot change the estimate
    val tied = xs ++ Seq(tail(k - 1)) // duplicate the rank-k value
    val rt = ModelOps.hillTailIndex(tied.toDF("x"), col("x"), k)
      .collect().head
    assert(rt.getAs[Long]("x_threshold") == tail(k - 1))

    val short = (1 to k).map(_.toLong) // only k rows: no threshold
    val rs = ModelOps.hillTailIndex(short.toDF("x"), col("x"), k)
      .collect().head
    assert(rs.isNullAt(rs.fieldIndex("alpha")) &&
      rs.isNullAt(rs.fieldIndex("h_log2fx")))
  }

  test("seasonalIndex == the scalar epoch-day replica; flat series " +
    "indexes exactly 10^6 everywhere") {
    import java.time.LocalDate
    // 3 weeks, value = 100 + 50 on Sundays ((epochday+4) % 7 == 0)
    val days = (0 until 21).map(i => LocalDate.of(2024, 2, 1).plusDays(i))
    def dowOf(d: LocalDate): Long = (d.toEpochDay + 4) % 7
    val rows = days.map(d =>
      (d.toString, if (dowOf(d) == 0L) 150L else 100L))
    val out = ModelOps.seasonalIndex(
      rows.toDF("dt", "c"), col("dt"), col("c"))
      .collect().map(r => r.getAs[Long]("dow") -> r).toMap
    assert(out.size == 7)
    val total = rows.map(_._2).sum
    val n = 21L
    for (dow <- 0L to 6L) {
      val mine = days.filter(dowOf(_) == dow)
      val cents = rows.zip(days).filter(p => dowOf(p._2) == dow)
        .map(_._1._2).sum
      val r = out(dow)
      assert(r.getAs[Long]("n_days") == mine.size.toLong)
      assert(r.getAs[Long]("cents") == cents)
      assert(r.getAs[Long]("idx_micro") ==
        (BigInt(1000000) * cents * n / (mine.size * total)).toLong)
    }
    assert(out(0L).getAs[Long]("idx_micro") > 1000000L, "Sunday lifts")

    val flat = (0 until 14).map(i =>
      (LocalDate.of(2024, 5, 6).plusDays(i).toString, 77L))
    ModelOps.seasonalIndex(flat.toDF("dt", "c"), col("dt"), col("c"))
      .collect().foreach(r =>
        assert(r.getAs[Long]("idx_micro") == 1000000L,
          "equal daily mass: exact unit index"))
  }
}
