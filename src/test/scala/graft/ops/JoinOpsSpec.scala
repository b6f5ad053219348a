package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 10k rows of one hot key + a uniform tail
    val skewed = ((1 to 10000).map(i => (1L, i)) ++ (1 to 500).map(i => (i.toLong % 50 + 2, i)))
      .toDF("k", "v")
    val dim = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = JoinOps.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("salt reaches the shuffle key (hot key spread over buckets)") {
    val skewed = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "name")
    val df = JoinOps.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 4)
    val shuffles = df.queryExecution.executedPlan.toString
    assert(shuffles.contains("__salt"), s"salt not in plan:\n$shuffles")
    // the skewed side's rows really land in > 1 salt bucket
    val buckets = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(4)))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(buckets > 1)
  }

  test("outer joins preserve unmatched rows exactly once") {
    val skewed = Seq((1L, 10), (2L, 20), (99L, 30)).toDF("k", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val out = JoinOps.saltedJoin(skewed, dim, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2))).sorted.toSeq
    assert(out == Seq((1L, 10, "a"), (2L, 20, "b"), (99L, 30, null)))
  }

  // ------------------------------------------------------------- asofJoin

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 09:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:00"), 101.0),
    (1L, ts("2024-01-01 12:00:00"), 103.0),
    (2L, ts("2024-01-01 11:00:00"), 200.0)
  ).toDF("k", "qts", "px")

  private val trades = Seq(
    (10L, 1L, ts("2024-01-01 09:30:00")), // -> 09:00 quote
    (11L, 1L, ts("2024-01-01 10:00:00")), // tie: as-of is INCLUSIVE -> 10:00
    (12L, 1L, ts("2024-01-01 23:00:00")), // -> latest (12:00)
    (13L, 2L, ts("2024-01-01 10:59:00")), // before any quote -> null
    (14L, 3L, ts("2024-01-01 12:00:00")) // key with no quotes -> null
  ).toDF("id", "k", "tts")

  test("asofJoin attaches the latest right row at-or-before, per key") {
    val out = JoinOps.asofJoin(trades, quotes,
      keys = Seq("k"), tsLeft = "tts", tsRight = "qts", payloadCols = Seq("px"))
      .select($"id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      10L -> Some(100.0), 11L -> Some(101.0), 12L -> Some(103.0),
      13L -> None, 14L -> None))
  }

  test("asofJoin tolerance nulls out matches older than the horizon") {
    val out = JoinOps.asofJoin(trades, quotes,
      Seq("k"), "tts", "qts", Seq("px"), tolerance = Some("1 HOUR"))
      .select($"id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // trade 10: 09:30 vs 09:00 quote = 30 min -> kept; trade 12: 11h -> dropped
    assert(out(10L) == Some(100.0) && out(11L) == Some(101.0))
    assert(out(12L) == None && out(13L) == None && out(14L) == None)
  }

  test("asofJoin keeps every left row and all left columns") {
    val out = JoinOps.asofJoin(trades, quotes,
      Seq("k"), "tts", "qts", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("id", "k", "tts", "qts", "px"))
  }

  test("asofJoin duplicate right timestamps resolve deterministically (greatest payload)") {
    val dupQuotes = quotes.union(Seq((1L, ts("2024-01-01 10:00:00"), 999.0)).toDF("k", "qts", "px"))
    val out = JoinOps.asofJoin(trades, dupQuotes,
      Seq("k"), "tts", "qts", Seq("px"))
      .filter($"id" === 11L).select($"px").as[Double].head()
    assert(out == 999.0)
  }

  test("asofJoin plan is one partitioning by key — no nested-loop join") {
    val plan = JoinOps.asofJoin(trades, quotes,
      Seq("k"), "tts", "qts", Seq("px")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of degenerated to a pair join:\n$plan")
  }

  // ------------------------------------------------------------ rangeJoin

  test("rangeJoin matches the naive range predicate, across bucket widths") {
    val points = (0L until 200L).map(i => (i, i * 7 % 143)).toDF("pid", "p")
    val ranges = Seq(
      (1L, 0L, 10L), (2L, 5L, 50L), (3L, 49L, 50L), (4L, 100L, 300L),
      (5L, 60L, 60L), // empty range matches nothing
      (6L, 139L, 140L)
    ).toDF("rid", "s", "e")
    val naive = points.crossJoin(ranges)
      .filter($"p" >= $"s" && $"p" < $"e")
      .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = JoinOps.rangeJoin(points, ranges, "p", "s", "e", bucketWidth = w)
        .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(got == naive, s"bucketWidth=$w")
    }
  }

  test("rangeJoin plan is a hash join on the bucket id, not a nested loop") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val ranges = Seq((1L, 0L, 10L)).toDF("rid", "s", "e")
    val plan = JoinOps.rangeJoin(points, ranges, "p", "s", "e", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated:\n$plan")
    assert(plan.contains("__bk"), s"bucket key missing from plan:\n$plan")
  }

  test("intervalJoin: hand-computed overlaps, half-open boundaries, empties drop") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 40L, 40L)) // 3 is empty
      .toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 5L, 15L),  // overlaps 1 by [5,10)
      (11L, 10L, 20L), // TOUCHES 1 (end==start): half-open -> no match
      (12L, 25L, 26L), // contained in 2
      (13L, 35L, 45L)) // would overlap 3 were it nonempty
      .toDF("b_id", "b_s", "b_e")
    val got = JoinOps.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e", 8L)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 12L)))
  }

  test("intervalJoin matches the naive overlap predicate EXACTLY ONCE, across widths") {
    val rnd = new scala.util.Random(31)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val s = rnd.nextInt(300).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(60)) // lengths 1..60 straddle widths
    }.toDF(s"${tag}_id", s"${tag}_s", s"${tag}_e")
    val a = mk(150, "a")
    val b = mk(170, "b")
    val naive = a.crossJoin(b)
      .filter($"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(naive.nonEmpty && naive.distinct == naive)
    for (w <- Seq(1L, 16L, 64L, 1000L)) {
      // NOT a set compare: duplicates from multi-bucket pairs would be
      // invisible — the canonical-bucket guard is exactly what's on trial
      val got = JoinOps.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e", w)
        .select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == naive, s"bucketWidth=$w")
    }
  }

  test("intervalJoin with keys joins per key and stays hash-shaped") {
    val a = Seq((7L, 1L, 0L, 10L), (8L, 2L, 0L, 10L)).toDF("k", "a_id", "a_s", "a_e")
    val b = Seq((7L, 20L, 5L, 8L), (8L, 21L, 50L, 60L)).toDF("k", "b_id", "b_s", "b_e")
    val out = JoinOps.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e", 4L, keys = Seq("k"))
    val got = out.select($"k", $"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((7L, 1L, 20L))) // key 8's intervals don't overlap
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degenerated:\n$plan")
  }

  test("intervalJoin skew guard: a degenerate interval fails loudly, sane data unaffected") {
    // one sentinel-bounded interval that would fan out to ~10^9 buckets
    val a = Seq((1L, 0L, 10L), (2L, 0L, 4102444800L)) // "year 9999" end
      .toDF("a_id", "a_s", "a_e")
    val b = Seq((10L, 5L, 15L)).toDF("b_id", "b_s", "b_e")
    val e = intercept[Exception] {
      JoinOps.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e", 8L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("skew guard")),
      s"expected the raise_error guard, got: $e")
    // same call with the bad row clamped upstream still works, and a sane
    // dataset under a generous cap is untouched by the guard
    val ok = JoinOps.intervalJoin(
      a.filter($"a_e" < 100L), b, "a_s", "a_e", "b_s", "b_e", 8L)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok == Seq((1L, 10L)))
  }

  test("bloomAntiJoin equals the plain anti join, null keys kept") {
    val left = ((1 to 2000).map(i => (Option(i.toLong), s"d$i")) :+
      ((None: Option[Long]), "dnull")).toDF("id", "payload")
    // remove every 13th id, plus keys absent from left (harmless)
    val removals = ((13 to 2000 by 13).map(_.toLong) ++ Seq(99991L, 99992L))
      .toDF("rid")
    val plain = left.join(removals, $"id" === $"rid", "left_anti")
      .collect().map(r => (Option(r.get(0)).map(_.toString), r.getString(1))).sorted.toSeq
    for (fpp <- Seq(0.5, 0.01)) { // high fpp stresses the exact-verify branch
      val got = JoinOps.bloomAntiJoin(left, "id", removals, "rid",
        expectedItems = 1000, fpp = fpp)
        .collect().map(r => (Option(r.get(0)).map(_.toString), r.getString(1))).sorted.toSeq
      assert(got == plain, s"fpp=$fpp")
    }
    assert(plain.exists(_._2 == "dnull"), "null-key row must survive")
  }

  test("bloomAntiJoin: definite-keep branch bypasses the join") {
    // spark.range (not a local Seq): LocalTableScans get probe-folded at
    // optimization time and the filter would vanish from the plan
    val left = spark.range(5000).select($"id", ($"id" * 2).as("v"))
    val removals = Seq(17L, 4242L).toDF("rid")
    val df = JoinOps.bloomAntiJoin(left.toDF(), "id", removals, "rid", expectedItems = 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing from plan:\n$plan")
    // with 2 removal keys at fpp 1%, almost everything keeps without joining
    val bloom = removals.select($"rid").stat.bloomFilter("rid", 100, 0.01)
    val routed = left.filter(
      graft.expr.BloomExprs.mightContainLong($"id", bloom)).count()
    assert(routed < 500, s"too many rows routed to the exact join: $routed")
    assert(df.count() == 4998)
  }

  test("fuzzySelfPairs equals the all-pairs levenshtein predicate") {
    // substitutions, insert/delete at every position, equal strings,
    // empty vs one char, shared-variant false candidates (dist 2)
    val names = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "kitte"), (4L, "kittens"),
      (5L, "mitten"), (6L, "kitten"), (7L, "abc"), (8L, "axc"),
      (9L, ""), (10L, "a"), (11L, "b"), (12L, "ab"), (13L, "ba"),
      (14L, "aab"), (15L, "abb"))
    val df = names.toDF("id", "s")
    val got = JoinOps.fuzzySelfPairs(df, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), levenshtein(col("a.s"), col("b.s")))
      .as[(Long, Long, Int)].collect().filter(_._3 <= 1).toSet
    assert(got == brute)
    // sanity: the planted families actually produced pairs
    assert(brute.contains((1L, 2L, 1)) && brute.contains((1L, 6L, 0)) &&
      brute.contains((9L, 10L, 1)) && brute.contains((12L, 14L, 1)))
    // "ab" vs "ba" is distance 2 (plain Levenshtein has no transposition):
    // a shared-deletion-variant candidate the verify must reject
    assert(!got.exists(p => p._1 == 12L && p._2 == 13L))
  }

  test("blockingEval: hand-counted metrics on a planted feed; complete " +
    "blocking reports pc 10^6; degenerate inputs yield NULLs") {
    // 4 base strings far apart + 2 dirty single-deletion copies
    val rows = Seq(
      (1L, "alpha-record-one"), (2L, "beta-record-two"),
      (3L, "gamma-record-three"), (4L, "delta-record-four"),
      (11L, "alpha-recordone"), // deletion of '-' from id 1
      (12L, "beta-recor-two")) // deletion of 'd' from id 2
    val truth = Seq((1L, 11L), (2L, 12L)).toDF("id1", "id2")
    val out = JoinOps.blockingEval(
      rows.toDF("id", "s"), "id", "s", truth).collect().head
    assert(out.getAs[Long]("n_rows") == 6L &&
      out.getAs[Long]("total_pairs") == 15L)
    // candidates: exactly the two true pairs (others share no variant)
    val cand = JoinOps.fuzzyCandidatePairs(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((1L, 11L), (2L, 12L)))
    assert(out.getAs[Long]("n_cand") == 2L &&
      out.getAs[Long]("n_true") == 2L &&
      out.getAs[Long]("n_matched") == 2L)
    assert(out.getAs[Long]("pc_micro") == 1000000L, "blocking is complete")
    assert(out.getAs[Long]("pq_micro") == 1000000L)
    assert(out.getAs[Long]("rr_micro") == 1000000L - 1000000L * 2 / 15)

    // portable family produces the same pair set (collision-free here)
    val candP = JoinOps.fuzzyCandidatePairs(rows.toDF("id", "s"), "id", "s",
      graft.ops.DedupOps.portableShingleHash).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candP == cand)

    val none = JoinOps.blockingEval(
      Seq.empty[(Long, String)].toDF("id", "s"), "id", "s",
      Seq.empty[(Long, Long)].toDF("id1", "id2")).collect().head
    assert(none.getAs[Long]("n_cand") == 0L)
    assert(none.isNullAt(none.fieldIndex("pc_micro")) &&
      none.isNullAt(none.fieldIndex("pq_micro")) &&
      none.isNullAt(none.fieldIndex("rr_micro")))
  }
}
