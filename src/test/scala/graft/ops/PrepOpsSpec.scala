package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrepOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: overlapping windows cover every token, order preserved") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"), // shorter than one chunk
      (3L, "") // no tokens -> no chunks
    ).toDF("doc_id", "text")
    val out = PrepOps.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // stride 3: starts 0,3,6,9 -> 4 chunks for doc 1
    assert(out((1L, 0L)) == ("t1 t2 t3 t4", 4L))
    assert(out((1L, 1L)) == ("t4 t5 t6 t7", 4L))
    assert(out((1L, 2L)) == ("t7 t8 t9 t10", 4L))
    assert(out((1L, 3L)) == ("t10", 1L)) // tail chunk, shorter
    assert(out((2L, 0L)) == ("a b c", 3L))
    assert(!out.keySet.exists(_._1 == 3L))
    // consecutive chunks overlap by exactly `overlap` tokens
    assert(out((1L, 0L))._1.split(" ").last == out((1L, 1L))._1.split(" ").head)
  }

  test("packGreedy: packs respect the budget boundary per bucket") {
    val docs = (1L to 100L)
      .map(i => (i, (1 to (i % 30 + 5).toInt).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = PrepOps.packGreedy(docs, "doc_id", "text", budgetTokens = 50, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reconstruct: within a bucket, pack_id = floor(prefix_sum / 50)
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, packId, n) =>
        assert(packId == cum / 50)
        cum += n
      }
    }
    // every doc appears exactly once
    assert(out.map(_._1).distinct.length == 100)
  }

  test("quantizeInt8: values in [-127,127], dequantization error bounded") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)), // zero vector
      (3L, Seq(3.0f))
    ).toDF("vec_id", "embedding")
    val out = PrepOps.quantizeInt8(vecs, "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    assert(out(1L)._2.forall(q => q >= -127 && q <= 127))
    assert(out(1L)._2(1) == -127) // the max-magnitude element hits the rail
    assert(out(2L) == (1.0, Seq(0, 0)))
    assert(out(3L)._2 == Seq(127))
    // dequantized values within max|x|/254 of the original
    val (scale, q) = out(1L)
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    q.zip(orig).foreach { case (qi, xi) =>
      assert(math.abs(qi / scale - xi) <= 1.0 / 254 + 1e-12)
    }
  }

  test("standardizeByGroup: hand-computed z-scores; zero-variance group -> 0") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L), (5L, "b", 7L))
      .toDF("id", "g", "c")
    val out = PrepOps.standardizeByGroup(df, $"id", $"g", $"c").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // a: mean 20, var = (100+400+900)/3 - 400 = 200/3... exact chain:
    // sq/n = 1400/3, mean^2 = 400 -> std = sqrt(1400/3 - 400)
    val stdA = math.sqrt(1400.0 / 3 - (60.0 / 3) * (60.0 / 3))
    assert(out(1L) == (10.0 - 20.0) / stdA)
    assert(out(2L) == 0.0)
    assert(out(3L) == (30.0 - 20.0) / stdA)
    // b: zero variance -> z pinned to 0, not NaN/Inf
    assert(out(4L) == 0.0 && out(5L) == 0.0)
    // layout invariance (exact integer sums -> identical floats)
    val again = PrepOps.standardizeByGroup(df.repartition(7), $"id", $"g", $"c")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == out)
  }

  test("bpeTrain learns the hand-computed merges in order, layout-invariant") {
    // word freqs: "aaab" x2, "ab" x1
    // round 1: (a,a)=4 beats (a,b)=3 -> merge; round 2: (a,b)=3; round 3: (aa,ab)=2
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = PrepOps.bpeTrain(docs, $"text", merges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val again = PrepOps.bpeTrain(docs.repartition(5), $"text", merges = 3)
    assert(again == merges, "training must not depend on input layout")
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(PrepOps.bpeTrain(docs, $"text", merges = 5) == Seq())
  }

  test("bpeTrainLocal equals the distributed trainer on corpora with ties") {
    val corpora = Seq(
      Seq((1L, "aaab aaab"), (2L, "ab")),
      Seq((1L, "xy xy yz"), (2L, "zzz xy"), (3L, "yz yz zx")),
      Seq((1L, "the cat sat on the mat"), (2L, "the bat"), (3L, "a cat")))
    corpora.foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      val dist = PrepOps.bpeTrain(docs, $"text", merges = 6)
      val local = PrepOps.bpeTrainLocal(docs.repartition(3), $"text", merges = 6)
      assert(local == dist, s"corpus $rows")
    }
  }

  test("bpeEncode segments with trained merges; trainer-seen words collapse") {
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = PrepOps.bpeTrain(docs, $"text", merges = 3)
    // merges: (a,a), (a,b), (aa,ab)
    val enc = Seq(
      (1L, "aaab"),    // aa ab -> aaab (rank-2 merge)
      (2L, "ab"),      // ab (rank-1)
      (3L, "aaab ab"), // across tokens: aaab + ab
      (4L, "aaa"),     // aa a (left-to-right rank-0, no (aa,a) merge)
      (5L, "xyz"),     // fully OOV -> chars
      (6L, "axb"))     // (a,b) not adjacent -> a x b
      .toDF("doc_id", "text")
      .select($"doc_id", PrepOps.bpeEncode($"text", merges).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(1L) == Seq("aaab"))
    assert(enc(2L) == Seq("ab"))
    assert(enc(3L) == Seq("aaab", "ab"))
    assert(enc(4L) == Seq("aa", "a"))
    assert(enc(5L) == Seq("x", "y", "z"))
    assert(enc(6L) == Seq("a", "x", "b"))
    // lossless: concatenated pieces rebuild the normalized text
    val rebuilt = Seq((7L, "Aaab  AB xyzaaa")).toDF("doc_id", "text")
      .select(concat_ws("", PrepOps.bpeEncode($"text", merges)).as("r"))
      .as[String].head()
    assert(rebuilt == "aaababxyzaaa")
  }

  test("bpeEncode with no merges yields code points; empty tokens impossible") {
    val out = Seq((1L, "hi ét")).toDF("doc_id", "text")
      .select(PrepOps.bpeEncode($"text", Seq.empty).as("p"))
      .as[Seq[String]].head()
    assert(out == Seq("h", "i", "é", "t"))
  }

  test("bpePairCounts counts every adjacent occurrence, not distinct words") {
    val docs = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val got = PrepOps.bpePairCounts(docs, $"text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a b" -> 2L, "b a" -> 1L))
  }

  test("trainingOrder: per-shard ranks are gap-free permutations, layout-invariant") {
    val docs = (1L to 5000L).map(i => (i, s"doc ${i * 31 % 997} content")).toDF("doc_id", "text")
    val ord = org.apache.spark.sql.functions.xxhash64($"text")
    val a = PrepOps.trainingOrder(docs, $"doc_id", ord, shards = 8, salt = 7L)
      .as[(Long, Long, Long)].collect()
    // every doc exactly once; shard matches the affine map
    assert(a.length == 5000 && a.map(_._1).toSet.size == 5000)
    a.foreach { case (id, shard, _) =>
      assert(shard == (id * 104729L + 7) % 8)
    }
    // ranks 1..n_shard with no gaps inside each shard
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $s")
    }
    val b = PrepOps.trainingOrder(docs.repartition(13), $"doc_id", ord, 8, 7L)
      .as[(Long, Long, Long)].collect()
    assert(a.toSet == b.toSet, "training order must not depend on input layout")
  }

  test("trainingOrder: a different salt permutes shard membership") {
    val docs = (1L to 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def shardsOf(salt: Long) = PrepOps.trainingOrder(
      docs, $"doc_id", org.apache.spark.sql.functions.lit(0), 8, salt)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val s1 = shardsOf(7L)
    val s2 = shardsOf(8L)
    assert(s1 != s2, "epoch salt must change the permutation")
  }

  /** Reference Morton interleave: per-bit loop, the definitionally-obvious
    * form the 5-round mask-shift must equal.
    */
  private def mortonRef(x: Long, y: Long): Long = {
    val (xm, ym) = (x & 0x7FFFFFFFL, y & 0x7FFFFFFFL)
    (0 until 31).foldLeft(0L) { (z, i) =>
      z | ((xm >> i) & 1L) << (2 * i) | ((ym >> i) & 1L) << (2 * i + 1)
    }
  }

  test("zorderKey equals the per-bit Morton interleave (incl. 31-bit extremes)") {
    val vals = Seq(0L, 1L, 2L, 3L, 15L, 16L, 255L, 1023L, 123456789L,
      0x7FFFFFFFL, 0x40000000L)
    val pairs = for (x <- vals; y <- vals) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(PrepOps.zorderKey($"x", $"y"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (x, y) => mortonRef(x, y) })
    assert(got.forall(_ >= 0L), "keys must stay nonnegative (sortable)")
  }

  test("zorderKey clustering: an aligned 2-D box touches 1 bucket vs 4 under row-major") {
    // 16x16 grid, 16 files of 16 rows each under either ordering.
    // Aligned 4x4 box x in [4,7], y in [8,11]:
    //   row-major (y*16+x): rows scattered across 4 stripes -> 4 files
    //   z-order: the box IS one aligned Morton quadrant -> 1 file
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val keys = grid.toDF("x", "y")
      .select($"x", $"y", PrepOps.zorderKey($"x", $"y").as("zkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def filesTouched(order: ((Long, Long)) => Long): Int = {
      val ranked = grid.sortBy(order).zipWithIndex.toMap
      grid.filter { case (x, y) => x >= 4 && x <= 7 && y >= 8 && y <= 11 }
        .map(p => ranked(p) / 16).distinct.size
    }
    assert(filesTouched { case (x, y) => y * 16 + x } == 4)
    assert(filesTouched(keys) == 1)
  }

  test("hilbertKey matches the reference walk and is a bijection on the grid") {
    val order = 6 // 64x64
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(PrepOps.hilbertKey($"x", $"y", order))
      .collect().map(_.getLong(0)).toSeq
    assert(got == grid.map { case (x, y) =>
      graft.expr.HilbertIndex.xy2d(order, x, y) })
    assert(got.toSet == (0L until 4096L).toSet, "bijection onto [0, 4^order)")
    // adjacency: consecutive curve positions are grid neighbors — the
    // property Morton lacks (its diagonal jumps) and the reason boxes
    // split into fewer runs
    val pos = grid.zip(got).map { case (p, d) => d -> p }.toMap
    (0L until 4095L).foreach { d =>
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbert box sweep needs fewer total key runs than morton") {
    val order = 6
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val h = grid.map { case (x, y) =>
      (x, y) -> graft.expr.HilbertIndex.xy2d(order, x, y) }.toMap
    val z = grid.map { case (x, y) => (x, y) -> mortonRef(x, y) }.toMap
    def runs(keyOf: ((Long, Long)) => Long,
        x0: Long, x1: Long, y0: Long, y1: Long): Int = {
      val ks = grid.filter { case (x, y) =>
        x >= x0 && x <= x1 && y >= y0 && y <= y1 }.map(keyOf).sorted
      1 + ks.zip(ks.tail).count { case (a, b) => b != a + 1 }
    }
    var hTotal = 0; var zTotal = 0
    for (sz <- Seq(4L, 8L, 16L); x0 <- 0L until 64L - sz by 13; y0 <- 0L until 64L - sz by 13) {
      val hr = runs(h, x0, x0 + sz - 1, y0, y0 + sz - 1)
      val zr = runs(z, x0, x0 + sz - 1, y0, y0 + sz - 1)
      hTotal += hr; zTotal += zr
    }
    assert(hTotal < zTotal,
      s"hilbert total runs $hTotal should beat morton $zTotal")
  }

  test("quantileNormalizeRef: rank-preserving map onto literal boundaries") {
    // boundaries [0, 10, 100], B=2: p<=0.5 interpolates [0,10], p>0.5 [10,100]
    val df = Seq(
      ("g", 1L, 5L), ("g", 2L, 7L), ("g", 3L, 7L), ("g", 4L, 50L), ("g", 5L, 9L),
      ("solo", 9L, 42L)).toDF("grp", "id", "x")
    val got = PrepOps.quantileNormalizeRef(
      df, col("id"), col("grp"), col("x"), Seq(0.0, 10.0, 100.0))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    // g ranks by (x, id): id1(5)->1, id2(7)->2, id3(7)->3, id5(9)->4,
    // id4(50)->5; n=5
    assert(got(1L) == ((0.0, 0.0)))
    assert(got(2L) == ((0.25, 5.0)))   // p*B=0.5 inside [0,10] -> 5
    assert(got(3L) == ((0.5, 10.0)))   // exactly the middle boundary
    assert(got(5L) == ((0.75, 55.0)))  // 10 + 0.5*(100-10)
    assert(got(4L) == ((1.0, 100.0)))  // top rank -> reference max
    // single-row group maps to the reference minimum by convention
    assert(got(9L) == ((0.0, 0.0)))
    // monotone: ranks never invert after normalization
    val g = Seq(1L, 2L, 3L, 5L, 4L).map(got(_)._2)
    assert(g == g.sorted)
  }

  test("curriculumInterleave: best of each source leads; positions interleave round-robin") {
    val df = Seq(
      ("a", 1L, 90L), ("a", 2L, 80L), ("a", 3L, 70L),
      ("b", 11L, 99L), ("b", 12L, 10L),
      ("c", 21L, 50L)).toDF("src", "id", "sc")
    val got = PrepOps.curriculumInterleave(df, col("id"), col("src"), col("sc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // source idx: a=0, b=1, c=2; position = (rank-1)*3 + idx
    assert(got == Map(
      1L -> ((1L, 0L)), 11L -> ((1L, 1L)), 21L -> ((1L, 2L)),
      2L -> ((2L, 3L)), 12L -> ((2L, 4L)),
      3L -> ((3L, 6L))), s"got $got")
    // positions are unique and round-1 docs precede every round-2 doc
    val pos = got.values.map(_._2).toSeq
    assert(pos.distinct.size == pos.size)
    // deterministic under layout
    val re = PrepOps.curriculumInterleave(df.repartition(7), col("id"),
      col("src"), col("sc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(re == got)
  }

  test("negativeSamples: k per id, never self, in-domain, deterministic; sparse domain refused") {
    val ids = (0L until 10L).map(Tuple1(_)).toDF("doc_id")
    val got = PrepOps.negativeSamples(ids, col("doc_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 30)
    got.foreach { case ((id, j), neg) =>
      assert(neg != id && neg >= 0 && neg < 10, s"($id,$j)->$neg")
      // the affine formula, self-bumped
      val raw = Math.floorMod(id * 2654435761L + j * 40503L + 104729L, 10L)
      assert(neg == (if (raw == id) (raw + 1) % 10 else raw))
    }
    // layout invariance
    val re = PrepOps.negativeSamples(ids.repartition(4), col("doc_id"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(re == got)
    // a hole in the domain fails loudly instead of aliasing onto it
    val sparse = Seq(0L, 1L, 3L).map(Tuple1(_)).toDF("doc_id")
    val err = intercept[Exception] {
      PrepOps.negativeSamples(sparse, col("doc_id"), 2).collect()
    }
    assert(err.getMessage.contains("dense"), err.getMessage)
  }

  test("quantileNormalizeRef rejects unsorted boundaries") {
    val df = Seq(("g", 1L, 5L)).toDF("grp", "id", "x")
    intercept[IllegalArgumentException] {
      PrepOps.quantileNormalizeRef(df, col("id"), col("grp"), col("x"),
        Seq(10.0, 0.0))
    }
  }

  test("paretoFrontier: hand-computed skyline, exact-tie duplicates, null drop") {
    val rows = Seq(
      (1L, 10L, 5L), // frontier (cheapest)
      (2L, 10L, 3L), // dominated by 1 (equal cost, lower gain)
      (3L, 20L, 8L), // frontier (more gain for more cost)
      (4L, 20L, 8L), // exact tie of 3 — both survive
      (5L, 25L, 8L), // dominated by 3 (costlier, same gain)
      (6L, 30L, 7L), // dominated by 3 (costlier AND lower gain)
      (7L, 40L, 9L), // frontier
      (8L, 50L, 9L)  // dominated by 7
    ).toDF("id", "cost", "gain")
      .union(Seq((9L, null.asInstanceOf[java.lang.Long], 99L))
        .toDF("id", "cost", "gain")) // null cost never participates
    val got = PrepOps.paretoFrontier(rows, col("cost"), col("gain"))
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L, 7L))
  }

  test("paretoFrontier matches the quadratic dominance predicate on a dense grid") {
    // every (cost, gain) in a 20x20 deterministic scatter
    val pts = (0L until 400L).map { i =>
      val c = (i * 2654435761L >>> 7) % 20
      val g = (i * 0x9e3779b97f4a7c15L >>> 9) % 20
      (i, c, g)
    }
    val df = pts.toDF("id", "cost", "gain")
    val got = PrepOps.paretoFrontier(df, col("cost"), col("gain"))
      .select(col("id")).as[Long].collect().toSet
    val want = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet
    assert(got == want)

    // the only global sort runs over the distinct-cost aggregate, and the
    // winner join is a broadcast semi join — never a corpus-wide sort
    val plan = PrepOps.paretoFrontier(df, col("cost"), col("gain"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"frontier must broadcast back:\n$plan")
  }
}
