package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("codegen VecDot is bit-identical to the zip_with/aggregate fold spec") {
    val rnd = new scala.util.Random(17)
    val df = (0 until 500).map { _ =>
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("a", "b")
    val out = df.select(
      SimilarityOps.dot($"a", $"b").as("fast"),
      SimilarityOps.dotFold($"a", $"b").as("spec")).collect()
    out.foreach { r =>
      // exact bit equality, not tolerance — same sequential accumulation
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    // null propagation parity: null element and length mismatch
    val weird = Seq(
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f)),
      (Seq[java.lang.Float](1f), Seq[java.lang.Float](1f, 2f))
    ).toDF("a", "b")
    val w = weird.select(
      SimilarityOps.dot($"a", $"b"), SimilarityOps.dotFold($"a", $"b")).collect()
    w.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("cosine matches hand computation; zero vector yields NULL") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)), //   identical -> 1
      (Seq(1f, 0f), Seq(0f, 1f)), //   orthogonal -> 0
      (Seq(1f, 0f), Seq(-1f, 0f)), //  opposite -> -1
      (Seq(1f, 2f), Seq(0f, 0f)) //    zero norm -> NULL
    ).toDF("a", "b")
    val out = df.select(SimilarityOps.cosine($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).getDouble(0) == -1.0)
    assert(out(3).isNullAt(0))
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val corpus = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0f, 1f),
      3L -> Seq(1f, 0f)) // exact tie with 0 -> id order
    val q = vecs(100L -> Seq(1f, 0f))
    val out = SimilarityOps.bruteForceTopK(q, corpus, 3, "vec_id", "vec_id")
      .orderBy($"rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 3L, 1L))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(out(0).getDouble(3) == 1.0)
  }

  test("bruteForceTopK with STRING ids: same path, aggregate plan, no window") {
    val corpus = Seq(
      ("doc_a", Seq(1f, 0f)), ("doc_b", Seq(0.9f, 0.1f)),
      ("doc_c", Seq(0f, 1f)), ("doc_0", Seq(1f, 0f)) // tie -> "doc_0" first
    ).toDF("vec_id", "embedding")
    val q = Seq(("query", Seq(1f, 0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.bruteForceTopK(q, corpus, 3, "vec_id", "vec_id")
    val rows = out.orderBy($"rank").collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("doc_0", "doc_a", "doc_b"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // plan pin: the generalized TopKByScoreAgg handles non-integral ids —
    // no row_number window (which would shuffle every scored row)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"), s"partial top-k agg expected:\n$plan")
    assert(!plan.contains("Window"), s"no full-score window for string ids:\n$plan")
  }

  test("lshTopK returns a subset of brute-force results within buckets") {
    val rnd = new scala.util.Random(13)
    val corpus = vecs((0L until 200L).map(i =>
      i -> Seq.fill(16)(rnd.nextFloat() * 2 - 1)): _*)
    val queries = corpus.filter($"vec_id" < 5)
    val brute = SimilarityOps.bruteForceTopK(queries, corpus, 200)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = SimilarityOps.lshTopK(queries, corpus, 10, planes = 4, dims = 16)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      // every LSH hit carries the exact same cosine as brute force
      assert(brute(key) == r.getDouble(3))
    }
    // query always lands in its own bucket -> self-hit at rank 1
    assert(lsh.count(r => r.getLong(0) == r.getLong(2) && r.getInt(1) == 1) == 5)
  }

  test("multi-table LSH recall dominates single-table recall") {
    val rnd = new scala.util.Random(43)
    val corpus = vecs((0L until 300L).map(i =>
      i -> Seq.fill(16)(rnd.nextFloat() * 2 - 1)): _*)
    val queries = corpus.filter($"vec_id" < 20)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = hits(SimilarityOps.bruteForceTopK(queries, corpus, 5))
    val single = hits(SimilarityOps.lshTopK(queries, corpus, 5, planes = 4, dims = 16))
    val multi = hits(SimilarityOps.lshTopKMulti(
      queries, corpus, 5, planes = 4, dims = 16, tables = 8))
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    assert(rMulti >= rSingle)
    assert(rMulti > 0.5, s"multi-table recall $rMulti unexpectedly low")
    // candidates are real: every reported cosine matches brute force
    val bruteAll = SimilarityOps.bruteForceTopK(queries, corpus, 300)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    SimilarityOps.lshTopKMulti(queries, corpus, 5, 4, 16, 8).collect()
      .foreach(r => assert(bruteAll((r.getLong(0), r.getLong(2))) == r.getDouble(3)))
  }

  test("fused LshPlanesBucket equals the unfused per-plane VecDot form bit for bit") {
    val rnd = new scala.util.Random(23)
    val df = (0 until 300).map(i => (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    for (table <- Seq(0, 3)) {
      val unfused = (0 until 8).foldLeft(lit(0L)) { (acc, j) =>
        val w = array((0 until 64).map(d =>
          lit(SimilarityOps.planeWeight(table * 8 + j, d).toDouble)): _*)
        acc.bitwiseOR(shiftleft(
          when(SimilarityOps.dot($"embedding", w) >= 0, lit(1L)).otherwise(lit(0L)), j))
      }
      val out = df.select(
        SimilarityOps.lshBucketTable($"embedding", table, planes = 8, dims = 64).as("fused"),
        unfused.as("spec")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1), s"table=$table"))
    }
  }

  test("lshAllBuckets equals the per-table lshBucketTable family bit for bit") {
    val rnd = new scala.util.Random(37)
    val df = (0 until 200).map(i => (i.toLong, Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val tables = 5
    val out = df.select(
      graft.expr.VectorExprs.lshAllBuckets($"embedding", 6, 32, tables).as("all"),
      array((0 until tables).map(t =>
        SimilarityOps.lshBucketTable($"embedding", t, planes = 6, dims = 32)): _*).as("each"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("lshBucket is deterministic and spreads vectors") {
    val rnd = new scala.util.Random(29)
    val df = vecs((0L until 256L).map(i =>
      i -> Seq.fill(16)(rnd.nextFloat() * 2 - 1)): _*)
    val b1 = df.select($"vec_id",
      SimilarityOps.lshBucket($"embedding", 6, 16).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = df.repartition(7).select($"vec_id",
      SimilarityOps.lshBucket($"embedding", 6, 16).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2) // partitioning-independent
    assert(b1.values.toSet.size > 16) // not collapsing to a few buckets
    assert(b1.values.forall(b => b >= 0 && b < 64))
  }

  test("lshNearDupPairs: subset of brute force with exact cosines; finds planted dup") {
    val rnd = new scala.util.Random(31)
    val base = Seq.fill(32)(rnd.nextFloat() * 2 - 1)
    val nearDup = base.updated(0, base.head + 0.01f)
    val others = (2L until 60L).map(i => i -> Seq.fill(32)(rnd.nextFloat() * 2 - 1))
    val df = vecs((Seq(0L -> base, 1L -> nearDup) ++ others): _*)
    val brute = SimilarityOps.cosineNearDupPairs(df, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SimilarityOps.lshNearDupPairs(
      df, 0.5, planes = 4, dims = 32, tables = 8).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key), s"LSH produced non-brute pair $key")
      assert(brute(key) == r.getDouble(2)) // exact-cosine verify, bit-equal
    }
    // a true near-duplicate (cosine ~1) collides in essentially every table
    assert(lsh.exists(r => (r.getLong(0), r.getLong(1)) == (0L, 1L)))
  }

  test("lshNearDupPairs recall >= 0.9 vs brute force on the sf0.001 corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(SimilarityOps.cosineNearDupPairs(emb, 0.35))
    val got = pairSet(SimilarityOps.lshNearDupPairs(
      emb, 0.35, planes = 4, dims = 64, tables = 16))
    assert(got.subsetOf(truth))
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall below 0.9 (${got.size}/${truth.size})")
  }

  test("lshNearDupPairs maxBucketSize drops oversized buckets but keeps exactness") {
    val rnd = new scala.util.Random(47)
    val df = vecs((0L until 80L).map(i =>
      i -> Seq.fill(16)(rnd.nextFloat() * 2 - 1)): _*)
    val brute = SimilarityOps.cosineNearDupPairs(df, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = SimilarityOps.lshNearDupPairs(
      df, 0.4, planes = 2, dims = 16, tables = 4, maxBucketSize = Some(10)).collect()
    capped.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("cosineNearDupPairs finds planted duplicates only") {
    val rnd = new scala.util.Random(31)
    val base = Seq.fill(32)(rnd.nextFloat() * 2 - 1)
    val nearDup = base.updated(0, base.head + 0.01f)
    val others = (2L until 40L).map(i => i -> Seq.fill(32)(rnd.nextFloat() * 2 - 1))
    val df = vecs((Seq(0L -> base, 1L -> nearDup) ++ others): _*)
    val pairs = SimilarityOps.cosineNearDupPairs(df, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("projectCol matches the sequential-fold hand computation exactly") {
    val v = Seq.tabulate(8)(i => (i * 0.25f - 1f))
    val df = vecs(0L -> v)
    val got = df.select(
      (0 until 4).map(j => SimilarityOps.projectCol($"embedding", j, 8, 4).as(s"p$j")): _*)
      .head()
    (0 until 4).foreach { j =>
      var acc = 0.0
      (0 until 8).foreach { d =>
        acc += v(d).toDouble * SimilarityOps.planeWeight(j, d).toDouble
      }
      val want = acc / 2.0 // sqrt(4)
      assert(java.lang.Double.doubleToRawLongBits(got.getDouble(j)) ==
        java.lang.Double.doubleToRawLongBits(want), s"component $j")
    }
  }

  test("semDedup collapses planted duplicate groups to their min-id representative") {
    val rnd = new scala.util.Random(7)
    // 3 well-separated orthogonal base directions, 4 jittered copies each,
    // plus one unrelated singleton
    val bases = Seq(
      Array.tabulate(15)(i => if (i < 5) 1.0 else 0.0),
      Array.tabulate(15)(i => if (i >= 5 && i < 10) 1.0 else 0.0),
      Array.tabulate(15)(i => if (i >= 10) 1.0 else 0.0))
    val rows = bases.zipWithIndex.flatMap { case (b, g) =>
      (0 until 4).map(j =>
        (g * 10L + j, b.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat).toSeq))
    } :+ (99L, Array.tabulate(15)(i => if (i % 2 == 0) 1.0f else -1.0f).toSeq)
    val df = vecs(rows: _*)
    // k = number of base directions: with k above it, k-means can SPLIT a
    // tight duplicate group across two centroids and the within-cluster
    // pass loses those pairs — the paper's recall trade, surfaced here
    val cents = IvfOps.trainCentroids(df, k = 3, iters = 3)
    val got = SimilarityOps.semDedup(df, cents, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = bases.indices.flatMap { g =>
      (0 until 4).map(j => (g * 10L + j, g * 10L, if (j == 0) 1 else 0))
    }.toSet + ((99L, 99L, 1))
    assert(got == want)
    // within-cluster dedup equals the global brute-force components here:
    // duplicate groups are tight (cos ~ 1) and the bases are orthogonal
    val bruteComp = GraphOps.componentsOf(
      df, "vec_id",
      SimilarityOps.cosineNearDupPairs(df, 0.95), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)) == bruteComp)
  }

  test("knnClassify: majority vote, all-distinct tie -> min label, zero norm drops") {
    val labeled = Seq(
      (0L, Seq(1f, 0f), 2),
      (1L, Seq(0.9f, 0.1f), 3),
      (2L, Seq(0f, 1f), 5),
      (3L, Seq(0.1f, 0.9f), 5)).toDF("vec_id", "embedding", "label")
    val corpus = vecs(
      100L -> Seq(1f, 0.05f), //  neighbors 0,1,3 -> labels 2,3,5: tie -> 2
      101L -> Seq(0f, 1f), //     neighbors 2,3 (label 5 x2), 3rd differs -> 5
      102L -> Seq(0f, 0f)) //     zero norm -> classified against nothing
    val out = SimilarityOps.knnClassify(corpus, labeled, k = 3)
      .orderBy($"vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4)))
    assert(out.toSeq == Seq((100L, 2, 1, 0L), (101L, 5, 2, 2L)))
    // best cosine of 101 is the exact hit on labeled 2
    val best = SimilarityOps.knnClassify(corpus, labeled, k = 3)
      .filter($"vec_id" === 101L).select($"best_cosine").head().getDouble(0)
    assert(best == 1.0)
  }

  test("knnClassify rejects labels outside the encoding domain at runtime") {
    val labeled = Seq((0L, Seq(1f, 0f), 300)).toDF("vec_id", "embedding", "label")
    val corpus = vecs(100L -> Seq(1f, 0f))
    val e = intercept[Exception] {
      SimilarityOps.knnClassify(corpus, labeled, k = 1).collect()
    }
    assert(e.getMessage.contains("label in [0,255]") ||
      Option(e.getCause).exists(_.getMessage.contains("label in [0,255]")))
  }

  test("knnClassify is partitioning-invariant and matches a window-rank reference") {
    val rnd = new scala.util.Random(23)
    val all = (0L until 120L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1), (i % 7).toInt)
    }.toDF("vec_id", "embedding", "label")
    val labeled = all.filter($"vec_id" % 3 === 0)
    val corpus = all.filter($"vec_id" % 3 =!= 0).select($"vec_id", $"embedding")
    val got = SimilarityOps.knnClassify(corpus, labeled, k = 5)
    // independent formulation: window rank over all scored pairs + vote
    val scored = corpus.as("c").crossJoin(labeled.as("l"))
      .select($"c.vec_id".as("cid"), $"l.vec_id".as("lid"), $"l.label".as("lbl"),
        SimilarityOps.cosine($"c.embedding", $"l.embedding").as("cos"))
      .filter($"cos".isNotNull)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"cid")
          .orderBy($"cos".desc, $"lid")))
      .filter($"rank" <= 5)
    val want = scored.groupBy($"cid", $"lbl").agg(count(lit(1)).as("v"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"cid")
          .orderBy($"v".desc, $"lbl")))
      .filter($"r" === 1)
      .join(scored.filter($"rank" === 1)
        .select($"cid", $"cos".as("best"), $"lid".as("nn")), Seq("cid"))
      .select($"cid", $"lbl", $"v".cast("int"), $"best", $"nn")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4))).toSet
    val g1 = got.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4))).toSet
    assert(g1 == want)
    // layout invariance: 1 partition vs 13
    val g2 = SimilarityOps.knnClassify(
      corpus.repartition(13), labeled.coalesce(1), k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4))).toSet
    assert(g2 == g1)
  }

  test("maxSimTopK: term-level match beats the pooled average; self-doc ranks first") {
    import spark.implicits._
    // query doc 0 = two orthogonal "terms". corpus doc 1 hits ONE term
    // exactly (MaxSim = S² + 0); corpus doc 2 is a 0.4/0.4 blur
    // (MaxSim = 0.8 S²). POOLED means rank them the OTHER way
    // (0.25 S² vs 0.4 S²) — the separation late interaction exists for.
    val vecs = Seq(
      (0L, 0L, Seq(1f, 0f, 0f, 0f)),
      (0L, 1L, Seq(0f, 1f, 0f, 0f)),
      (1L, 10L, Seq(1f, 0f, 0f, 0f)),
      (1L, 11L, Seq(0f, 0f, 1f, 0f)),
      (2L, 20L, Seq(0.4f, 0.4f, 0f, 0f)),
      (2L, 21L, Seq(0.4f, 0.4f, 0f, 0f)))
      .toDF("doc", "vec_id", "embedding")
    val queries = vecs.filter($"doc" === 0L)
    val corpus = vecs // self-doc included
    val got = SimilarityOps.maxSimTopK(queries, corpus, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val S = 1L << 20
    // self at rank 1 with score 2*S^2 (each term matches itself)
    assert(got((0L, 1)) == (0L, 2L * S * S))
    // MaxSim order: term-hit doc 1 above blur doc 2
    val (d1, s1) = got((0L, 2))
    val (d2, s2) = got((0L, 3))
    assert(d1 == 1L && d2 == 2L, s"ranking: $got")
    assert(s1 == S * S && s2 < s1 && s2 > 0)
    // and the pooled-mean ranking really is inverted (the contrast claim)
    def pooledDot(a: Seq[Float], b: Seq[Float], c: Seq[Float], d: Seq[Float]) = {
      val qm = a.zip(b).map { case (x, y) => (x + y) / 2 }
      val cm = c.zip(d).map { case (x, y) => (x + y) / 2 }
      qm.zip(cm).map { case (x, y) => x.toDouble * y }.sum
    }
    val q = (Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))
    val p1 = pooledDot(q._1, q._2, Seq(1f, 0f, 0f, 0f), Seq(0f, 0f, 1f, 0f))
    val p2 = pooledDot(q._1, q._2, Seq(0.4f, 0.4f, 0f, 0f), Seq(0.4f, 0.4f, 0f, 0f))
    assert(p2 > p1, "pooled means must prefer the blur for the contrast to mean anything")
  }

  test("twoStageTopK: full-width front == brute force; narrow front shows the recall trade") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    def ranking(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // frontDims = full width and kCand = corpus size degrade EXACTLY to
    // the brute-force ranking (stage 1 cannot drop a true top-k hit)
    val n = e.count().toInt
    val full = ranking(SimilarityOps.twoStageTopK(q, e, k = 10, kCand = n, frontDims = 64))
    val brute = ranking(SimilarityOps.bruteForceTopK(q, e, k = 10))
    assert(full == brute)
    // a narrow front with a tight candidate budget is a DIFFERENT
    // (cheaper) ranking on real data — the measured recall trade
    val narrow = ranking(SimilarityOps.twoStageTopK(q, e, k = 10, kCand = 12, frontDims = 8))
    assert(narrow.nonEmpty && narrow.map(_._1) == brute.map(_._1))
    // stage-2 cosines are FULL-dim: every returned pair's cosine equals
    // the brute-force cosine for that pair
    val bruteCos = SimilarityOps.bruteForceTopK(q, e, k = n)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    SimilarityOps.twoStageTopK(q, e, k = 10, kCand = 12, frontDims = 8)
      .collect().foreach { r =>
        assert(r.getDouble(3) == bruteCos((r.getLong(0), r.getLong(2))))
      }
  }
}
