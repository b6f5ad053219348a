package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  private val (m, ksub, dsub) = (4, 8, 16)
  private val cb = PqOps.literalCodebook(m, ksub, dsub)
  private def embs() =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Scala reference: encode one vector (float -> double widening, same
    * arithmetic as the column expressions).
    */
  private def refEncode(v: Array[Float]): Seq[Int] =
    (0 until m).map { j =>
      val dists = (0 until ksub).map { c =>
        (0 until dsub).map { d =>
          val x = v(j * dsub + d).toDouble - cb(j)(c)(d)
          x * x
        }.sum
      }
      dists.indexOf(dists.min) // first minimum = lowest centroid id
    }

  test("pqEncode matches the per-subspace argmin reference on real vectors") {
    val rows = embs().select($"vec_id", $"embedding",
      PqOps.pqEncode($"embedding", cb).as("codes")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val got = r.getSeq[Int](2)
      assert(got == refEncode(v), s"vec ${r.getLong(0)}")
      assert(got.forall(c => c >= 0 && c < ksub))
    }
  }

  test("fused PQ expressions are bit-identical to the composed reference forms") {
    import graft.expr.PqExprs
    val cents = IvfOps.literalCentroids(8, m * dsub)
    val e = embs().limit(200)
    // one frame computing every pair (fused, composed); zero mismatches
    val adcComposed = aggregate(
      zip_with(col("cF"), col("lF"), (cd, l) => element_at(l, cd + 1)),
      lit(0.0), (acc, x) => acc + x)
    val centsLit = array(cents.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val residComposed = transform(sequence(lit(1), lit(m * dsub)), d =>
      element_at(col("embedding"), d).cast("double") -
        element_at(element_at(centsLit, col("aF") + 1), d))
    val rows = e
      .select(col("vec_id"), col("embedding"),
        PqExprs.pqEncode(col("embedding"), cb).as("cF"),
        PqOps.pqEncodeComposed(col("embedding"), cb).as("cC"),
        PqExprs.pqLut(col("embedding"), cb).as("lF"),
        PqOps.pqLutComposed(col("embedding"), cb).as("lC"),
        PqExprs.vecNearestCentroid(col("embedding"), cents).as("aF"),
        IvfOps.assignmentColComposed(col("embedding"), cents).as("aC"))
      .withColumn("adcF", PqExprs.pqAdc(col("cF"), col("lF")))
      .withColumn("adcC", adcComposed)
      .withColumn("rF", PqExprs.vecResidual(col("embedding"), col("aF"), cents))
      .withColumn("rC", residComposed)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](2) == r.getSeq[Int](3), s"codes ${r.getLong(0)}")
      assert(r.getSeq[Seq[Double]](4) == r.getSeq[Seq[Double]](5),
        s"lut ${r.getLong(0)}")
      assert(r.getInt(6) == r.getInt(7), s"assignment ${r.getLong(0)}")
      assert(r.getDouble(8) == r.getDouble(9), s"adc ${r.getLong(0)}")
      assert(r.getSeq[Double](10) == r.getSeq[Double](11),
        s"residual ${r.getLong(0)}")
    }
  }

  test("fused PQ expressions are total on NULL / wrong-length vectors") {
    import graft.expr.PqExprs
    val cents = IvfOps.literalCentroids(4, m * dsub)
    val bad = Seq(
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array.fill(3)(1.0f)), // wrong length
      (3L, Array.fill(m * dsub)(0.5f))) // valid
      .toDF("vec_id", "embedding")
    val out = bad.select(
      PqExprs.pqEncode($"embedding", cb).as("c"),
      PqExprs.pqLut($"embedding", cb).as("l"),
      PqExprs.vecNearestCentroid($"embedding", cents).as("a"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(!out(2).isNullAt(0) && !out(2).isNullAt(1) && !out(2).isNullAt(2))
  }

  test("pqTopK equals the exhaustive ADC ranking (ties by corpus id)") {
    val e = embs()
    val all = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val codes = all.map { case (id, v) => id -> refEncode(v) }
    def lut(q: Array[Float]): Array[Array[Double]] =
      Array.tabulate(m, ksub)((j, c) =>
        (0 until dsub).map { d =>
          val x = q(j * dsub + d).toDouble - cb(j)(c)(d)
          x * x
        }.sum)
    val qIds = all.keys.filter(_ < 10).toSeq.sorted
    val expected = qIds.flatMap { qid =>
      val l = lut(all(qid))
      all.keys.toSeq
        .map(cid => (cid, (0 until m).map(j => l(j)(codes(cid)(j))).sum))
        .sortBy { case (cid, dist) => (dist, cid) }
        .take(10).zipWithIndex
        .map { case ((cid, dist), i) => (qid, i + 1, cid, dist) }
    }.toSet
    val got = PqOps.pqTopK(e.filter($"vec_id" < 10), e, k = 10, cb)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
  }

  test("pqTopK plan: queries broadcast, corpus never carries the raw vector, one output-sized shuffle") {
    val e = embs()
    val df = PqOps.pqTopK(e.filter($"vec_id" < 10), e, k = 10, cb)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast:\n$plan")
    assert(plan.contains("topk_by_score"),
      s"per-query top-k must be the partial aggregate:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"no corpus-sized window/sort:\n$plan")
  }

  test("ivfPqTopK equals the scalar IVF-PQ reference (assign, probe, residual-encode, per-list ADC)") {
    val nLists = 4
    val cents = IvfOps.literalCentroids(nLists, 64)
    val e = embs()
    val all = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

    def dot(v: Array[Float], c: Array[Double]): Double =
      (0 until 64).foldLeft(0.0)((acc, i) => acc + v(i).toDouble * c(i))
    // assignment: max dot, ties -> lowest cid (the struct-max nc trick)
    def assign(v: Array[Float]): Int =
      (0 until nLists).minBy(j => (-dot(v, cents(j)), j))
    def probes(v: Array[Float], nprobe: Int): Seq[Int] =
      (0 until nLists).sortBy(j => (-dot(v, cents(j)), j)).take(nprobe)
    def resid(v: Array[Float], cid: Int): Array[Double] =
      Array.tabulate(64)(i => v(i).toDouble - cents(cid)(i))
    def encR(r: Array[Double]): Seq[Int] =
      (0 until m).map { j =>
        val dists = (0 until ksub).map(c => (0 until dsub).map { d =>
          val x = r(j * dsub + d) - cb(j)(c)(d); x * x
        }.sum)
        dists.indexOf(dists.min)
      }

    val cids = all.map { case (id, v) => id -> assign(v) }
    val codes = all.map { case (id, v) => id -> encR(resid(v, cids(id))) }
    val expected = all.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      val qv = all(qid)
      val hits = probes(qv, 2).flatMap { p =>
        val lut = Array.tabulate(m, ksub)((j, c) => (0 until dsub).map { d =>
          val x = resid(qv, p)(j * dsub + d) - cb(j)(c)(d); x * x
        }.sum)
        all.keys.filter(cids(_) == p).map { cid =>
          (cid, (0 until m).map(j => lut(j)(codes(cid)(j))).sum)
        }
      }
      hits.sortBy { case (cid, d) => (d, cid) }.take(10).zipWithIndex
        .map { case ((cid, d), i) => (qid, i + 1, cid, d) }
    }.toSet
    val got = PqOps.ivfPqTopK(e.filter($"vec_id" < 10), e, k = 10,
        cents, cb, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
  }

  test("persisted index serves identically and prunes to the probed list directories") {
    val nLists = 4
    val cents = IvfOps.literalCentroids(nLists, 64)
    val e = embs()
    val dir = java.nio.file.Files.createTempDirectory("ivfpq")
      .resolve("index").toString
    val plan = PqOps.writeIndex(e, dir, cents, cb, targetRowsPerFile = 100L)
    // one directory per non-empty list, sized per the plan
    plan.keys.foreach { case Seq(cid) =>
      assert(new java.io.File(s"$dir/cid=$cid").exists(), s"missing list dir $cid")
    }

    // serving a single query must read ONLY its nprobe=2 probed lists
    val oneQ = e.filter($"vec_id" === 0)
    val served = PqOps.searchIndex(dir, oneQ, k = 10, cents, cb, nprobe = 2)
    val direct = PqOps.ivfPqTopK(oneQ, e, k = 10, cents, cb, nprobe = 2)
    assert(served.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
    val scan = served.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"),
      s"index scan must prune by list directory:\n$scan")
    // the static probe filter names exactly 2 of the 4 lists
    val probed = oneQ
      .select(explode(IvfOps.probesCol($"embedding", cents, 2)).as("cid"))
      .collect().map(_.getInt(0)).toSet
    assert(probed.size == 2)
    probed.foreach(c => assert(scan.contains(s"cid#") && scan.contains(c.toString)))

    // the full 10-query batch served from disk == the in-flight pipeline
    val q10 = e.filter($"vec_id" < 10)
    val servedAll = PqOps.searchIndex(dir, q10, k = 10, cents, cb, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val directAll = PqOps.ivfPqTopK(q10, e, k = 10, cents, cb, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(servedAll == directAll)
  }

  test("recall@10 of ADC vs exact cosine is a sane fraction on sf0.001") {
    val e = embs()
    val q = e.filter($"vec_id" < 10)
    val exact = SimilarityOps.bruteForceTopK(q, e, k = 10)
      .select($"query_id", $"corpus_id")
    val approx = PqOps.pqTopK(q, e, k = 10, cb)
      .select($"query_id", $"corpus_id")
    val recalls = exact.join(approx, Seq("query_id", "corpus_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1)).toSeq
    // a 4x8 integer codebook is a weak quantizer; the gate is structural:
    // recall is defined, bounded, and nonzero somewhere
    assert(recalls.forall(n => n >= 0 && n <= 10))
    assert(recalls.sum > 0, "ADC ranking shares nothing with exact — broken")
  }
}
