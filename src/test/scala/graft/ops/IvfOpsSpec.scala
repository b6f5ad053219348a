package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  /** 8 well-separated clusters x 40 members in 16 dims. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(17)
    val centers = Seq.fill(8)(Array.fill(16)(rnd.nextGaussian() * 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 40
    } yield ((ci * 40 + j).toLong,
      c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    vecs(rows: _*)
  }

  test("assignment and probes are row-local, deterministic, tie-broken by cid") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val df = vecs(0L -> Seq(2f, 0.1f), 1L -> Seq(0.1f, 2f))
    val a = df.select($"vec_id", IvfOps.assignmentCol($"embedding", cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // vec 0 ties centroids 0 and 2 exactly -> lower cid wins
    assert(a == Map(0L -> 0, 1L -> 1))
    val p = df.filter($"vec_id" === 0)
      .select(IvfOps.probesCol($"embedding", cents, 2))
      .collect().head.getSeq[Int](0)
    assert(p == Seq(0, 2)) // equal scores -> cid ascending
  }

  test("training converges on planted clusters; ivfTopK hits high recall at low cost") {
    val cents = IvfOps.trainCentroids(clustered, k = 8, iters = 3)
    assert(cents.length == 8)

    // lists are balanced-ish: every cluster of 40 lands somewhere
    val sizes = clustered
      .select(IvfOps.assignmentCol($"embedding", cents).as("cid"))
      .groupBy($"cid").count().collect().map(_.getLong(1))
    assert(sizes.sum == 320)

    val queries = clustered.filter($"vec_id" % 40 === 0) // one per cluster
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = hits(SimilarityOps.bruteForceTopK(queries, clustered, 10))
    val got = hits(IvfOps.ivfTopK(queries, clustered, 10, cents, nprobe = 2))
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"clustered recall $recall < 0.9")

    // cost: nprobe=2 of k=8 probes ~1/4 of the corpus per query
    val candFrac = clustered
      .select(IvfOps.assignmentCol($"embedding", cents).as("cid"))
      .groupBy($"cid").count().collect().map(_.getLong(1)).max.toDouble * 2 / 320
    assert(candFrac < 0.8, s"probed fraction $candFrac not bounded")
  }

  test("trained centroids are bit-identical under any input layout") {
    val a = IvfOps.trainCentroids(clustered.coalesce(1), k = 8, iters = 3)
    val b = IvfOps.trainCentroids(clustered.repartition(13), k = 8, iters = 3)
    a.zip(b).zipWithIndex.foreach { case ((ca, cb), i) =>
      assert(ca.toSeq == cb.toSeq, s"centroid $i differs across layouts")
    }
  }

  test("every IVF hit carries the exact brute-force cosine (verify step is exact)") {
    val cents = IvfOps.trainCentroids(clustered, k = 8, iters = 2)
    val queries = clustered.filter($"vec_id" < 3)
    val brute = SimilarityOps.bruteForceTopK(queries, clustered, 320)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    IvfOps.ivfTopK(queries, clustered, 10, cents, nprobe = 3).collect()
      .foreach(r => assert(brute((r.getLong(0), r.getLong(2))) == r.getDouble(3)))
  }

  test("graceful degradation on the unclustered sf0.001 corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = IvfOps.trainCentroids(emb, k = 8, iters = 2)
    val queries = emb.filter($"vec_id" < 10)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = hits(SimilarityOps.bruteForceTopK(queries, emb, 10))
    val got = hits(IvfOps.ivfTopK(queries, emb, 10, cents, nprobe = 6))
    val recall = (got & truth).size.toDouble / truth.size
    // near-random vectors: nprobe=6/8 probes most of the corpus -> recall
    // should stay usable, never collapse
    assert(recall >= 0.7, s"unclustered recall $recall < 0.7")
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("incremental IVF: probe after append == probe after full list rebuild on the union") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val delta = emb.filter($"vec_id" % 3 === 0)
    val queries = emb.filter($"vec_id" < 10)

    val incr = tmp("ivf_incr_")
    IvfIndexOps.build(base, incr, nLists = 4, iters = 2)
    IvfIndexOps.append(delta, incr, segment = "delta1")

    // full rebuild of the LIST FILES over the union corpus under the SAME
    // quantizer (trainOn = base) — the FAISS add-after-train invariant:
    // adding in two batches == adding everything at once
    val full = tmp("ivf_full_")
    IvfIndexOps.build(emb, full, nLists = 4, iters = 2, trainOn = Some(base))

    def probeSet(path: String) =
      IvfIndexOps.probe(queries, path, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    val a = probeSet(incr)
    assert(a == probeSet(full))
    assert(a.nonEmpty)
    // and both equal the in-memory ivfTopK when ITS training corpus and
    // list corpus match the persisted index's
    val mem = LatticeKmeans.ivfTopK(queries, emb, k = 10, nLists = 4,
      iters = 2, nprobe = 2)
    // (in-memory trains on the FULL corpus, so only compare when the
    // quantizers agree: train persisted centroids on the full corpus too)
    val full2 = tmp("ivf_full2_")
    IvfIndexOps.build(emb, full2, nLists = 4, iters = 2)
    assert(probeSet(full2) ==
      mem.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("incremental IVF: drift report flags out-of-distribution appends only") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter($"vec_id" % 3 =!= 0)
    val inDist = emb.filter($"vec_id" % 3 === 0)
    // out-of-distribution delta: every coordinate pushed off the unit
    // ball the quantizer was trained on (scaled within the lattice
    // packing bound |elem| <= 2^22, i.e. |x| <= 4 at Scale = 2^20)
    val outDist = emb.filter($"vec_id" % 3 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * 2f + 3f).as("embedding"))

    val idx = tmp("ivf_drift_")
    IvfIndexOps.build(base, idx, nLists = 4, iters = 2)
    IvfIndexOps.append(inDist, idx, segment = "good")
    IvfIndexOps.append(outDist, idx, segment = "shifted")

    val rep = IvfIndexOps.driftReport(spark, idx)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rep("base") == false)
    assert(rep("good") == false, "in-distribution append must not flag")
    assert(rep("shifted") == true, "out-of-distribution append must flag")
  }
}
