package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.VectorExprs

class LatticeKmeansSpec extends SparkSpec {
  import spark.implicits._

  test("lattice_argmin packs the first-minimum cluster and exact dist2") {
    val cents = Seq(Seq(0L, 0L), Seq(10L, 0L), Seq(0L, 10L))
    val df = Seq(
      (1L, Seq(1L, 1L)), // dist2: 2, 82, 82 -> cluster 0
      (2L, Seq(9L, 0L)), // dist2: 81, 1, 181 -> cluster 1
      (3L, Seq(5L, 0L))) // TIE: 25 vs 25 (c0/c1) -> lowest j wins
      .toDF("id", "qv")
    val out = df.select(col("id"),
      VectorExprs.latticeArgmin(col("qv"), cents).as("p"))
      .select(col("id"),
        col("p").bitwiseAND(255L).cast("int").as("c"),
        shiftright(col("p"), 8).as("d2"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0, 2L)))
    assert(out(2L) == ((1, 1L)))
    assert(out(3L) == ((0, 25L)))
  }

  test("lattice_argmin: null vector / length mismatch / null element -> NULL") {
    val cents = Seq(Seq(0L, 0L))
    val df = Seq(
      (1L, Some(Seq(Some(1L), Some(2L)))),
      (2L, None),
      (3L, Some(Seq(Some(1L)))), // wrong dims
      (4L, Some(Seq(Some(1L), None)))) // null element
      .toDF("id", "qv")
    val out = df.select(col("id"),
      VectorExprs.latticeArgmin(col("qv"), cents).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("training converges deterministically on planted lattice clusters") {
    // two tight planted clusters around (0,0) and (1,1)
    val pts = (0 until 20).map(i => (i.toLong, Seq(0.001f * i, 0.001f * i))) ++
      (20 until 40).map(i => (i.toLong, Seq(1.0f - 0.001f * i, 1.0f)))
    val df = pts.toDF("vec_id", "embedding")
    val a = LatticeKmeans.assignments(df, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // both planted groups end up uniform (seeds 0 and 1 both start in
    // group A, but round-1 update pulls one centroid to each mass)
    val g1 = (0L until 20L).map(a)
    val g2 = (20L until 40L).map(a)
    assert(g1.distinct.size == 1 && g2.distinct.size == 1 && g1.head != g2.head,
      s"clusters: g1=${g1.distinct} g2=${g2.distinct}")
  }

  test("trainRounds exposes seeds and per-round snapshots consistently") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rounds = LatticeKmeans.trainRounds(df, k = 4, iters = 2)
    assert(rounds.size == 3) // seeds + 2 Lloyd rounds
    // element 0 = the lowest-4-ids seed vectors (the oracle's c0)
    val seeds = df.orderBy(col("vec_id")).limit(4)
      .select(LatticeKmeans.quantize(col("embedding")).cast("array<long>"))
      .collect().map(_.getSeq[Long](0).toArray)
    assert(rounds.head.map(_.toSeq).toSeq == seeds.map(_.toSeq).toSeq)
    // last snapshot IS what train() returns
    val fin = LatticeKmeans.train(df, k = 4, iters = 2)
    assert(rounds.last.map(_.toSeq).toSeq == fin.map(_.toSeq).toSeq)
    // the fd stage's minimum per vec reproduces assignments' (cluster, dist2)
    val byMin = LatticeKmeans.allDistances(df, fin)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getInt(1))))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).min }
    val asg = LatticeKmeans.assignments(df, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(1)))).toMap
    assert(byMin == asg)
  }

  test("result is invariant under repartitioning (integer-exact reductions)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = LatticeKmeans.assignments(df, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = LatticeKmeans.assignments(df.repartition(7), k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("lattice semDedup groups planted duplicates, keeps min-id reps") {
    // ids 0/1/2 identical (dup group), 10/11 near-identical, 20 isolated
    val v1 = Seq.tabulate(4)(i => 0.1f * (i + 1))
    val v2 = Seq.tabulate(4)(i => -0.2f + 0.05f * i)
    val v3 = Seq(0.3f, -0.4f, 0.1f, 0.2f)
    val df = (Seq((0L, v1), (1L, v1), (2L, v1), (20L, v3)) ++
      Seq((10L, v2), (11L, v2.map(x => x * 1.001f))))
      .toDF("vec_id", "embedding")
    val out = LatticeKmeans.semDedup(df, k = 2, iters = 2,
      tauNum = 19, tauDen = 20, vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out.contains((0L, 0L, 1)))
    assert(out.contains((1L, 0L, 0)) && out.contains((2L, 0L, 0)))
    assert(out.contains((10L, 10L, 1)) && out.contains((11L, 10L, 0)))
    assert(out.contains((20L, 20L, 1)))
  }

  test("ivfTopK with all lists probed == exact brute-force L2 ranking") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = LatticeKmeans.ivfTopK(
      df.filter(col("vec_id") < 5), df, k = 8, nLists = 4, iters = 2,
      nprobe = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute-force reference on the driver over the same quantization
    val rows = df.select(col("vec_id"),
      LatticeKmeans.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = rows.filter(_._1 < 5).flatMap { case (qid, qv) =>
      rows.map { case (cid2, cv) => (cid2, d2(qv, cv)) }
        .sortBy { case (cid2, d) => (d, cid2) }
        .take(8).zipWithIndex
        .map { case ((cid2, d), i) => (qid, i + 1, cid2, d) }
    }.toSet
    assert(got == expect)
  }

  test("coresetSample picks greedy farthest points with lowest-id ties") {
    // 1-D line embedded in 2-D: ids 0..4 at x = 0, 1, 2, 10, 11
    val pts = Seq(0L -> 0f, 1L -> 1f, 2L -> 2f, 3L -> 10f, 4L -> 11f)
    val df = pts.map { case (id, x) => (id, Seq(x / 16f, 0f)) }
      .toDF("vec_id", "embedding")
    val got = LatticeKmeans.coresetSample(df, m = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    val u = 65536L * 65536L // (1/16 scaled by 2^20)^2 per unit step
    // pick 1: lowest id (0, at x=0). pick 2: farthest = x=11 (id 4,
    // d2=121u). pick 3: min-dist map {1:1u, 2:4u, 3:1u} -> max 4u (id
    // 2). pick 4: {1:1u, 3:1u} -> tie at 1u -> lowest id 1.
    assert(got(0) == ((1, 0L, -1L)))
    assert(got(1) == ((2, 4L, 121L * u)))
    assert(got(2) == ((3, 2L, 4L * u)))
    assert(got(3) == ((4, 1L, 1L * u)))
    // corpus smaller than m: stops after exhausting ids
    val small = LatticeKmeans.coresetSample(
      pts.take(2).map { case (id, x) => (id, Seq(x / 16f, 0f)) }
        .toDF("vec_id", "embedding"), m = 6)
    assert(small.count() == 2)
  }

  test("empty and all-null corpora yield total (null-clustered) output") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(LatticeKmeans.assignments(empty, 4, 2).collect().isEmpty)
    val nulled = Seq((1L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val rows = LatticeKmeans.assignments(nulled, 4, 2).collect()
    assert(rows.length == 1 && rows.head.isNullAt(1) && rows.head.isNullAt(2))
  }
}
