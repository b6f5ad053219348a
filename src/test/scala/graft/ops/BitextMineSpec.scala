package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  private val K = 2
  private val TauN = 21L
  private val TauD = 20L

  /** Independent reference miner: plain Scala over the same quantization,
    * no shared ranking/aggregation code with the operator.
    */
  private def reference(
      src: Seq[(Long, Seq[Float])],
      tgt: Seq[(Long, Seq[Float])]): Map[(Long, Long), (Long, Long, Long)] = {
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * LatticeKmeans.Scale + 0.5).toLong)
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qs = src.map { case (id, v) => id -> quant(v) }
    val qt = tgt.map { case (id, v) => id -> quant(v) }
    def topk(of: Seq[Long], others: Seq[(Long, Seq[Long])]): Seq[(Long, Long)] =
      others.map { case (id, v) => (id, dot(of, v)) }
        .sortBy { case (id, d) => (-d, id) }.take(K)
    val sumSrc = qs.map { case (id, v) => id -> topk(v, qt).map(_._2).sum }.toMap
    val sumTgt = qt.map { case (id, v) => id -> topk(v, qs).map(_._2).sum }.toMap
    qs.flatMap { case (sid, sv) =>
      val (bid, bdot) = topk(sv, qt).head
      val pass = 2L * K * bdot * TauD > TauN * (sumSrc(sid) + sumTgt(bid))
      if (pass) Some((sid, bid) -> (bdot, sumSrc(sid), sumTgt(bid))) else None
    }.toMap
  }

  private def mine(
      src: Seq[(Long, Seq[Float])],
      tgt: Seq[(Long, Seq[Float])]): Map[(Long, Long), (Long, Long, Long)] =
    SimilarityOps.bitextMine(
        src.toDF("vec_id", "embedding"), tgt.toDF("vec_id", "embedding"),
        k = K, tauNum = TauN, tauDen = TauD)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("planted translation mined; hub-ambiguous source rejected") {
    // src 0 has an exact translation (tgt 10) among orthogonal noise;
    // src 2 is equally close to every target — no margin, no pair
    val src = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
    val tgt = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)),
      (11L, Seq(0f, 1f, 0f, 0f)),
      (12L, Seq(0f, 0f, 1f, 0f)),
      (13L, Seq(0f, 0f, 0f, 1f)))
    val got = mine(src, tgt)
    assert(got.keySet == Set((0L, 10L)))
    assert(got == reference(src, tgt))
  }

  test("matches the independent reference on a deterministic corpus") {
    // splitmix-ish deterministic floats in [-1, 1), 8 dims, 12 x 14 ids
    def vec(seed: Long): Seq[Float] = (0 until 8).map { d =>
      var z = seed * 6364136223846793005L + d * 1442695040888963407L
      z ^= z >>> 29; z *= -4658895280553007687L; z ^= z >>> 32
      ((z >>> 11).toDouble / (1L << 53).toDouble * 2 - 1).toFloat
    }
    val src = (0L until 12L).map(i => i -> vec(i))
    val tgt = (100L until 114L).map(i => i -> vec(i / 2)) // some parallel pairs
    val got = mine(src, tgt)
    val want = reference(src, tgt)
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "reference should mine at least one pair")
  }
}
