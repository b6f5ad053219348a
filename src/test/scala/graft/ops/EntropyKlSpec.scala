package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntropyKlSpec extends SparkSpec {
  import spark.implicits._

  private val Unit20 = 1L << 20

  test("tokenEntropy: hand-computed distributions on the 2^-20 grid") {
    val docs = Seq(
      (1L, "a b c d"),        // uniform over 4 -> H = 2 bits exactly
      (2L, "a a a a"),        // single type -> H = 0
      (3L, "a a b b"),        // uniform over 2 -> H = 1 bit exactly
      (4L, ""))               // token-free -> zeros
      .toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((4L, 4L, 2L * Unit20)))
    assert(got(2L) == ((4L, 1L, 0L)))
    assert(got(3L) == ((4L, 2L, 1L * Unit20)))
    assert(got(4L) == ((0L, 0L, 0L)))
    // a skewed distribution lands strictly between its neighbours:
    // "a a a b" -> H = 2 - 3/4*log2(3) ~ 0.811 bits
    val skew = TextOps.tokenEntropy(Seq((9L, "a a a b")).toDF("doc_id", "text"))
      .head().getLong(3)
    val want = (2.0 - 0.75 * math.log(3.0) / math.log(2.0)) * Unit20
    assert(math.abs(skew - want) < 8, s"got $skew want ~$want")
  }

  test("tokenKlByGroup: corpus-identical group scores ~0; skewed group > 0") {
    // group X speaks only 'aa', group Y only 'bb', group Z the blend
    val docs = Seq(
      ("x", "aa aa aa aa"), ("y", "bb bb bb bb"), ("z", "aa aa bb bb"))
      .toDF("source", "text")
    val got = ProfileOps.tokenKlByGroup(docs, col("source"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // corpus: aa 6/12, bb 6/12. X: KL = log2(2) = 1 bit/token -> sum = 4*2^20
    assert(got("x")._1 == 4L && math.abs(got("x")._2 - 4L * Unit20) <= 8)
    assert(math.abs(got("y")._2 - 4L * Unit20) <= 8)
    // Z IS the corpus blend -> KL ~ 0 (exact-grid zero here)
    assert(math.abs(got("z")._2) <= 8)
  }

  test("both statistics are layout-invariant on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e1 = TextOps.tokenEntropy(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val e2 = TextOps.tokenEntropy(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(e1 == e2 && e1.nonEmpty)
    val k1 = ProfileOps.tokenKlByGroup(d, col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val k2 = ProfileOps.tokenKlByGroup(d.repartition(5), col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(k1 == k2 && k1.nonEmpty)
  }
}
