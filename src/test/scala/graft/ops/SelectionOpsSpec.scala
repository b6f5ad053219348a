package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("log2Fixed: exact on powers of two, within 2 ulp of log2 elsewhere") {
    for (k <- 0 to 62)
      assert(SelectionOps.log2Fixed(1L << k) == k.toLong << 20)
    for (v <- Seq(3L, 7L, 1000L, 999999937L, 12345678901L, (1L << 62) - 1)) {
      val got = SelectionOps.log2Fixed(v)
      val want = math.log(v.toDouble) / math.log(2.0) * (1L << 20)
      assert(math.abs(got - want) <= 2.0, s"v=$v got=$got want=$want")
    }
    intercept[IllegalArgumentException](SelectionOps.log2Fixed(0L))
  }

  test("dsirScores separates planted target-like vocabulary") {
    // target docs speak 'alpha beta', raw-only docs speak 'zulu yankee';
    // a mixed doc scores between them
    val docs = (
      (0 until 10).map(i => (i.toLong, "alpha beta alpha beta alpha", true)) ++
      (10 until 20).map(i => (i.toLong, "zulu yankee zulu yankee zulu", false)) ++
      Seq((20L, "alpha beta zulu yankee", false)))
      .toDF("doc_id", "text", "is_target")
    val got = SelectionOps.dsirScores(docs, col("is_target"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) > 0, s"target-vocab doc should score positive: ${got(0L)}")
    assert(got(10L) < 0, s"raw-only-vocab doc should score negative: ${got(10L)}")
    assert(got(20L) > got(10L) && got(20L) < got(0L))
  }

  test("dsirScores is layout-invariant and total (token-free docs score 0)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      SelectionOps.dsirScores(df, col("lang") === "en", buckets = 512)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(d)
    assert(run(d.repartition(7)) == a)
    assert(a.size == d.count())
    val empty = Seq((999999L, "", "en")).toDF("doc_id", "text", "lang")
    val z = SelectionOps.dsirScores(
      d.select("doc_id", "text", "lang").unionByName(empty),
      col("lang") === "en", buckets = 512)
      .filter(col("doc_id") === 999999L).head()
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L)
  }
}
