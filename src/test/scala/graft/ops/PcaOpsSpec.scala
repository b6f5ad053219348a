package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("planted dominant direction is recovered as pc1") {
    // points spread along (1,1,0,0)/sqrt(2) with tiny noise on (0,0,1,0)
    val pts = (0 until 80).map { i =>
      val a = (i - 40) * 0.02f
      val eps = ((i % 5) - 2) * 0.001f
      (i.toLong, Seq(a, a, eps, 0.0f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = PcaOps.fit(df, m = 2, dims = 4)
    val e1 = m.components(0)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(e1(0) - s) < 1e-6 && math.abs(e1(1) - s) < 1e-6,
      s"pc1 = ${e1.mkString(",")}")
    assert(math.abs(e1(2)) < 1e-3 && math.abs(e1(3)) < 1e-9)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
  }

  test("components are orthonormal; eigenvalues descend") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = PcaOps.fit(df, m = 4, dims = 64)
    for (i <- 0 until 4; j <- i until 4) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"|e$i| = $d")
      else assert(math.abs(d) < 1e-9, s"e$i . e$j = $d")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    assert(m.eigenvalues.head > 0)
  }

  test("fit is bit-identical under repartitioning (fixed-point moments)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = PcaOps.fit(df, m = 3, dims = 64)
    val b = PcaOps.fit(df.repartition(7), m = 3, dims = 64)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.offsets.toSeq == b.offsets.toSeq)
  }

  test("projected scores are centered (mean ~ 0 per component)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = PcaOps.fit(df, m = 2, dims = 64)
    val means = PcaOps.project(df, m)
      .agg(avg(col("pc1")), avg(col("pc2"))).head()
    // moments are 1e-9-grid truncated, so centering is approximate at
    // that granularity, not bit-exact zero
    assert(math.abs(means.getDouble(0)) < 1e-6)
    assert(math.abs(means.getDouble(1)) < 1e-6)
  }

  test("null and wrong-dimension vectors are excluded from fit and project") {
    val good = (0 until 20).map(i => (i.toLong, Some(Seq.fill(4)(0.01f * i))))
    val bad = Seq((100L, None), (101L, Some(Seq(1.0f, 2.0f))))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val m = PcaOps.fit(df, m = 1, dims = 4)
    assert(m.n == 20)
    val ids = PcaOps.project(df, m).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == good.map(_._1).toSet)
  }
}
