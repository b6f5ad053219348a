package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorSumAggSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16
  private val vecs = (1L to 2000L).map { i =>
    (i, i % 7, Array.tabulate(dims)(d => ((i * 31 + d * 17) % 1000 - 500).toFloat / 250f))
  }.toDF("id", "g", "vec")

  test("vec_sum_fixed equals a scalar fixed-point sum exactly") {
    val got = vecs.groupBy($"g")
      .agg(VecSumFunctions.vecSumFixed($"vec", 1000000.0).as("s"))
      .as[(Long, Array[Long])].collect().toMap
    val expected = (1L to 2000L)
      .map(i => (i % 7, Array.tabulate(dims)(d =>
        ((((i * 31 + d * 17) % 1000 - 500).toFloat / 250f).toDouble * 1000000.0).toLong)))
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      }
    expected.foreach { case (g, e) =>
      assert(got(g).toSeq == e.toSeq, s"group $g")
    }
  }

  test("vec_sum_fixed is merge-order and layout invariant") {
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.groupBy($"g").agg(VecSumFunctions.vecSumFixed($"vec", 1000000.0).as("s"))
        .as[(Long, Array[Long])].collect().toMap.view.mapValues(_.toSeq).toMap
    assert(run(vecs.coalesce(1)) == run(vecs.repartition(13)))
  }

  test("vec_sum_fixed rejects ragged inputs") {
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      ragged.agg(VecSumFunctions.vecSumFixed($"vec", 1000.0)).collect()
    }
    assert(e.getMessage != null)
  }

  test("centroid shape: divide by the NON-NULL vector count (null rows excluded)") {
    val df = Seq(
      (0, Some(Array(2.0f, 4.0f))), (0, None), (0, Some(Array(4.0f, 8.0f))))
      .toDF("label", "embedding")
    val r = df.groupBy($"label")
      .agg(VecSumFunctions.vecSumFixed($"embedding", 1000000.0).as("s"),
        count($"embedding").as("n")) // count(lit(1)) would see the null row
      .select($"s", $"n").as[(Array[Long], Long)].collect().head
    assert(r._2 == 2L)
    assert(r._1.map(_.toDouble / r._2 / 1e6).toSeq == Seq(3.0, 6.0))
  }

  test("vec_sum_fixed skips null vectors and handles empty groups") {
    val withNull = Seq(
      (1L, Some(Array(1.0f, 1.0f))), (1L, None), (1L, Some(Array(2.0f, 3.0f))))
      .toDF("g", "vec")
    val got = withNull.groupBy($"g")
      .agg(VecSumFunctions.vecSumFixed($"vec", 10.0).as("s"))
      .as[(Long, Array[Long])].collect().head._2
    assert(got.toSeq == Seq(30L, 40L))
  }
}
