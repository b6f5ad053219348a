package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  test("reported bit is the truth exactly when the coin says so") {
    val df = (0L until 64L).map(i => (i, 1L, "g")).toDF("id", "bit", "grp")
    // recompute each respondent's coin through the same portable hash
    val coins = df.select(col("id"), PrivacyOps.coin(col("id")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truthful = coins.count(_._2 < 3)
    val agg = PrivacyOps.randomizedResponse(
      df, col("id"), col("bit"), col("grp")).collect().head
    // all true bits: reported = 1 iff truthful coin, 0 otherwise
    assert(agg.getLong(1) == 64L)
    assert(agg.getLong(2) == 64L)
    assert(agg.getLong(3) == truthful.toLong)
    assert(agg.getLong(4) == 4L * truthful - 64L)
  }

  test("estimator recovers the planted rate within sampling noise") {
    // plant 30% true bits over 2000 respondents, one group
    val df = (0L until 2000L).map(i => (i, if (i % 10 < 3) 1L else 0L, "g"))
      .toDF("id", "bit", "grp")
    val agg = PrivacyOps.randomizedResponse(
      df, col("id"), col("bit"), col("grp")).collect().head
    val truth = agg.getLong(2)
    val est = agg.getLong(4) / 2.0
    assert(truth == 600L)
    // std of the estimator at p=3/4 is 2*sqrt(n*p*(1-p)) ~ 39; allow 4 std
    assert(math.abs(est - truth) < 160, s"est=$est truth=$truth")
  }

  test("groups aggregate independently; null groups survive") {
    val df = Seq(
      (1L, 1L, Some("a")), (2L, 0L, Some("a")),
      (3L, 1L, Option.empty[String]))
      .toDF("id", "bit", "grp")
    val out = PrivacyOps.randomizedResponse(
      df, col("id"), col("bit"), col("grp")).collect()
    assert(out.length == 2)
    val byGrp = out.map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byGrp(Some("a")) == 2L && byGrp(None) == 1L)
  }
}
