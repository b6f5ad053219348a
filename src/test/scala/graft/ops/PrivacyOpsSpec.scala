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

  test("dpCounts: deterministic discrete-Laplace noise, bounded, clipped at zero") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 30}")).toDF("id", "grp")
    val out = PrivacyOps.dpCounts(df, col("grp"), salt = "t")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 30)
    out.foreach { case (g, nTrue, noise, nDp) =>
      assert(nTrue == 10L, s"$g")
      assert(noise >= -6L && noise <= 6L, s"$g noise=$noise outside ladder")
      assert(nDp == math.max(0L, nTrue + noise))
    }
    // deterministic: same release twice, and under any layout
    val again = PrivacyOps.dpCounts(df.repartition(7), col("grp"), salt = "t")
      .as[(String, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // the ladder actually disperses: 30 groups must not share one noise
    assert(out.map(_._3).distinct.length > 3)
    // near-zero counts clip, never release negatives
    val tiny = PrivacyOps.dpCounts(
      Seq((1L, "only")).toDF("id", "grp"), col("grp"), salt = "t")
      .as[(String, Long, Long, Long)].collect().head
    assert(tiny._4 >= 0L)
  }

  test("dpCounts ladder CDF is a valid distribution with the documented mass") {
    val cdf = PrivacyOps.DiscreteLaplaceCdf
    assert(cdf.map(_._1).sameElements(-6 to 5))
    assert(cdf.map(_._2).sliding(2).forall(w => w(0) < w(1)), "monotone")
    // ladder covers k=-6..5: mass 1 - (1/3)(2^-5 + 2^-6) = 1 - 1/64;
    // the uncovered 1/64 of u (both true tails) lands on +6
    assert(math.abs(cdf.last._2 - (1.0 - 1.0 / 64.0)) < 1e-12)
  }
}
