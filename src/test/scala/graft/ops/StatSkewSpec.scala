package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew robustness for the round-8 statistical suite — the targeted
  * follow-up to the catalog-wide SkewedInputSpec: each op runs on a
  * fixture where ONE group/value dominates, asserting BOTH correctness
  * (against a local replica or an engine identity) and the absence of a
  * single-task straggler — no task of any substantial shuffle stage may
  * consume most of the stage's records. Under the pre-round-9
  * SinglePartition rank-stat windows, the all-distinct case below put
  * 100% of the distinct frame in one task; the two-phase bucketed scan
  * spreads it, and this spec pins that forever.
  */
class StatSkewSpec extends SparkSpec {

  import spark.implicits._

  /** Per-(stage, task) shuffle-read record counts for jobs run inside
    * `f`, collected via a throwaway listener (event delivery is async —
    * poll until the stream quiesces). */
  private def withTaskSpread[T](f: => T): (T, Map[Int, Seq[Long]]) = {
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          acc.add((t.stageId, m.shuffleReadMetrics.recordsRead))
      }
    }
    // AQE's partition coalescing folds the tiny test shuffles into ONE
    // partition (they are kilobytes — at real scale it would not), which
    // would make every stage look like a straggler; the property under
    // test is the PLAN's distribution, so coalescing is disabled for the
    // measured op and restored after.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = f
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5000000000L
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        if (acc.size == last) stable += 1 else { stable = 0; last = acc.size }
      }
      import scala.jdk.CollectionConverters._
      (r, acc.asScala.toSeq.groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2) })
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev match {
        case Some(v) => spark.conf.set(coalesceKey, v)
        case None => spark.conf.unset(coalesceKey)
      }
    }
  }

  /** No task of any stage reading >= `minRecords` shuffle records may
    * hold more than `maxShare` of that stage's reads. */
  private def assertNoStraggler(
      spread: Map[Int, Seq[Long]], minRecords: Long = 20000L,
      maxShare: Double = 0.6): Unit = {
    for ((stage, tasks) <- spread; total = tasks.sum if total >= minRecords) {
      val worst = tasks.max.toDouble / total
      assert(worst <= maxShare,
        s"stage $stage: one task read ${tasks.max} of $total shuffle " +
          s"records (${(worst * 100).round}% > ${(maxShare * 100).round}%) " +
          s"across ${tasks.size} tasks — single-task straggler")
    }
  }

  private val N = 200000L

  // ------------------------------------------------- rank statistics

  test("mannWhitneyU with 99% ties: exact replica + no straggler") {
    // 99% of the metric mass sits on ONE value; group = id parity
    val df = spark.range(N).select(
      (col("id") % 2 === 0).as("a"),
      when(col("id") % 100 === 0, col("id") % 7).otherwise(lit(42L)).as("v"))
    val (got, spread) = withTaskSpread {
      ExperimentOps.mannWhitneyU(df, col("a"), col("v")).collect().head
    }
    assertNoStraggler(spread)
    // local doubled-midrank replica off the (value -> (cnt, cnt_a)) map
    val counts = df.groupBy("v").agg(count(lit(1)).as("c"),
        sum(col("a").cast("long")).as("ca"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L; var r2a = 0L; var ties = 0L; var nA = 0L; var n = 0L
    for ((_, c, ca) <- counts) {
      r2a += ca * (2 * cum + c + 1); ties += c * c * c - c
      cum += c; n += c; nA += ca
    }
    val nB = n - nA
    val u2 = r2a - nA * (nA + 1)
    assert(got.getAs[Long]("n_a") == nA && got.getAs[Long]("n_b") == nB)
    assert(got.getAs[Long]("u2_a") == u2 && got.getAs[Long]("t_ties") == ties)
    val d = (u2 - nA * nB).toDouble
    val m = (n + 1) * n * (n - 1) - ties
    val z2 = 3.0 * (d * d) * n.toDouble * (n - 1).toDouble /
      (nA.toDouble * nB.toDouble * m.toDouble)
    assert(got.getAs[Double]("z2") == z2)
  }

  test("rank-stat family on an ALL-DISTINCT score domain: the two-phase " +
    "scan spreads the distinct frame (the old SinglePartition killer)") {
    // every row a distinct value — the exact shape the round-8 verdict
    // flagged: an unenforced "bounded value domain" contract would have
    // put all 200k distinct values in ONE window task
    val df = spark.range(N).select(
      (col("id") % 3 === 0).as("lbl"), col("id").as("v"))
    val (auc, s1) = withTaskSpread {
      ExperimentOps.rocAuc(df, col("lbl"), col("v")).collect().head
    }
    assertNoStraggler(s1)
    // positives are ids % 3 == 0; local exact AUC via the rank formula
    val pos = (0L until N).filter(_ % 3 == 0)
    val nPos = pos.length.toLong
    val nNeg = N - nPos
    // scores are the ids themselves and all distinct: rank(v) = v + 1
    val r2p = pos.map(v => 2 * v + 1 + 1).sum // doubled rank of value v
    val u2 = r2p - nPos * (nPos + 1)
    assert(auc.getAs[Long]("n_pos") == nPos && auc.getAs[Long]("n_neg") == nNeg)
    assert(auc.getAs[Long]("u2_pos") == u2)
    assert(auc.getAs[Double]("auc") ==
      u2.toDouble / (2L * nPos * nNeg).toDouble)

    val (ks, s2) = withTaskSpread {
      ExperimentOps.ksTest(df, col("lbl"), col("v")).collect().head
    }
    assertNoStraggler(s2)
    // local max cross-multiplied CDF gap over ascending values
    var ca = 0L; var cb = 0L; var dnum = 0L
    for (v <- 0L until N) {
      if (v % 3 == 0) ca += 1 else cb += 1
      dnum = math.max(dnum, math.abs(ca * nNeg - cb * nPos))
    }
    assert(ks.getAs[Long]("n_a") == nPos && ks.getAs[Long]("n_b") == nNeg)
    assert(ks.getAs[Long]("d_num") == dnum)
  }

  test("round-9 session-4 prefix-scan riders (Kruskal-Wallis, gains " +
    "sweep) on an ALL-DISTINCT domain: spread, and exact vs the replica") {
    // same killer shape: 200k distinct values; groups cycle 0/1/2
    val df = spark.range(N).select(
      concat(lit("g"), (col("id") % 3).cast("string")).as("g"),
      col("id").as("v"))
    val gs = Seq("g0", "g1", "g2")
    val (kw, s1) = withTaskSpread {
      ExperimentOps.kruskalWallis(df, col("g"), col("v"), gs,
        ExperimentOps.Chi2Crit2Df).collect().head
    }
    assertNoStraggler(s1)
    assert(kw.getAs[Long]("n") == N && kw.getAs[Long]("t_ties") == 0L)
    // all-distinct: doubled rank of value v is 2v+2; groups by id mod 3
    val r2 = (0 until 3).map(g =>
      (g.toLong until N by 3).map(v => 2 * v + 2).sum)
    val ng = (0 until 3).map(g => (N - g + 2) / 3)
    val sumTerms = (0 until 3).map(i =>
      r2(i).toDouble * r2(i).toDouble / ng(i).toDouble).reduce(_ + _)
    val nD = N.toDouble
    val hRaw = 3.0 * sumTerms / (nD * (nD + 1.0)) - 3.0 * (nD + 1.0)
    assert(kw.getAs[Double]("h") == hRaw / 1.0,
      "tie-free: correction divides by exactly 1.0")

    val (lift, s2) = withTaskSpread {
      ExperimentOps.liftGains(df, col("g") === "g0", col("v"))
        .orderBy(col("score")).collect()
    }
    assertNoStraggler(s2)
    assert(lift.length == N.toInt, "one row per distinct score")
    val bottom = lift.head // threshold at the smallest score: whole corpus
    assert(bottom.getAs[Long]("n_ge") == N &&
      bottom.getAs[Long]("depth_micro") == 1000000L)
  }

  // ------------------------------------------------- grouped sketches

  test("grouped HLL with one hot source: per-group registers match the " +
    "single-group run; register shuffle stays spread") {
    // 99% of rows land in source 0; groups 1..4 get a sliver each
    // (bucket by id DIV 100 — id % 4 of a multiple of 100 is always 0)
    val df = spark.range(N).select(
      when(col("id") % 100 === 0, (col("id") / 100).cast("long") % 4 + 1)
        .otherwise(lit(0L)).as("src"),
      col("id").as("k"))
    val (grouped, spread) = withTaskSpread {
      EstimatorOps.hllRegistersBy(df, col("src"), col("k"), salt = 7)
        .as[(Long, Long, Long)].collect().toSet
    }
    assertNoStraggler(spread)
    // engine identity: the hot group's registers equal a run over ONLY
    // that group (grouping under skew loses nothing)
    val hotOnly = EstimatorOps.hllRegisters(
        df.filter(col("src") === 0L).select(col("k")), col("k"), salt = 7)
      .as[(Long, Long)].collect().toSet
    assert(grouped.filter(_._1 == 0L).map(t => (t._2, t._3)) == hotOnly)
    assert(grouped.map(_._1) == Set(0L, 1L, 2L, 3L, 4L))
  }

  // ------------------------------------------------- experiment readouts

  test("stratifiedEffect with a single stratum: degenerates to the plain " +
    "two-arm readout with weight 1.0") {
    val df = spark.range(N).select(col("id"),
      lit("only").as("s"), (col("id") % 1000).as("cents"))
    val (out, spread) = withTaskSpread {
      ExperimentOps.stratifiedEffect(df, col("id"), col("s"), col("cents"))
        .collect()
    }
    assertNoStraggler(spread)
    assert(out.length == 1, "exactly one stratum row")
    val r = out.head
    assert(r.getAs[Long]("weight_micro") == 1000000L)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == N)
    // engine identity: per-arm means equal a direct armOf aggregate
    val direct = df.select(ExperimentOps.armOf(col("id"), 2).as("arm"),
        col("cents"))
      .groupBy("arm").agg(
        count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r.getAs[Long]("n_a") == direct(0L)._1)
    assert(r.getAs[Long]("n_b") == direct(1L)._1)
    assert(r.getAs[Double]("mean_a") ==
      direct(0L)._2.toDouble / direct(0L)._1.toDouble)
    assert(r.getAs[Double]("diff") ==
      direct(0L)._2.toDouble / direct(0L)._1.toDouble -
        direct(1L)._2.toDouble / direct(1L)._1.toDouble)
  }

  test("naive Bayes with ONE class: trains, predicts the class everywhere, " +
    "no divide-by-zero and no straggler") {
    val df = spark.range(20000).select(col("id").as("rid"),
      lit("en").as("lbl"),
      concat_ws(" ", lit("tok"), (col("id") % 97).cast("string"),
        lit("word"), (col("id") % 31).cast("string")).as("txt"),
      (col("id") % 5 =!= 0).as("tr"))
    val (rows, spread) = withTaskSpread {
      ModelOps.naiveBayesConfusion(df, col("rid"), col("lbl"), col("txt"),
        col("tr")).collect()
    }
    assertNoStraggler(spread)
    assert(rows.length == 1, s"one confusion cell, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[String]("label_true") == "en" &&
      r.getAs[String]("label_pred") == "en")
    assert(r.getAs[Long]("n_docs") == 4000L) // the id % 5 == 0 test split
  }
}
