package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 10000L).map(i => (i, s"doc $i", if (i % 3 == 0) "a" else "b"))
    .toDF("id", "text", "stratum")

  test("hashSample is deterministic and layout-invariant") {
    val a = SamplingOps.hashSample(rows, $"id", 25, 100).select($"id").as[Long].collect().toSet
    val b = SamplingOps.hashSample(rows.repartition(7), $"id", 25, 100)
      .select($"id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("hashSample rate is close to nominal and nested rates are subsets") {
    val q = SamplingOps.hashSample(rows, $"id", 25, 100).count().toDouble / 10000
    assert(math.abs(q - 0.25) < 0.02, s"rate $q")
    val small = SamplingOps.hashSample(rows, $"id", 10, 100).select($"id").as[Long].collect().toSet
    val big = SamplingOps.hashSample(rows, $"id", 40, 100).select($"id").as[Long].collect().toSet
    assert(small.subsetOf(big), "nested keep-rates must nest (same hash, larger cut)")
  }

  test("portable hash sample: rate, nesting, and no overflow at extreme keys") {
    val q = SamplingOps.hashSample(rows, $"id", 25, 100, portable = true)
      .count().toDouble / 10000
    assert(math.abs(q - 0.25) < 0.02, s"rate $q")
    val small = SamplingOps.hashSample(rows, $"id", 10, 100, portable = true)
      .select($"id").as[Long].collect().toSet
    val big = SamplingOps.hashSample(rows, $"id", 40, 100, portable = true)
      .select($"id").as[Long].collect().toSet
    assert(small.subsetOf(big), "nested keep-rates must nest")
    // ANSI-mode overflow guard: the inner mod-p reduction must keep
    // Long.MaxValue / MinValue keys evaluable (no arithmetic exception).
    val extremes = Seq(Long.MaxValue, Long.MinValue, -1L, 0L).toDF("id")
    val kept = extremes.filter(SamplingOps.portableHashKeep($"id", 50, 100)).count()
    assert(kept >= 0 && kept <= 4)
  }

  test("stratifiedExact applies per-stratum rates on the id modulus") {
    val out = SamplingOps.stratifiedExact(rows, $"id", $"stratum", Map("a" -> 10), 50)
      .select($"id", $"stratum").collect()
    assert(out.forall { r =>
      val keep = if (r.getString(1) == "a") 10 else 50
      r.getLong(0) % 100 < keep
    })
    // and nothing outside the predicate was dropped
    val expected = (1L to 10000L).count { i =>
      val s = if (i % 3 == 0) "a" else "b"
      i % 100 < (if (s == "a") 10 else 50)
    }
    assert(out.length == expected)
  }

  test("hashTopK returns exactly k, deterministically, without a global sort") {
    val a = SamplingOps.hashTopK(rows, $"id", 50)
    val ids = a.select($"id").as[Long].collect().toSet
    val again = SamplingOps.hashTopK(rows.repartition(9), $"id", 50)
      .select($"id").as[Long].collect().toSet
    assert(ids.size == 50 && ids == again)
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k heaps, got:\n$plan")
  }

  test("topKPerGroup matches a per-group sort and is layout-invariant") {
    val scored = rows.withColumn("score", ($"id" * 37 % 101).cast("double"))
    val got = SamplingOps.topKPerGroup(scored, $"stratum", $"score", $"id", k = 7)
      .as[(String, Long, Long)].collect().toSet
    // oracle: full sort per group, (score DESC, id ASC), rank 1..7
    val expected = (1L to 10000L)
      .map(i => (if (i % 3 == 0) "a" else "b", (i * 37 % 101).toDouble, i))
      .groupBy(_._1)
      .flatMap { case (g, rs) =>
        rs.sortBy { case (_, s, i) => (-s, i) }.take(7).zipWithIndex
          .map { case ((_, _, i), r) => (g, i, (r + 1).toLong) }
      }.toSet
    assert(got == expected)
    val again = SamplingOps.topKPerGroup(scored.repartition(9), $"stratum", $"score", $"id", 7)
      .as[(String, Long, Long)].collect().toSet
    assert(again == expected, "result must not depend on input layout")
    // the plan must be two-phase aggregation, not a window over every row
    val plan = SamplingOps.topKPerGroup(scored, $"stratum", $"score", $"id", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected bounded-buffer agg, got:\n$plan")
  }

  test("topKPerGroup keeps short groups whole with gap-free ranks") {
    val tiny = Seq((1L, "g1", 5.0), (2L, "g1", 9.0), (3L, "g2", 1.0))
      .toDF("id", "g", "score")
    val got = SamplingOps.topKPerGroup(tiny, $"g", $"score", $"id", k = 10)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("g1", 2L, 1L), ("g1", 1L, 2L), ("g2", 3L, 1L)))
  }

  test("weightedSamplePerGroup: layout-invariant, k-bounded, weight-sensitive") {
    // A-ES selects ∝ TOTAL weight: 20 rows x 1e6 dwarf ~10k rows x 1
    val weighted = rows.withColumn("w",
      when($"id" <= 20, lit(1e6)).otherwise(lit(1.0)))
    val got = SamplingOps.weightedSamplePerGroup(weighted, $"stratum", $"w", $"id", k = 10)
      .as[(String, Long, Long)].collect().toSet
    val again = SamplingOps
      .weightedSamplePerGroup(weighted.repartition(13), $"stratum", $"w", $"id", 10)
      .as[(String, Long, Long)].collect().toSet
    assert(got == again, "draw must not depend on input layout")
    assert(got.groupBy(_._1).forall(_._2.size == 10))
    // ids 1..20 carry 1e6x the weight of the other 9980 rows; A-ES fills
    // the slots with them first (u^(1e-6) ~ 1). Stratum "a" holds only 6
    // of the heavy ids (multiples of 3), "b" the other 14 competing for
    // 10 slots — so the heavy ceiling is 6 + 10 = 16.
    val heavyChosen = got.count(_._2 <= 20L)
    assert(heavyChosen >= 15, s"expected heavy ids to dominate, got $heavyChosen/16")
    // and the same draw UNWEIGHTED picks (almost) none of the first 20 ids
    val unif = SamplingOps
      .weightedSamplePerGroup(rows.withColumn("w", lit(1.0)), $"stratum", $"w", $"id", 10)
      .as[(String, Long, Long)].collect().toSet
    assert(unif.count(_._2 <= 20L) <= 1)
    // rows with w <= 0 are excluded (A-ES undefined there)
    val zeroed = SamplingOps.weightedSamplePerGroup(
      rows.withColumn("w", when($"id" <= 9990, lit(0.0)).otherwise(lit(2.0))),
      $"stratum", $"w", $"id", 10)
      .as[(String, Long, Long)].collect()
    assert(zeroed.forall(_._2 > 9990L) && zeroed.length == 10)
  }

  test("mixtureResample replicates by whole weight and keeps the exact fraction") {
    val out = SamplingOps.mixtureResample(
      rows, $"stratum", $"id", Map("a" -> 2.5, "b" -> 0.25))
      .select($"id", $"stratum", $"copy").as[(Long, String, Long)].collect()
    val byId = out.groupBy(_._1)
    // stratum a (id % 3 == 0): 2 or 3 copies; stratum b: 0 or 1
    out.foreach { case (id, s, copy) =>
      assert(s == (if (id % 3 == 0) "a" else "b"))
    }
    (1L to 10000L).foreach { id =>
      val copies = byId.get(id).map(_.map(_._3).sorted.toSeq).getOrElse(Seq())
      val extra = (id * 7919 + 13) % 1000
      if (id % 3 == 0) // w = 2.5
        assert(copies == (if (extra < 500) Seq(0L, 1L, 2L) else Seq(0L, 1L)), s"id $id")
      else // w = 0.25
        assert(copies == (if (extra < 250) Seq(0L) else Seq()), s"id $id")
    }
    // realized mixture tracks the target weights
    val nA = out.count(_._2 == "a").toDouble / 3333 // ~#a rows
    val nB = out.count(_._2 == "b").toDouble / 6667
    assert(math.abs(nA - 2.5) < 0.1, s"a rate $nA")
    assert(math.abs(nB - 0.25) < 0.05, s"b rate $nB")
  }

  test("mixtureResample: weight 0 drops a source, integer weights replicate exactly") {
    val out = SamplingOps.mixtureResample(
      rows, $"stratum", $"id", Map("a" -> 0.0, "b" -> 3.0))
      .select($"id", $"stratum", $"copy").as[(Long, String, Long)].collect()
    assert(!out.exists(_._2 == "a"), "weight 0 must drop the source entirely")
    val perB = out.filter(_._2 == "b").groupBy(_._1).view.mapValues(_.length)
    assert(perB.values.forall(_ == 3) && perB.size == 6667)
  }

  test("mixtureResample rejects weights finer than the keep grid") {
    val e = intercept[IllegalArgumentException] {
      SamplingOps.mixtureResample(rows, $"stratum", $"id", Map("a" -> 1.0625))
    }
    assert(e.getMessage.contains("not representable"))
  }

  test("mixtureResample is layout-invariant and shuffle-free") {
    val a = SamplingOps.mixtureResample(rows, $"stratum", $"id", Map("a" -> 1.5))
    val b = SamplingOps.mixtureResample(rows.repartition(11), $"stratum", $"id", Map("a" -> 1.5))
    assert(a.select($"id", $"copy").as[(Long, Long)].collect().toSet ==
      b.select($"id", $"copy").as[(Long, Long)].collect().toSet)
    assert(!a.queryExecution.executedPlan.toString.contains("Exchange"),
      "mixture resampling must be a pure row-local map")
  }

  test("approx_count_distinct is within 5% of exact") {
    val df = (1L to 20000L).map(i => (i % 4, i % 3000)).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(approx_count_distinct($"v", 0.01).as("ad"), countDistinct($"v").as("ed"))
      .collect()
    got.foreach { r =>
      val (ad, ed) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(ad - ed) / ed < 0.05, s"group ${r.get(0)}: approx $ad vs exact $ed")
    }
  }

  test("percentile_approx (sketch scale path) tracks exact percentile") {
    val df = (1L to 20000L).map(i => (i % 4, (i * 7919 % 100000).toDouble)).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(
        percentile_approx($"v", lit(0.9), lit(5000)).as("ap"),
        percentile($"v", lit(0.9)).as("ex"))
      .collect()
    got.foreach { r =>
      val (ap, ex) = (r.getDouble(1), r.getDouble(2))
      // rank-based error: value at 90th +/- ~1% rank in a ~100k range
      assert(math.abs(ap - ex) < 2500, s"group ${r.get(0)}: approx $ap vs exact $ex")
    }
  }

  private val budgetDocs = Seq(
    // (id, score, weight) — classes: score 9 (w 10), 7 (w 5+5),
    // 5 (w 4+4+4), 3 (w 100)
    (1L, 9L, 10L), (2L, 7L, 5L), (3L, 7L, 5L),
    (4L, 5L, 4L), (5L, 5L, 4L), (6L, 5L, 4L), (7L, 3L, 100L)
  ).toDF("id", "sc", "w")

  test("selectByBudget: splits the boundary class exactly like the " +
    "greedy running-sum prefix") {
    // budget 28: 9 and 7 fit fully (20); class 5 is the boundary with
    // remaining 8 -> ids 4,5 fit (cum 4,8), id 6 overflows; class 3 out
    val got = SamplingOps.selectByBudget(budgetDocs, "id", $"sc", $"w", 28L)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L))
    // oracle formulation: global order + running sum
    val oracle = budgetDocs
      .withColumn("cum", sum($"w").over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"sc".desc, $"id")
          .rowsBetween(Long.MinValue, 0)))
      .filter($"cum" <= 28L).select($"id").as[Long].collect().toSet
    assert(got == oracle)
  }

  test("selectByBudget: budget covers everything / nothing") {
    val all = SamplingOps.selectByBudget(budgetDocs, "id", $"sc", $"w", 1000L)
    assert(all.count() == 7L)
    val none = SamplingOps.selectByBudget(budgetDocs, "id", $"sc", $"w", 0L)
    assert(none.count() == 0L)
  }

  test("selectByBudget: NULL scores/weights are excluded, " +
    "negative weights rejected, extreme scores ordered correctly") {
    val withNulls = Seq(
      (1L, Some(9L), Some(10L)), (2L, None, Some(5L)), (3L, Some(7L), None))
      .toDF("id", "sc", "w")
    val got = SamplingOps.selectByBudget(withNulls, "id", $"sc", $"w", 100L)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L)) // unscorable rows can't be ranked

    val neg = Seq((1L, 5L, -3L), (2L, 5L, 4L)).toDF("id", "sc", "w")
    intercept[IllegalArgumentException] {
      SamplingOps.selectByBudget(neg, "id", $"sc", $"w", 10L)
    }

    // -Long.MinValue == Long.MinValue: a naive sortBy(-_) would rank
    // this class HIGHEST; the non-negating ordering keeps it last
    val extreme = Seq((1L, Long.MinValue, 1L), (2L, 3L, 1L))
      .toDF("id", "sc", "w")
    val first = SamplingOps.selectByBudget(extreme, "id", $"sc", $"w", 1L)
      .select($"id").as[Long].collect().toSet
    assert(first == Set(2L))
  }

  test("selectByBudget == window-prefix oracle on randomized inputs " +
    "(ties, zero weights, degenerate classes)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 3).foreach { round =>
      val n = 200
      // few score classes -> many ties; some zero weights
      val rows = (1L to n).map { i =>
        (i, rnd.nextInt(6).toLong, rnd.nextInt(20).toLong)
      }
      val df = rows.toDF("id", "sc", "w")
      val budget = rnd.nextInt(800).toLong + 50
      val got = SamplingOps.selectByBudget(df, "id", $"sc", $"w", budget)
        .select($"id").as[Long].collect().toSet
      val oracle = df.withColumn("cum", sum($"w").over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"sc".desc, $"id").rowsBetween(Long.MinValue, 0)))
        .filter($"cum" <= budget).select($"id").as[Long].collect().toSet
      assert(got == oracle, s"round $round budget $budget")
    }
  }

  test("selectByBudget is partitioning-invariant") {
    val one = SamplingOps.selectByBudget(
      budgetDocs.repartition(1), "id", $"sc", $"w", 28L)
      .collect().map(_.toSeq).toSet
    val eight = SamplingOps.selectByBudget(
      budgetDocs.repartition(8), "id", $"sc", $"w", 28L)
      .collect().map(_.toSeq).toSet
    assert(one == eight)
  }

  test("temperatureMixturePlan: sqrt flattening, integer grid, n_docs cap") {
    val docs = (Seq.fill(4)("a") ++ Seq.fill(1)("b"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("src", "id")
    def plan(budget: Long) =
      SamplingOps.temperatureMixturePlan(docs, $"src", budget)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    // w_milli: sqrt(4)*1000=2000, sqrt(1)*1000=1000; wsum=3000
    val p3 = plan(3L)
    assert(p3 == Map("a" -> ((4L, 2000L, 2L)), "b" -> ((1L, 1000L, 1L))), s"got $p3")
    // big budget: allocations cap at n_docs, never oversample
    val p30 = plan(30L)
    assert(p30("a")._3 == 4L && p30("b")._3 == 1L)
    // sqrt flattening upweights the small source vs proportional:
    // proportional gives b 3*1/5 = 0 rows at budget 3; temperature gives 1
    assert(p3("b")._3 > 3L * 1L / 5L)
    // layout invariance (integer arithmetic end to end)
    val re = SamplingOps.temperatureMixturePlan(docs.repartition(7), $"src", 3L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(re == p3.map { case (k, v) => k -> v._3 })
  }
  test("tokenMixturePlan: exact targets, epochs factor, oversample flag") {
    import org.apache.spark.sql.functions._
    // sources: a has 10 tokens, b has 2, c has 6
    val docs = Seq(
      ("a", "t1 t2 t3 t4 t5"), ("a", "t1 t2 t3 t4 t5"),
      ("b", "x y"),
      ("c", "p q r"), ("c", "p q r")).toDF("src", "text")
    val out = SamplingOps.tokenMixturePlan(
      docs, $"src", $"text",
      weightsMicro = Map("a" -> 500000L, "b" -> 300000L),
      defaultMicro = 200000L, budgetTokens = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    // wsum = 1_000_000; targets: a 5, b 3, c 2
    assert(out("a") == ((10L, 500000L, 5L, 500000L, 0)))
    // b must repeat: 3 tokens wanted from 2 available -> 1.5 epochs
    assert(out("b") == ((2L, 300000L, 3L, 1500000L, 1)))
    assert(out("c") == ((6L, 200000L, 2L, 333333L, 0)))
    // layout invariance (integer arithmetic end to end)
    val re = SamplingOps.tokenMixturePlan(
      docs.repartition(5), $"src", $"text",
      Map("a" -> 500000L, "b" -> 300000L), 200000L, 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(re == out.map { case (k, v) => k -> v._3 })
    // overflow guards are loud
    intercept[IllegalArgumentException] {
      SamplingOps.tokenMixturePlan(docs, $"src", $"text",
        Map("a" -> Long.MaxValue), 1L, Long.MaxValue / 2)
    }
  }
}
