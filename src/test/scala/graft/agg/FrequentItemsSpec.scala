package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(keys: Seq[Long], capacity: Int, parts: Int): Map[Long, Long] =
    keys.toDF("k").repartition(parts)
      .agg(FrequentItems.freqSketch($"k", capacity).as("mg"))
      .select(explode($"mg").as("e"))
      .select($"e.key", $"e.est").as[(Long, Long)]
      .collect().toMap

  test("below capacity the sketch is exact") {
    val keys = Seq.tabulate(300)(i => (i % 7).toLong) // 7 distinct keys
    for (parts <- Seq(1, 8)) {
      val got = sketch(keys, capacity = 16, parts = parts)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == truth, s"parts=$parts")
    }
  }

  test("guarantee: every key with count > N/(capacity+1) survives, under any partitioning") {
    // skewed stream: key i appears 2^(10-i) times for i in 0..9, plus noise keys
    val rnd = new scala.util.Random(7)
    val heavy = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(i.toLong))
    val noise = Seq.fill(2000)(1000L + rnd.nextInt(1500))
    val keys = rnd.shuffle(heavy ++ noise)
    val n = keys.size
    val cap = 32
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val mustSurvive = truth.filter { case (_, c) => c * (cap + 1) > n }.keySet
    assert(mustSurvive.nonEmpty) // the test must test something
    for (parts <- Seq(1, 4, 16)) {
      val got = sketch(keys, cap, parts)
      assert(mustSurvive.subsetOf(got.keySet), s"parts=$parts")
      // MG never overestimates: est <= true count
      got.foreach { case (k, est) =>
        assert(est <= truth.getOrElse(k, 0L), s"parts=$parts key=$k")
      }
    }
  }

  test("capacity bounds the summary size") {
    val keys = Seq.tabulate(5000)(i => i.toLong) // all distinct
    val got = sketch(keys, capacity = 64, parts = 8)
    assert(got.size <= 64)
  }

  test("freq_sketch runs in a streaming aggregation; guarantee holds at every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Long]
    val cap = 8
    val q = mem.toDF().toDF("k")
      .agg(FrequentItems.freqSketch($"k", cap).as("mg"))
      .writeStream.format("memory").queryName("freq_out")
      .outputMode("complete").start()
    try {
      val batch1 = Seq.fill(40)(1L) ++ (100L to 119L)
      val batch2 = Seq.fill(25)(2L) ++ Seq.fill(10)(1L) ++ (200L to 214L)
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val all = batch1 ++ batch2
      val truth = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val mustSurvive = truth.filter { case (_, c) => c * (cap + 1) > all.size }.keySet
      assert(mustSurvive.nonEmpty)
      val got = spark.sql("SELECT explode(mg) AS e FROM freq_out")
        .select($"e.key", $"e.est").as[(Long, Long)].collect().toMap
      assert(mustSurvive.subsetOf(got.keySet))
      got.foreach { case (k, est) => assert(est <= truth.getOrElse(k, 0L)) }
    } finally q.stop()
  }

  test("q_heavy_hitters composition: sketch candidates + exact verify equals plain groupBy") {
    // replicate the gated query's shape on a skewed synthetic table
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map(_ => (rnd.nextInt(120) * rnd.nextInt(120)).toLong)
    val df = rows.toDF("k").repartition(8)
    val cap = 64
    val sk = df.agg(FrequentItems.freqSketch($"k", cap).as("mg"),
      count(lit(1)).as("total"))
    val cands = sk.select(explode($"mg").as("e"), $"total")
      .select($"e.key".as("k"), $"total")
    val got = df.join(broadcast(cands), "k")
      .groupBy($"k")
      .agg(count(lit(1)).as("c"), max($"total").as("total"))
      .filter($"c" * cap > $"total")
      .select($"k", $"c").as[(Long, Long)].collect().toMap
    val truth = rows.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
      .filter { case (_, c) => c * cap > rows.size }
    assert(got == truth)
  }
}
