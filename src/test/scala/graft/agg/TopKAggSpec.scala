package graft.agg

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partial top-k aggregate: identical to the window formulation (the
  * executable spec), and merge-correct under any partitioning.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  // discrete scores force ties -> exercises the (score DESC, id ASC) order
  private def rows(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (rnd.nextInt(5).toLong, (rnd.nextInt(20) / 10.0), i.toLong))
      .toDF("g", "score", "id")
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(TopKFunctions.topKByScore($"score", $"id", k).as("t"))
      .select($"g", posexplode($"t").as(Seq("pos", "hit")))
      .select($"g", ($"pos" + 1).as("rank"), $"hit.score".as("score"), $"hit.id".as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"rank", $"score", $"id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
  }

  test("topKByScore equals the window top-k, ties broken by id asc") {
    val df = rows(500, 7)
    assert(viaAgg(df, 10) == viaWindow(df, 10))
    assert(viaAgg(df, 1) == viaWindow(df, 1))
  }

  test("merge is partitioning-independent (1 vs 8 partitions)") {
    val df = rows(400, 11)
    assert(viaAgg(df.coalesce(1), 7) == viaAgg(df.repartition(8), 7))
  }

  test("groups smaller than k return all their rows in rank order") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L)).toDF("g", "score", "id")
    val got = viaAgg(df, 10)
    assert(got == Set((1L, 1, 0.9, 11L), (1L, 2, 0.5, 10L)))
  }

  test("topk_by_score runs in a streaming aggregation (per-group trending)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long, Double)] // (group, id, score)
    val q = mem.toDF().toDF("g", "id", "s")
      .groupBy($"g")
      .agg(TopKFunctions.topKByScore($"s", $"id", 2).as("t"))
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").start()
    try {
      mem.addData((1L, 10L, 5.0), (1L, 11L, 9.0), (2L, 20L, 1.0))
      q.processAllAvailable()
      // batch 2 displaces group 1's weaker entry and extends group 2 —
      // the serialized buffer round-trips through the state store
      mem.addData((1L, 12L, 7.0), (2L, 21L, 3.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT g, t FROM topk_out")
        .collect().map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
        .toMap
      assert(got(1L) == Seq((9.0, 11L), (7.0, 12L)))
      assert(got(2L) == Seq((3.0, 21L), (1.0, 20L)))
    } finally q.stop()
  }
}
