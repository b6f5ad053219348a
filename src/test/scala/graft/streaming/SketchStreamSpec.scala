package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SketchOps

/** The sketches are streaming citizens AS-IS: both builds are standard
  * keyed aggregates whose state is bounded by construction (d x w cells /
  * k values per group — the whole point of a sketch), so update-mode
  * structured streaming maintains them over an unbounded feed with no
  * watermark and no state growth. These differentials pin streamed ==
  * batch on the same ingested prefix.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed CMS grid == batch sketch of everything ingested") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val grid = SketchOps.cmsSketch(mem.toDF().toDF("key"), $"key", 64, 3)
    val q = grid.writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").start()
    val b1 = (1L to 40L) ++ (1L to 10L)
    val b2 = (5L to 60L) ++ Seq.fill(7)(42L)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // update mode re-emits a cell each time it changes; counts only
      // grow, so the latest value per cell is the max
      val streamed = spark.sql(
        "SELECT j, bucket, max(cnt) FROM cms_stream GROUP BY 1, 2")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val batch = SketchOps.cmsSketch((b1 ++ b2).toDF("key"), $"key", 64, 3)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamed KMV sketch == batch sketch of everything ingested") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sk = SketchOps.kmvDistinct(
      mem.toDF().toDF("g", "key"), Seq("grp" -> $"g"), $"key", 8)
    val q = sk.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      mem.addData((1L to 30L).map(("a", _)) ++ (1L to 5L).map(("b", _)): _*)
      q.processAllAvailable()
      mem.addData((20L to 45L).map(("a", _)) ++ Seq(("b", 6L)): _*)
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT grp, n_kept, kth_hash, est_distinct FROM kmv_stream")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), Option(r.getAs[java.lang.Long](2)), r.getDouble(3))))
        .toMap
      val all = ((1L to 45L).map(("a", _)) ++ (1L to 6L).map(("b", _)))
      val batch = SketchOps.kmvDistinct(
        all.toDF("g", "key"), Seq("grp" -> $"g"), $"key", 8)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), Option(r.getAs[java.lang.Long](2)), r.getDouble(3))))
        .toMap
      assert(streamed == batch)
      assert(streamed("a")._1 == 8L && streamed("b")._2.isEmpty)
    } finally q.stop()
  }

  test("streamed HLL registers == batch registers of everything ingested") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    // hllRegisters is a keyed max — register state is ≤256 rows by
    // construction, so update mode maintains the sketch unbounded with
    // no watermark; rho per register only grows, so the latest emitted
    // value per idx is the max of the emissions
    val regs = graft.ops.EstimatorOps.hllRegisters(
      mem.toDF().toDF("k"), $"k", salt = 5)
    val q = regs.writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    val b1 = (1L to 900L).map(_ * 7919L)
    val b2 = (500L to 2000L).map(_ * 7919L)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT idx, max(rho) FROM hll_stream GROUP BY idx")
        .as[(Long, Long)].collect().toMap
      val batch = graft.ops.EstimatorOps.hllRegisters(
        (b1 ++ b2).toDF("k"), $"k", salt = 5)
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
