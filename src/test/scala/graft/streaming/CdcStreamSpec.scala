package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.LakeOps

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  // changelog over keys 1..5: out-of-order seqs, a duplicate delivery,
  // a tombstone, and a post-tombstone STALE update (must stay dead).
  // (key, status, cents, seq, op)
  private val snapshot = Seq(
    (1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L))
  private val batch1 = Seq(
    (1L, "A2", 110L, 2L, "U"), // update
    (2L, "B", 200L, 1L, "D"), // tombstone
    (4L, "N", 400L, 1L, "U")) // insert
  private val batch2 = Seq(
    (1L, "A1", 105L, 1L, "U"), // STALE: lower seq than applied -> no-op
    (2L, "B9", 290L, 0L, "U"), // STALE after tombstone -> stays dead
    (4L, "N", 400L, 1L, "U"), // duplicate redelivery -> idempotent
    (5L, "E", 500L, 3L, "U")) // insert

  private def snapAsChanges =
    snapshot.toDF("k", "status", "cents")
      .select(col("k"), col("status"), col("cents"),
        lit(Long.MinValue).as("seq"), lit("U").as("op"))

  private def allChanges =
    snapAsChanges.unionByName((batch1 ++ batch2).toDF("k", "status", "cents", "seq", "op"))

  private def expectBatch =
    LakeOps.applyChanges(
      snapshot.toDF("k", "status", "cents"),
      (batch1 ++ batch2).toDF("k", "status", "cents", "seq", "op"),
      keyCol = "k", seqCol = "seq", opCol = "op")
      .as[(Long, String, Long)].collect().toSet

  test("latestView batch form == LakeOps.applyChanges on the same feed") {
    val v = CdcStream.latestView(allChanges, "k", "seq", "op")
      .as[(Long, String, Long)].collect().toSet
    assert(v == expectBatch, s"view=$v expected=$expectBatch")
  }

  test("streamed latestView (update mode) == batch apply, across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long, String)]
    val view = CdcStream.latestView(
      mem.toDF().toDF("k", "status", "cents", "seq", "op"),
      "k", "seq", "op")
    val q = view.writeStream.format("memory").queryName("cdc_view")
      .outputMode("update").start()
    try {
      mem.addData(snapshot.map { case (k, s, c) =>
        (k, s, c, Long.MinValue, "U") }: _*)
      q.processAllAvailable()
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // update-mode sink: the LAST emitted row per key is its current
      // state; a key whose final fold is a tombstone emits no row in the
      // last update that contains it (filtered) — key 2's earlier rows
      // remain in the sink, so resolve by recomputing membership
      val updates = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY k ORDER BY idx DESC) rn " +
          "FROM (SELECT k, status, cents, monotonically_increasing_id() idx FROM cdc_view)) WHERE rn = 1")
        .select("k", "status", "cents")
        .as[(Long, String, Long)].collect().toSet
      // keys now dead (tombstoned) must be dropped from the comparison:
      // the memory sink retains their PRE-tombstone updates
      val live = expectBatch.map(_._1)
      val streamedLive = updates.filter(r => live.contains(r._1))
      assert(streamedLive == expectBatch,
        s"streamed=$streamedLive expected=$expectBatch")
    } finally q.stop()
  }

  test("foldChangelog is associative across batch boundaries") {
    val lake0 = CdcStream.foldChangelog(
      // empty changelog-lake
      Seq.empty[(Long, String, Long, Long, String)]
        .toDF("k", "status", "cents", "__seq", "__op"),
      snapAsChanges, "k", "seq", "op")
    val b1 = batch1.toDF("k", "status", "cents", "seq", "op")
    val b2 = batch2.toDF("k", "status", "cents", "seq", "op")
    val stepwise = CdcStream.foldChangelog(
      CdcStream.foldChangelog(lake0, b1, "k", "seq", "op"),
      b2, "k", "seq", "op")
    val oneShot = CdcStream.foldChangelog(
      lake0, b1.unionByName(b2), "k", "seq", "op")
    val a = stepwise.as[(Long, String, Long, Long, String)].collect().toSet
    val b = oneShot.as[(Long, String, Long, Long, String)].collect().toSet
    assert(a == b, s"stepwise=$a oneShot=$b")
    // tombstones are RETAINED in the changelog-lake (key 2 present as D)
    assert(a.exists(r => r._1 == 2L && r._5 == "D"))
  }

  test("applyToLake: streamed lake fold == batch apply; stale and dup changes resolve") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("cdc_lake_").toFile
    val lakePath = new java.io.File(dir, "lake").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val mem = MemoryStream[(Long, String, Long, Long, String)]
    val q = CdcStream.applyToLake(
      mem.toDF().toDF("k", "status", "cents", "seq", "op"),
      lakePath, ckpt, "k", "seq", "op")
    try {
      mem.addData(snapshot.map { case (k, s, c) =>
        (k, s, c, Long.MinValue, "U") }: _*)
      q.processAllAvailable()
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val view = CdcStream.readView(spark, lakePath)
        .as[(Long, String, Long)].collect().toSet
      assert(view == expectBatch, s"lake view=$view expected=$expectBatch")
      // the tombstone survives IN the lake (stale-resurrection guard)
      val raw = spark.read.parquet(lakePath)
      assert(raw.filter(col("__op") === "D" && col("k") === 2L).count() == 1)
    } finally q.stop()
  }
}
