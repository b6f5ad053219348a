package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.DedupOps

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 = exact dup of doc 1 (identical signature -> all bands collide);
  // doc 3 near dup; docs 4-5 unrelated; doc 6 arrives later as a dup of 1.
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the sleepy dog again and again"),
    (4L, "completely unrelated material about distributed query engines"),
    (5L, "another independent document with its own words entirely"),
    (6L, "the quick brown fox jumps over the lazy dog again and again"))

  test("streamed star links cover the batch bucket groups (ids in arrival order)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val links = NearDupStream.lshCandidateLinks(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      k = 3, numHashes = 32, bands = 8)
    val q = links.writeStream.format("memory").queryName("neardup_links")
      .outputMode("append").start()
    try {
      mem.addData(corpus.take(4): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(4): _*)
      q.processAllAvailable()

      val got = spark.sql("SELECT doc_id, rep_id FROM neardup_links")
        .as[(Long, Long)].collect().toSet

      // batch truth: per (band, bh) bucket over the SAME signatures, every
      // doc except the min links to the min (ids arrived in order)
      val sigs = DedupOps.minhashSignatures(
        corpus.toDF("doc_id", "text"), "doc_id", "text", k = 3, numHashes = 32)
      val expected = DedupOps.bandBuckets(sigs, bands = 8, rowsPerBand = 4)
        .groupBy($"band", $"bh")
        .agg(min($"doc_id").as("rep"), collect_set($"doc_id").as("docs"))
        .select(explode($"docs").as("doc_id"), $"rep")
        .filter($"doc_id" =!= $"rep")
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"streamed links $got vs batch $expected")
      // sanity on content: exact dups of doc 1 are linked to it; unrelated are not
      assert(got.contains((2L, 1L)) && got.contains((6L, 1L)))
      assert(!got.exists(p => p._1 == 4L || p._1 == 5L))
    } finally q.stop()
  }

  test("stateless sampling/mixture ops run unchanged on a stream (streamed == batch)") {
    import graft.ops.SamplingOps
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 500L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val mem = MemoryStream[(Long, String)]
    val mixed = SamplingOps.mixtureResample(
      mem.toDF().toDF("id", "src"), $"src", $"id", Map("a" -> 1.5, "b" -> 0.25))
    val q = mixed.writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT id, copy FROM mix_stream")
        .as[(Long, Long)].collect().toSet
      val batch = SamplingOps.mixtureResample(
        rows.toDF("id", "src"), $"src", $"id", Map("a" -> 1.5, "b" -> 0.25))
        .select($"id", $"copy").as[(Long, Long)].collect().toSet
      assert(streamed == batch, "row-local resampling must be stream-agnostic")
    } finally q.stop()
  }

  test("a doc with no shared bucket emits no links (novel doc contract)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val links = NearDupStream.lshCandidateLinks(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = links.writeStream.format("memory").queryName("neardup_novel")
      .outputMode("append").start()
    try {
      mem.addData((1L, "first document about spark plans and shuffles today"))
      q.processAllAvailable()
      mem.addData((2L, "second text concerning completely different gardening topics"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup_novel").count() == 0)
    } finally q.stop()
  }
}
