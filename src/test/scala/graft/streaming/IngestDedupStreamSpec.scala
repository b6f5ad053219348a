package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // existing corpus holds T1 and T2; the feed re-posts T1 (corpus dup),
  // posts T3 twice in one batch and once in the next (within-stream dups),
  // and two genuinely new docs
  private val t1 = "alpha document already in the corpus"
  private val t2 = "beta document already in the corpus"
  private val t3 = "gamma fresh document posted three times"
  private val t4 = "delta fresh document posted once"
  private val t5 = "epsilon fresh document arriving later"

  private val feed = Seq(
    (1L, t1, ts("2024-01-01 00:00:10")), // in corpus -> dropped
    (2L, t3, ts("2024-01-01 00:00:20")), // first arrival -> kept
    (3L, t3, ts("2024-01-01 00:00:30")), // intra-batch dup -> dropped
    (4L, t4, ts("2024-01-01 00:00:40")), // new -> kept
    (5L, t3, ts("2024-01-01 00:01:00")), // cross-batch dup, in horizon -> dropped
    (6L, t5, ts("2024-01-01 00:05:00"))) // new -> kept

  test("streamed ingest dedup == batch reference on the same feed") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(t1, t2).toDF("text")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val deduped = IngestDedupStream.dedupedIngest(
      mem.toDF().toDF("doc_id", "text", "ts"),
      corpus, col("text"), "ts", watermarkDelay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("ingest_dedup")
      .outputMode("append").start()
    try {
      mem.addData(feed.take(4): _*)
      q.processAllAvailable()
      mem.addData(feed.drop(4): _*)
      q.processAllAvailable()

      val streamed = spark.sql("SELECT doc_id FROM ingest_dedup")
        .as[Long].collect().toSet
      assert(streamed == Set(2L, 4L, 6L), s"streamed=$streamed")

      val batch = IngestDedupStream.batchReference(
        feed.toDF("doc_id", "text", "ts"),
        corpus, col("text"), "ts", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("duplicate beyond the watermark horizon is re-admitted (bounded-state trade)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(t2).toDF("text")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val deduped = IngestDedupStream.dedupedIngest(
      mem.toDF().toDF("doc_id", "text", "ts"),
      corpus, col("text"), "ts", watermarkDelay = "1 minute")
    val q = deduped.writeStream.format("memory").queryName("ingest_dedup_ttl")
      .outputMode("append").start()
    try {
      mem.addData((1L, t3, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // heartbeat pushes the watermark to 00:59 > 00:00 + 1 min: t3's
      // dedup state is dropped along with it
      mem.addData((2L, t4, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // a re-post of t3 past the horizon is re-admitted — the documented
      // trade for state bounded by the lateness horizon, not the corpus
      mem.addData((3L, t3, ts("2024-01-01 01:00:30")))
      q.processAllAvailable()
      // an in-horizon dup of the SAME text is still dropped
      mem.addData((4L, t3, ts("2024-01-01 01:00:40")))
      q.processAllAvailable()

      val got = spark.sql("SELECT doc_id FROM ingest_dedup_ttl")
        .as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L), s"got=$got")
    } finally q.stop()
  }
}
