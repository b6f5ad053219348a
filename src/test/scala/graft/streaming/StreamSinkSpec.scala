package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The production delivery story for streaming pipelines: a parquet file
  * sink with a checkpoint is exactly-once — a stopped-and-restarted query
  * resumes from the committed offsets (no re-emission of already-written
  * batches) and readers only see files recorded in the `_spark_metadata`
  * transaction log, so partially-written output is never visible.
  */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("parquet sink + checkpoint: restart resumes without duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream_sink").toString
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")

    def start() = df.filter($"event_type" === "click")
      .select($"event_id",
        round($"value" * 100).cast("long").as("value_c"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:05:00"), "click", 1.50),
        (2L, ts("2024-01-01 00:06:00"), "view", 9.99),
        (3L, ts("2024-01-01 00:07:00"), "click", 2.25))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the same checkpoint: batch 0 is committed — only new
    // data may produce output
    val q2 = start()
    try {
      mem.addData(
        (4L, ts("2024-01-01 00:08:00"), "click", 4.00),
        (5L, ts("2024-01-01 00:09:00"), "view", 0.10))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 150L), (3L, 225L), (4L, 400L)),
      s"exactly the click rows, each once: $rows")

    // the transaction log is what makes the sink atomic for readers
    assert(new java.io.File(s"$out/_spark_metadata").exists,
      "parquet streaming sink must write its _spark_metadata commit log")
  }
}
