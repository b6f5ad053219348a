package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRow

/** Content-defined chunking AS A STREAMING INGEST: [[MultimodalOps
  * .contentChunks]] is a pure payload-local flatMap (no shuffle, no
  * state), so the IDENTICAL code path runs under `writeStream` into a
  * chunk-manifest parquet sink (checkpoint = exactly-once file delivery).
  * Because anchors are content-local (no cross-blob or sequential state),
  * the chunk manifest a stream accretes is bit-identical to a batch
  * re-chunk of the full corpus — the property that lets a blob store
  * dedup NEW uploads against years of history without ever re-chunking
  * it. The dedup-ratio readout over the accreted manifest equals the
  * batch readout for the same reason.
  */
class ChunkIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def payload(seed: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => (graft.ops.AudioOps.mix(seed * 31 + i) & 0xff).toByte)

  test("streamed chunk-on-ingest manifest == batch re-chunk of the union") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("cdc_stream").toString
    val out = s"$dir/manifest"
    val ckpt = s"$dir/ckpt"

    // 40 blobs; every 4th is a dup of blob 0 (cross-micro-batch sharing)
    val blobs = (0L until 40L).map { id =>
      MediaRow(id, "image", payload(if (id % 4 == 0) 0L else id, 400 + (id % 7).toInt * 50))
    }

    val mem = MemoryStream[MediaRow]
    val q = MultimodalOps.contentChunks(mem.toDS())
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val (first, rest) = blobs.splitAt(blobs.length / 2)
      mem.addData(first)
      q.processAllAvailable()
      mem.addData(rest)
      q.processAllAvailable()
    } finally q.stop()

    val cols = Seq("media_id", "chunk_idx", "start", "len", "chash").map(col)
    val streamed = spark.read.parquet(out).select(cols: _*)
      .collect().map(_.toString).sorted.toSeq
    val batch = MultimodalOps.contentChunks(blobs.toDS()).toDF().select(cols: _*)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)

    // dedup readout over the accreted manifest == batch readout, and the
    // planted dups actually share storage (unique < total)
    def readout(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"chash").agg(count(lit(1)).as("refs"), min($"len").as("clen"))
      .agg(sum($"refs" * $"clen").as("total"), sum($"clen").as("unique"))
      .collect().head
    val r = readout(spark.read.parquet(out))
    assert(r == readout(MultimodalOps.contentChunks(blobs.toDS()).toDF()))
    assert(r.getLong(1) < r.getLong(0),
      s"planted dups must dedup: unique ${r.getLong(1)} vs total ${r.getLong(0)}")
  }
}
