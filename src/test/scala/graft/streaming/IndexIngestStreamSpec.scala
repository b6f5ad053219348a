package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{IvfOps, PqOps}

/** Index build AS A STREAMING INGEST: the IVF-PQ encode is a pure
  * row-local map ([[PqOps.encodeCorpus]] — assign + residual-encode, no
  * shuffle, no state), so the SAME plan runs under `writeStream` into the
  * hive layout [[PqOps.writeIndex]] produces in batch
  * (`partitionBy(cid)` parquet sink + checkpoint = exactly-once file
  * delivery). New vectors land in their list's directory as they arrive;
  * [[PqOps.searchIndex]] serves the growing index unchanged. This is the
  * 100 TB ingest shape: encode on arrival, never re-scan the corpus.
  */
class IndexIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed encode-on-ingest builds the same index batch encode builds") {
    implicit val sqlCtx = spark.sqlContext
    val cents = IvfOps.literalCentroids(4, 64)
    val cb = PqOps.literalCodebook(4, 8, 16)
    val dir = Files.createTempDirectory("ivfpq_stream").toString
    val out = s"$dir/index"
    val ckpt = s"$dir/ckpt"

    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val mem = MemoryStream[(Long, Array[Float])]
    val enc = PqOps.encodeCorpus(
      mem.toDF().toDF("vec_id", "embedding"), cents, cb)
    val q = enc.writeStream.format("parquet")
      .partitionBy("cid")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // two micro-batches: the index accretes across arrivals
      val (first, rest) = vecs.splitAt(vecs.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rest.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // streamed index content == batch encode of the same corpus
    val batchDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val batch = PqOps.encodeCorpus(batchDf, cents, cb)
      .collect().map(_.toString).sorted.toSeq
    val streamed = spark.read.parquet(out)
      .select($"corpus_id", $"cid", $"codes") // partition col order differs
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)

    // and serving from the streamed layout == the in-flight pipeline
    val q10 = batchDf.filter($"vec_id" < 10)
    val served = PqOps.searchIndex(out, q10, k = 10, cents, cb, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val direct = PqOps.ivfPqTopK(q10, batchDf, k = 10, cents, cb, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(served == direct)
  }
}
