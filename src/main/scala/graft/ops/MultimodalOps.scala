package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, and a partition-batched
  * decode/feature-extract stage.
  *
  * The Spark-side machinery is real and tested — schema, partitioning,
  * batch iteration via `mapPartitions` on a typed `Dataset` (the Scala
  * analog of `mapInPandas`: one JVM-side batch loop per partition, no
  * per-row closure dispatch into Python). Only the codec itself is a STUB:
  * this container has no image/audio libraries, so [[decodeStub]] derives
  * deterministic pseudo-features from a SHA-256 of the payload. Swapping in
  * a real decoder changes one function; every schema/partition/batch
  * decision stays.
  */
object MultimodalOps {

  /** One media row: opaque payload + source metadata. */
  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features: what a real image decoder would emit (dims,
    * channel stats), here hash-derived. `sha_hex` doubles as a content
    * address for exact dedup of media payloads.
    */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      sha_hex: String,
      width: Int,
      height: Int,
      mean_lum: Double)

  /** STUB CODEC — deterministic fake decode. A real deployment replaces
    * the body with (e.g.) javax.imageio / ffmpeg bindings; the signature
    * (bytes in, features out) is the stable contract.
    */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Double) = {
    val md = MessageDigest.getInstance("SHA-256")
    val digest = md.digest(payload)
    val hex = digest.map(b => f"${b & 0xff}%02x").mkString
    // pseudo-dimensions/luminance from the first hash bytes
    val width = 64 + ((digest(0) & 0xff) << 4 | (digest(1) & 0xff) >> 4)
    val height = 64 + ((digest(1) & 0x0f) << 8 | (digest(2) & 0xff))
    val meanLum = (digest(3) & 0xff).toDouble / 255.0
    (hex, width, height, meanLum)
  }

  /** Partition-batched feature extraction. `mapPartitions` keeps one codec
    * instance per partition (decoders are expensive to init) and streams
    * rows through it — the batch shape a 1000-executor run needs. Input
    * partitioning is preserved; no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition codec init would go here. NULL payloads (a failed
      // fetch / decode upstream) have no features — drop, don't crash;
      // fetch-failure accounting belongs to the ingest ledger, not here.
      rows.filter(_.payload != null).map { r =>
        val (hex, w, h, lum) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, hex, w, h, lum)
      }
    }
  }

  /** One sampled frame of a (video) payload. */
  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte],
      frame_sha: String)

  /** STUB RESIZE — deterministic byte-level downsample standing in for an
    * image resize: keeps every `factor`-th byte (a real codec resamples
    * pixels; the partitioning/schema contract is identical).
    */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] =
    payload.indices.collect { case i if i % factor == 0 => payload(i) }.toArray

  /** Partition-batched resize: same no-shuffle `mapPartitions` shape as
    * [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions(_.filter(_.payload != null).map(r =>
      r.copy(payload = resizeStub(r.payload, factor))))
  }

  /** Frame sampling: one media row expands to ceil(len / frameSize / every)
    * frame rows — the UDTF-shaped 1 -> N expansion (SURVEY §2.8) as a
    * typed `flatMap` over partition batches. A real implementation walks
    * container keyframes; the stub slices fixed-size byte windows, taking
    * every `every`-th frame.
    */
  def sampleFrames(
      media: Dataset[MediaRow],
      frameSize: Int,
      every: Int): Dataset[MediaFrame] = {
    implicit val enc = Encoders.product[MediaFrame]
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("SHA-256")
      rows.filter(_.payload != null).flatMap { r =>
        val nFrames = (r.payload.length + frameSize - 1) / frameSize
        (0 until nFrames).collect {
          case f if f % every == 0 =>
            val from = f * frameSize
            val until = math.min(from + frameSize, r.payload.length)
            val bytes = java.util.Arrays.copyOfRange(r.payload, from, until)
            md.reset()
            val sha = md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
            MediaFrame(r.media_id, f, bytes, sha)
        }
      }
    }
  }

  /** STUB PERCEPTUAL HASH — the block-mean signature shape of pHash over
    * raw payload bytes (a real deployment computes it over decoded
    * grayscale pixels after a DCT; the 64-bit contract and everything
    * downstream are identical). The payload splits into 64 equal blocks
    * of w = len/64 bytes (integer division; the tail remainder is
    * dropped, payloads under 64 bytes hash to 0), and bit i is set iff
    * block i's byte-sum exceeds the mean block-sum — evaluated as the
    * EXACT integer comparison 64·s_i > Σs (no floats anywhere, so the
    * signature is bit-portable and an engine oracle can replay it).
    */
  def pHashStub(payload: Array[Byte]): Long = {
    val w = payload.length / 64
    if (w == 0) return 0L
    val sums = new Array[Long](64)
    var i = 0
    while (i < 64) {
      var j = i * w
      val end = j + w
      var s = 0L
      while (j < end) { s += payload(j) & 0xff; j += 1 }
      sums(i) = s
      i += 1
    }
    val total = sums.sum
    var sig = 0L
    i = 0
    while (i < 64) {
      if (64L * sums(i) > total) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** One 64-bit perceptual signature per media row — same no-shuffle
    * `mapPartitions` batch shape as [[extractFeatures]]. Near-dup pairs
    * come from [[graft.ops.DedupOps.simhashNearDupPairs]] over the
    * result: perceptual hashes are Hamming-clustered exactly like text
    * simhashes, so the pigeonhole chunk join is the pair engine for both.
    */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    media.mapPartitions(_.filter(_.payload != null).map(r =>
      (r.media_id, pHashStub(r.payload))))
      .toDF("media_id", "phash")
  }

  /** Build a media table from the documents table (payload = UTF-8 bytes of
    * the text — a stand-in for real image bytes with identical plumbing).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col("doc_id").as("media_id"),
      // modality assignment round-robins deterministically
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** End-to-end: documents -> media rows -> batched decode -> features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(mediaFromDocuments(docs)).toDF()
}
