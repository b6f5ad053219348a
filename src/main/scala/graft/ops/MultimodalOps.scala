package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, and a partition-batched
  * decode/feature-extract stage.
  *
  * The Spark-side machinery is real and tested — schema, partitioning,
  * batch iteration via `mapPartitions` on a typed `Dataset` (the Scala
  * analog of `mapInPandas`: one JVM-side batch loop per partition, no
  * per-row closure dispatch into Python). IMAGE decode/resize are REAL:
  * the JDK's built-in `javax.imageio` (PNG/JPEG/GIF/BMP, headless-safe,
  * zero extra dependencies) produces true dimensions, exact-integer mean
  * luma, and real pixel resampling. Payloads no JDK reader recognizes
  * (audio/video containers, synthetic bytes) fall back to the
  * deterministic SHA-256 stubs, keeping every pipeline total and
  * reproducible; a production audio/video codec swaps one function.
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

  /** STUB CODEC — deterministic fake decode for payloads no JDK reader
    * recognizes (audio/video/synthetic bytes): pseudo-features from a
    * SHA-256 of the payload. The signature (bytes in, features out) is
    * the stable contract; [[decodeImage]] is the REAL path for PNG/JPEG/
    * GIF/BMP.
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

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG, JPEG,
    * GIF, BMP — no external dependency, headless-safe): true
    * width/height plus mean Rec.601 luma `(299R + 587G + 114B) / 1000`,
    * normalized to [0, 1]. The luma sum is accumulated in exact integer
    * arithmetic (one long per image; overflow would need > 2^44 pixels)
    * so the result is deterministic across JVMs and partitionings.
    * Returns None when no registered reader recognizes the bytes — the
    * caller falls back to [[decodeStub]].
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var num = 0L // sum of (299R + 587G + 114B) over all pixels
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            num += 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, num.toDouble / (1000.0 * 255.0 * w * h)))
      }
    } catch {
      // ImageIO plugins throw RuntimeExceptions (IllegalArgumentException,
      // ArrayIndexOutOfBoundsException, ...) on corrupt/truncated images,
      // not just IOException; a malformed payload must fall back to the
      // stub, never crash the executor task (the total-pipeline contract)
      case scala.util.control.NonFatal(_) => None
    }

  /** Decode one payload: real image decode when a JDK reader recognizes
    * the bytes, deterministic stub otherwise. The SHA-256 content address
    * is computed either way.
    */
  def decode(payload: Array[Byte]): (String, Int, Int, Double) =
    decodeImage(payload) match {
      case Some((w, h, lum)) =>
        val digest = MessageDigest.getInstance("SHA-256").digest(payload)
        (digest.map(b => f"${b & 0xff}%02x").mkString, w, h, lum)
      case None => decodeStub(payload)
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
        val (hex, w, h, lum) = decode(r.payload)
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

  /** STUB RESIZE — deterministic byte-level downsample for payloads no
    * JDK reader recognizes: keeps every `factor`-th byte. Real images go
    * through [[resizeImage]] instead.
    */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] =
    payload.indices.collect { case i if i % factor == 0 => payload(i) }.toArray

  /** REAL image resize via `javax.imageio` + `Graphics2D`: decode, scale
    * both dimensions down by `factor` (bilinear, floor, min 1 px),
    * re-encode as PNG. None when the bytes aren't a decodable image.
    */
  def resizeImage(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = math.max(1, img.getWidth / factor)
        val h = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch {
      // same NonFatal discipline as decodeImage: malformed bytes route
      // to resizeStub instead of crashing the task
      case scala.util.control.NonFatal(_) => None
    }

  /** Partition-batched resize: same no-shuffle `mapPartitions` shape as
    * [[extractFeatures]]. Decodable images get a real pixel resample
    * ([[resizeImage]]); everything else the deterministic byte stub.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions(_.filter(_.payload != null).map(r =>
      r.copy(payload = resizeImage(r.payload, factor)
        .getOrElse(resizeStub(r.payload, factor)))))
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

  // -------------------------------------------------------------------
  // Content-defined chunking (storage-level blob dedup)
  // -------------------------------------------------------------------

  /** One content-defined chunk of a payload. */
  final case class ChunkRow(
    media_id: Long, chunk_idx: Int, start: Int, len: Int, chash: Long)

  /** Content-defined chunking parameters. Anchors are PURE functions of
    * the local byte window (Manber '94 fingerprint anchors — no
    * min/max-length state like LBFS/FastCDC), deliberately: a
    * position-independent anchor means two writers chunking overlapping
    * blobs — or an engine and its oracle — agree with zero sequential
    * state, and an edit's damage stays bounded by one window.
    */
  object Cdc {
    /** Rolling window in bytes. */
    val Window = 16
    /** Salt separating the gear family from the Bloom/KMV/HRW members. */
    val GearSalt = 9103
    /** Anchor test: `((h >> AnchorShift) & AnchorMask) == 0` — mask 63
      * => anchor probability 1/64 => ~64-byte average chunks. The shift
      * judges middle bits (the low 6 depend on too few window bytes).
      */
    val AnchorShift = 8
    val AnchorMask = 63L

    /** Gear table: 15-bit splitmix values per byte, so the windowed sum
      * `h = sum_t gear(b[i-W+1+t]) * 2^t` stays below 2^35 (exact in any
      * engine's integers). Same splitmix64 family as the Bloom/KMV/CMS
      * expressions; the oracle regenerates the 256 values in HUGEINT SQL.
      */
    lazy val gear: Array[Long] = Array.tabulate(256)(b =>
      AudioOps.mix(b.toLong * 2654435761L + GearSalt) & 0x7fffL)

    /** Chunk `bytes`: anchors close a chunk at every window position
      * whose rolling hash passes the anchor test (first full window ends
      * at `Window - 1`); the final chunk closes at the payload end.
      * Chunk hash = the house `(acc*31 + byte) mod 1e9+7` polynomial
      * over the chunk's (unsigned) bytes — the oracle-portable DEMO
      * address; a production store swaps in a 128/256-bit content hash
      * (the 1e9+7 space collides at billions of chunks). Collisions are
      * deterministic and identical on both engines, so gates stay exact. One O(n) pass: the windowed
      * sum updates incrementally (`h = (h - gear(out)) / 2 + gear(in) <<
      * (W-1)` — exact integer algebra, no bit-borrow: h minus its t=0
      * term is even by construction).
      */
    def chunksOf(bytes: Array[Byte]): Seq[(Int, Int, Long)] = {
      val n = bytes.length
      if (n == 0) return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
      var h = 0L
      var start = 0
      var chash = 0L
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        chash = (chash * 31 + b) % 1000000007L
        h =
          if (i < Window) h + (gear(b) << i)
          else (h - gear(bytes(i - Window) & 0xff)) / 2 + (gear(b) << (Window - 1))
        val anchored =
          i >= Window - 1 && ((h >> AnchorShift) & AnchorMask) == 0
        if (anchored || i == n - 1) {
          out += ((start, i - start + 1, chash))
          start = i + 1
          chash = 0L
        }
        i += 1
      }
      out.toSeq
    }
  }

  /** Content-defined chunks per payload — the dedup unit of every blob
    * store (backup dedup, artifact caches, image-layer stores): equal
    * chunk hashes across payloads dedup storage even when blobs embed
    * each other at shifted offsets, which fixed-size blocks structurally
    * cannot see. Payload-local mapPartitions codec (the
    * [[extractFeatures]] batch shape): one pass per blob, only the
    * 5-column integer chunk rows leave the partition — grouping by
    * `chash` afterwards is the ONE shuffle of a dedup-ratio pipeline,
    * and it moves chunk METADATA, never payload bytes.
    */
  def contentChunks(media: Dataset[MediaRow]): Dataset[ChunkRow] = {
    implicit val enc: Encoder[ChunkRow] = Encoders.product[ChunkRow]
    media.mapPartitions(_.filter(_.payload != null).flatMap { r =>
      Cdc.chunksOf(r.payload).iterator.zipWithIndex.map {
        case ((start, len, chash), idx) =>
          ChunkRow(r.media_id, idx, start, len, chash)
      }
    })
  }
}
