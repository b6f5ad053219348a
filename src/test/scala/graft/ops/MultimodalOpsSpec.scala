package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "an image-ish payload"),
    (1L, "an audio-ish payload"),
    (2L, "a video-ish payload"),
    (3L, "an image-ish payload") // same text as 0 -> same content hash
  ).toDF("doc_id", "text")

  test("media rows carry round-robin modality and utf-8 payload") {
    val rows = MultimodalOps.mediaFromDocuments(docs).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows(0L).modality == "image")
    assert(rows(1L).modality == "audio")
    assert(rows(2L).modality == "video")
    assert(new String(rows(0L).payload, "UTF-8") == "an image-ish payload")
  }

  test("feature extraction is deterministic and content-addressed") {
    val feats = MultimodalOps.documentFeatures(spark, docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // same payload -> same sha/dims regardless of id (dedup-by-content works)
    assert(feats(0L).getString(3) == feats(3L).getString(3))
    assert(feats(0L).getInt(4) == feats(3L).getInt(4))
    assert(feats(0L).getString(3) != feats(1L).getString(3))
    // dims in the stub's documented ranges
    feats.values.foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getInt(4) >= 64 && r.getInt(4) < 64 + 4096)
      assert(r.getInt(5) >= 64 && r.getInt(5) < 64 + 4096)
      val lum = r.getDouble(6)
      assert(lum >= 0.0 && lum <= 1.0)
    }
  }

  test("sampleFrames slices byte windows and keeps every n-th frame") {
    val media = MultimodalOps.mediaFromDocuments(
      Seq((0L, "0123456789" * 7)).toDF("doc_id", "text")) // 70 bytes
    val frames = MultimodalOps.sampleFrames(media, frameSize = 32, every = 2)
      .collect().sortBy(_.frame_idx)
    // ceil(70/32) = 3 frames -> keep idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames(0).frame_bytes.length == 32)
    assert(frames(1).frame_bytes.length == 70 - 64)
    assert(new String(frames(1).frame_bytes, "UTF-8") == "456789")
    // content-addressed: sha matches an independent digest
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(frames(0).frame_bytes).map(b => f"${b & 0xff}%02x").mkString
    assert(frames(0).frame_sha == expect)
  }

  test("resize keeps every n-th byte deterministically") {
    val media = MultimodalOps.mediaFromDocuments(
      Seq((0L, "abcdefgh")).toDF("doc_id", "text"))
    val out = MultimodalOps.resize(media, 3).collect().head
    assert(new String(out.payload, "UTF-8") == "adg")
  }

  /** Real PNG fixture: w x h with the left half `left`-colored and the
    * right half `right`-colored (packed 0xRRGGBB).
    */
  private def pngBytes(w: Int, h: Int, left: Int, right: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) left else right)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode to true dimensions and exact mean luma") {
    // 8x4, left half white (luma 1.0), right half black (luma 0.0)
    val png = pngBytes(8, 4, 0xFFFFFF, 0x000000)
    val (_, w, h, lum) = MultimodalOps.decode(png)
    assert(w == 8 && h == 4, "true decoded dimensions, not stub pseudo-dims")
    assert(lum == 0.5, "half white + half black = exactly 0.5 mean luma")

    // pure green: Rec.601 luma = 587/1000 exactly
    val (_, _, _, g) = MultimodalOps.decode(pngBytes(3, 3, 0x00FF00, 0x00FF00))
    assert(g == 0.587)

    // through the full Spark pipeline: a real image row among opaque ones
    val media = Seq(
      MultimodalOps.MediaRow(1L, "image", png),
      MultimodalOps.MediaRow(2L, "audio", "not an image".getBytes("UTF-8")))
      .toDS()
    val feats = MultimodalOps.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 8 && feats(1L).height == 4 && feats(1L).mean_lum == 0.5)
    // non-image payload still flows through via the deterministic stub
    assert(feats(2L).width >= 64 && feats(2L).n_bytes == 12L)
  }

  test("real PNG resize resamples pixels (stub only for opaque payloads)") {
    val png = pngBytes(8, 4, 0xFFFFFF, 0xFFFFFF) // all white
    val media = Seq(MultimodalOps.MediaRow(1L, "image", png)).toDS()
    val out = MultimodalOps.resize(media, 2).collect().head
    val (_, w, h, lum) = MultimodalOps.decode(out.payload)
    assert(w == 4 && h == 2, "dimensions halved by real resampling")
    assert(lum == 1.0, "all-white stays all-white through bilinear resize")
  }

  test("extraction preserves partitioning (no shuffle)") {
    val media = MultimodalOps.mediaFromDocuments(docs).repartition(3)
    val out = MultimodalOps.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 3)
  }

  test("pHashStub: hand-computed bits, short-payload zero, locality") {
    // 128 bytes, blocks of w=2: first 32 blocks sum 2*200, rest 2*10 —
    // exactly the high blocks exceed the mean, so bits 0..31 are set
    val hot = Array.fill(64)(200.toByte) ++ Array.fill(64)(10.toByte)
    assert(MultimodalOps.pHashStub(hot) == 0xFFFFFFFFL)
    // under one block per bit -> defined zero
    assert(MultimodalOps.pHashStub(Array.fill(63)(1.toByte)) == 0L)
    assert(MultimodalOps.pHashStub(Array.emptyByteArray) == 0L)
    // locality: flipping a few bytes moves few bits; unrelated content moves many
    val base = Array.tabulate(256)(i => (i % 251).toByte)
    val tweak = base.clone(); tweak(0) = 250.toByte; tweak(1) = 250.toByte
    val other = Array.tabulate(256)(i => ((i * 37 + 11) % 251).toByte)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hp = MultimodalOps.pHashStub(base)
    assert(ham(hp, MultimodalOps.pHashStub(tweak)) <= 4)
    assert(ham(hp, MultimodalOps.pHashStub(other)) > 8)
    // deterministic
    assert(hp == MultimodalOps.pHashStub(base.clone()))
  }
}
