package graft.ops

import graft.SparkSpec

class AudioOpsSpec extends SparkSpec {

  import AudioOps._

  test("synth -> decode round-trips the exact PCM samples and fmt fields") {
    val wav = synthWav(42L)
    val pcm = decodeWav(wav).get
    assert(pcm.sampleRate == SampleRate)
    assert(pcm.channels == 1)
    assert(pcm.bitsPerSample == 16)
    assert(pcm.samples.length == NSamples)
    val seed = 42L % SeedGroups
    (0 until NSamples).foreach(i => assert(pcm.samples(i) == sampleAt(seed, i)))
  }

  test("parser skips the LIST/INFO chunk and honors RIFF odd-size padding") {
    // hand-build a WAV with an odd-sized unknown chunk before data
    val samples = Array[Short](100, -200, 300)
    val bb = java.nio.ByteBuffer.allocate(128)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(4 + 24 + (8 + 3 + 1) + (8 + 6))
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("junk".getBytes("ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0)) // pad
    bb.put("data".getBytes("ASCII")).putInt(6)
    samples.foreach(bb.putShort)
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    val pcm = decodeWav(bytes).get
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("malformed payloads return None, never throw") {
    assert(decodeWav(Array.emptyByteArray).isEmpty)
    assert(decodeWav("RIFFxxxx".getBytes("ASCII")).isEmpty)
    assert(decodeWav(synthWav(1L).take(40)).isEmpty) // truncated mid-chunk
    val nonPcm = synthWav(1L).clone()
    nonPcm(20) = 3 // fmt audioFormat = IEEE float -> rejected
    assert(decodeWav(nonPcm).isEmpty)
  }

  test("features are the hand-computed integer folds") {
    val pcm = WavPcm(8000, 1, 16, Array[Short](3, -2, 0, -5))
    val f = featuresOf(7L, pcm)
    assert(f.n_samples == 4)
    assert(f.duration_ms == 0) // 4 * 1000 / 8000 truncates
    assert(f.sum_amp == 3 - 2 + 0 - 5)
    assert(f.sum_sq == 9 + 4 + 0 + 25)
    // sign runs: + - + - => 3 crossings (0 counts as non-negative)
    assert(f.zero_cross == 3)
    assert(f.peak == 5)
  }

  test("fingerprint sets exactly the rising-energy bits") {
    // 3 windows of 8: energies 8*1, 8*4, 8*1 -> bits (e1>e0)=1, (e2>e1)=0
    val s = Array.fill(8)(1.toShort) ++ Array.fill(8)(2.toShort) ++
      Array.fill(8)(1.toShort)
    assert(fingerprint(s) == 1L)
    assert(fingerprint(Array[Short](1, 2, 3)) == 0L) // < 2 windows
  }

  test("planted duplicates share fingerprints; feature frame is exact") {
    val spark0 = spark
    import spark0.implicits._
    // ids 0..249 span each seed group 0..99 at least twice
    val docs = (0L until 250L).toDF("doc_id")
    val feats = AudioOps.featureFrame(docs).collect()
    assert(feats.length == 250)
    val f0 = feats.find(_.getLong(0) == 17L).get
    val expect = featuresOf(17L, decodeWav(synthWav(17L)).get)
    assert(f0.getLong(4) == expect.sum_amp && f0.getLong(5) == expect.sum_sq)
    val dups = AudioOps.dupGroups(docs).collect()
    // every fingerprint group covers >= 2 docs; ids i and i+100 collide
    assert(dups.nonEmpty)
    assert(dups.forall(_.getLong(1) >= 2L))
    val fpOf = AudioOps.featureFrame(docs) // determinism across plans
    assert(fpOf.count() == 250)
    val fp17 = fingerprint(decodeWav(synthWav(17L)).get.samples)
    val fp117 = fingerprint(decodeWav(synthWav(117L)).get.samples)
    assert(fp17 == fp117) // same seed group -> identical audio
  }

  test("radius-tolerant near-dup finds planted 1-2 bit variants; exact groups unchanged") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (0L until 100L).toDF("doc_id")
    // each variant differs from its source by <= 2 fingerprint bits
    // (only the halved window's two delta bits can flip), and by >= 1
    // for at least some sources (otherwise the plant is vacuous)
    val hams = (0L until 100L).map { id =>
      val src = fingerprint(decodeWav(synthWav(id)).get.samples)
      val variant = fingerprint(decodeWav(synthWavVariant(id)).get.samples)
      java.lang.Long.bitCount(src ^ variant)
    }
    assert(hams.forall(_ <= 2), s"variant flipped > 2 bits: ${hams.max}")
    assert(hams.exists(_ >= 1), "no variant flipped any bit — vacuous plant")

    val fps = AudioOps.fingerprintFrame(docs)
      .unionByName(AudioOps.variantFingerprintFrame(docs))
    val pairs = AudioOps.nearDupPairs(fps, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // every perturbed variant is found against its own source
    (0L until 100L).filter(id => hams(id.toInt) >= 1).foreach { id =>
      val key = (id, id + AudioOps.VariantIdOffset)
      assert(pairs.contains(key), s"planted near-dup $key missed")
      assert(pairs(key) == hams(id.toInt))
    }
    // pigeonhole result == brute force over the same fingerprint frame
    val all = fps.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, fa) <- all; (ib, fb) <- all
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs.keySet == brute)
    // exact-equality groups are untouched by the variants' existence
    val exact = AudioOps.dupGroups(docs).collect()
    assert(exact.forall(_.getLong(1) == 1L) || exact.isEmpty ||
      exact.forall(r => r.getLong(2) < AudioOps.VariantIdOffset))
  }
}
