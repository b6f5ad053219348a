package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio-column plumbing: WAV payloads as opaque `binary` columns with a
  * real pure-JVM RIFF/WAVE codec (no external dependency) and
  * integer-exact acoustic features.
  *
  * The reference pipeline has no audio surface; this is the audio leg of
  * the multimodal contract ([[MultimodalOps]] covers image/video): decode
  * runs payload-local inside `mapPartitions` (the opaque-bytes codec
  * discipline — no per-sample rows ever hit a shuffle), features are
  * exact integer folds (sum, sum-of-squares, zero crossings, peak over
  * 16-bit samples — associative-exact under ANY partitioning), and the
  * near-dup fingerprint is the classic energy-delta bit vector
  * (Haitsma–Kalker / Shazam family): one bit per adjacent window pair,
  * set when energy rises. Everything downstream of decode is 8-byte
  * keys and map-side-combining aggregates, so the plan at 100 TB is one
  * shuffle on the fingerprint.
  *
  * Test payloads are deterministic synthetic WAVs: REAL RIFF containers
  * (fmt + a LIST/INFO chunk the parser must skip + data) whose PCM
  * samples come from the same splitmix64 mixing as the granule-source
  * decode stand-in, so the DuckDB oracle replays every sample bit for
  * bit in HUGEINT SQL (the `q_granule_source` discipline).
  */
object AudioOps {

  /** Samples per synthetic clip — small enough that the oracle's
    * per-sample replay stays cheap, large enough for 32 energy windows.
    */
  val NSamples = 256
  /** Synthetic sample rate (Hz). 256 samples / 8 kHz = exactly 32 ms. */
  val SampleRate = 8000
  /** Window width (samples) for the energy-delta fingerprint. */
  val WindowLen = 8
  /** Documents with equal `doc_id % SeedGroups` get byte-identical audio
    * — the planted duplicates [[dupGroups]] must find.
    */
  val SeedGroups = 100L
  /** Knuth multiplicative-hash constant spreading (seed, i) before the
    * splitmix rounds; `seed * SeedMult + i` never wraps (seed < 2^32).
    */
  val SeedMult = 2654435761L

  /** splitmix64 finalizer (Steele et al., public constants) — the same
    * mixing the DuckDB oracle replays in HUGEINT mod 2^64.
    */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sample `i` of the clip for seed group `seed`: low 16 mixed bits,
    * re-centered to signed PCM. Equals the oracle's
    * `(m % 65536) - 32768`.
    */
  def sampleAt(seed: Long, i: Int): Short =
    ((mix(seed * SeedMult + i) & 0xffffL) - 32768L).toShort

  /** Deterministic 16-bit PCM mono WAV for a document id. The container
    * is canonical RIFF: `fmt ` (PCM, mono, 16-bit, 8 kHz), then a
    * LIST/INFO metadata chunk (so [[decodeWav]] exercises real
    * unknown-chunk skipping), then `data` with little-endian samples.
    */
  def synthWav(docId: Long): Array[Byte] = {
    val seed = docId % SeedGroups
    val dataBytes = NSamples * 2
    val listBody = 16 // "INFO" + "INAM" + size(4) + "doc\u0000"
    val riffSize = 4 + (8 + 16) + (8 + listBody) + (8 + dataBytes)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("LIST".getBytes("ASCII")).putInt(listBody)
      .put("INFO".getBytes("ASCII"))
      .put("INAM".getBytes("ASCII")).putInt(4)
      .put("doc\u0000".getBytes("ASCII"))
    bb.put("data".getBytes("ASCII")).putInt(dataBytes)
    var i = 0
    while (i < NSamples) { bb.putShort(sampleAt(seed, i)); i += 1 }
    bb.array()
  }

  /** Decoded PCM: format fields straight from the `fmt ` chunk. */
  final case class WavPcm(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short])

  /** Pure-JVM RIFF/WAVE parse: verifies the RIFF/WAVE magic, walks the
    * chunk list (unknown chunks skipped, odd sizes padded per spec),
    * requires PCM/16-bit from `fmt ` before `data`, and returns the
    * little-endian samples. `None` for anything malformed — the caller
    * keeps the pipeline total (same NonFatal discipline as
    * [[MultimodalOps.decodeImage]]).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavPcm] =
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4)
      bb.get(magic)
      if (!java.util.Arrays.equals(magic, "RIFF".getBytes("ASCII"))) return None
      bb.getInt() // declared RIFF size; chunk walk is bounds-governed
      bb.get(magic)
      if (!java.util.Arrays.equals(magic, "WAVE".getBytes("ASCII"))) return None
      var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
      while (bb.remaining() >= 8) {
        bb.get(magic)
        val size = bb.getInt()
        if (size < 0 || size > bb.remaining()) return None
        val id = new String(magic, "ASCII")
        if (id == "fmt ") {
          if (size < 16) return None
          val p0 = bb.position()
          val audioFormat = bb.getShort() & 0xffff
          val channels = bb.getShort() & 0xffff
          val rate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          val bits = bb.getShort() & 0xffff
          if (audioFormat != 1) return None // PCM only
          fmt = Some((rate, channels, bits))
          bb.position(p0 + size)
        } else if (id == "data") {
          val (rate, channels, bits) = fmt.getOrElse(return None)
          if (bits != 16) return None
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort(); i += 1 }
          return Some(WavPcm(rate, channels, bits, out))
        } else {
          bb.position(bb.position() + size)
        }
        if ((size & 1) == 1 && bb.remaining() > 0) // RIFF pad byte
          bb.position(bb.position() + 1)
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Integer-exact acoustic features of one clip. Every field is a
    * row-local integer fold: `sum_amp`/`sum_sq` exact in Long (256
    * samples x 32768^2 < 2^35), `zero_cross` counts sign-bit changes
    * (x >= 0 vs x < 0), `peak` = max |sample| — bit-identical on any
    * engine, any partitioning.
    */
  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, n_samples: Long, duration_ms: Long,
      sum_amp: Long, sum_sq: Long, zero_cross: Long, peak: Long)

  def featuresOf(docId: Long, pcm: WavPcm): AudioFeatures = {
    val s = pcm.samples
    var sumAmp = 0L; var sumSq = 0L; var zc = 0L; var peak = 0L
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      sumAmp += v; sumSq += v * v
      if (i > 0 && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      i += 1
    }
    AudioFeatures(docId, pcm.sampleRate, s.length.toLong,
      s.length.toLong * 1000L / pcm.sampleRate, sumAmp, sumSq, zc, peak)
  }

  /** Energy-delta fingerprint: window the clip into [[WindowLen]]-sample
    * blocks, bit w set iff energy(w+1) > energy(w). 31 bits for a
    * 256-sample clip — amplitude-monotone, integer-exact, and stable
    * under any engine's arithmetic.
    */
  def fingerprint(samples: Array[Short]): Long = {
    val nW = samples.length / WindowLen
    if (nW < 2) return 0L
    val e = new Array[Long](nW)
    var i = 0
    while (i < nW * WindowLen) {
      val v = samples(i).toLong
      e(i / WindowLen) += v * v
      i += 1
    }
    var fp = 0L
    var w = 0
    while (w < nW - 1) {
      if (e(w + 1) > e(w)) fp |= 1L << w
      w += 1
    }
    fp
  }

  /** doc_id -> synthetic WAV payload, payload-local. The synth+decode
    * round trip runs INSIDE the partition (real parser on the hot path);
    * only the 8-column integer feature row leaves it.
    */
  def featureFrame(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val pcm = decodeWav(synthWav(id)).getOrElse(
            WavPcm(SampleRate, 1, 16, Array.empty[Short]))
          featuresOf(id, pcm)
        }
      }
      .toDF()
  }

  /** Duplicate-audio groups by fingerprint: one map-side-combining
    * shuffle on the 8-byte fingerprint; groups of size 1 drop. The
    * synthetic corpus plants duplicates (equal `doc_id % SeedGroups`
    * => byte-identical audio => equal fingerprint), so every group has
    * >= 2 members whenever the table spans a seed group twice.
    */
  def dupGroups(docs: DataFrame): DataFrame = {
    fingerprintFrame(docs)
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_docs") > 1)
  }

  /** Observation-id offset for [[variantFingerprintFrame]]'s
    * "re-recorded" clips (keeps variant ids disjoint from doc ids).
    */
  val VariantIdOffset = 1000000L

  /** The window a clip's variant attenuates: 1..NWindows-2 so both
    * adjacent fingerprint bits (w-1, w) exist — a variant differs from
    * its source by AT MOST 2 energy-delta bits.
    */
  def quietWindowOf(docId: Long): Int =
    (docId % (NSamples / WindowLen - 2) + 1).toInt

  /** A "re-recorded" variant of a clip: the same WAV container and PCM
    * except window [[quietWindowOf]]'s samples are halved toward zero
    * (`v / 2` — Java truncation; the oracle replays it with the
    * sign-split `//`). Quartering one window's energy can flip only the
    * two delta bits that window participates in, so source and variant
    * are Hamming <= 2 apart in fingerprint space — planted NEAR-dups
    * (the exact-equality groups of [[dupGroups]] never see them).
    */
  def synthWavVariant(docId: Long): Array[Byte] = {
    val bytes = synthWav(docId)
    val qw = quietWindowOf(docId)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataStart = bytes.length - NSamples * 2
    var i = qw * WindowLen
    while (i < (qw + 1) * WindowLen) {
      val p = dataStart + i * 2
      bb.putShort(p, (bb.getShort(p) / 2).toShort)
      i += 1
    }
    bytes
  }

  /** (doc_id, fingerprint) per clip — the indexable signature frame both
    * [[dupGroups]] and radius-tolerant matching build on. Payload-local:
    * only the 8-byte fingerprint leaves the partition.
    */
  def fingerprintFrame(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val pcm = decodeWav(synthWav(id)).getOrElse(
            WavPcm(SampleRate, 1, 16, Array.empty[Short]))
          (id, fingerprint(pcm.samples))
        }
      }
      .toDF("doc_id", "fingerprint")
  }

  /** Fingerprints of each doc's re-recorded variant, id-shifted by
    * [[VariantIdOffset]].
    */
  def variantFingerprintFrame(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val pcm = decodeWav(synthWavVariant(id)).getOrElse(
            WavPcm(SampleRate, 1, 16, Array.empty[Short]))
          (id + VariantIdOffset, fingerprint(pcm.samples))
        }
      }
      .toDF("doc_id", "fingerprint")
  }

  /** Radius-tolerant audio near-duplicate pairs: all (id_a < id_b) whose
    * fingerprints are within Hamming `maxHamming`, via the SAME
    * pigeonhole chunk join [[DedupOps.simhashNearDupPairs]] runs for
    * text simhash and media phash — candidates meet on an equal
    * (maxHamming+1)-way chunk (one of them MUST match within the
    * radius), exact bit_count verify after. `bits = 32` covers the
    * 31-bit energy-delta fingerprint; 64 would put every clip in one
    * all-zero top chunk and degenerate to all-pairs.
    *
    * Real audio dup detection needs this tolerance: a re-encode or
    * re-record perturbs a couple of energy deltas, which exact-equality
    * grouping ([[dupGroups]]) can never see.
    */
  def nearDupPairs(fps: DataFrame, maxHamming: Int): DataFrame =
    DedupOps.simhashNearDupPairs(
      fps.select(col("doc_id"), col("fingerprint").as("simhash")),
      bits = 32, maxHamming = maxHamming)
}
