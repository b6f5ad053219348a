package graft.ops

import graft.SparkSpec
import graft.ops.MultimodalOps.{Cdc, MediaRow}

class CdcChunkSpec extends SparkSpec {

  /** Deterministic pseudo-random payload. */
  private def payload(seed: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => (AudioOps.mix(seed * 31 + i) & 0xff).toByte)

  /** Naive quadratic reference: full window sum recomputed per position
    * — independently checks the O(n) incremental update.
    */
  private def referenceChunks(bytes: Array[Byte]): Seq[(Int, Int, Long)] = {
    val n = bytes.length
    if (n == 0) return Seq.empty
    val anchors = (Cdc.Window - 1 until n).filter { i =>
      val h = (0 until Cdc.Window).map { t =>
        Cdc.gear(bytes(i - Cdc.Window + 1 + t) & 0xff) << t
      }.sum
      ((h >> Cdc.AnchorShift) & Cdc.AnchorMask) == 0
    }
    val ends = (anchors :+ (n - 1)).distinct.sorted
    ends.zip(-1 +: ends.dropRight(1)).map { case (e, prev) =>
      val s = prev + 1
      val chash = (s to e).foldLeft(0L)((acc, i) =>
        (acc * 31 + (bytes(i) & 0xff)) % 1000000007L)
      (s, e - s + 1, chash)
    }
  }

  test("chunksOf matches the quadratic reference and partitions the payload") {
    for (seed <- 0L until 20L; n <- Seq(0, 1, 15, 16, 17, 200, 1000)) {
      val p = payload(seed, n)
      val got = Cdc.chunksOf(p)
      assert(got == referenceChunks(p), s"seed=$seed n=$n")
      // exact partition: contiguous, covers [0, n)
      assert(got.map(_._2).sum == n)
      got.foldLeft(0) { case (expectStart, (s, len, _)) =>
        assert(s == expectStart); s + len
      }
    }
  }

  test("shift resistance: a prepended edit only disturbs chunks up to the first shared anchor") {
    val base = payload(7L, 2000)
    val shifted = payload(99L, 37) ++ base // 37 inserted bytes at the head
    val a = Cdc.chunksOf(base).map(c => (c._2, c._3))
    val b = Cdc.chunksOf(shifted).map(c => (c._2, c._3))
    // all but the first few chunks must be IDENTICAL (len, hash) pairs —
    // anchors are content-local, so the insertion's damage is bounded;
    // fixed-size blocks would shift every boundary and share nothing
    val commonSuffix = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(commonSuffix >= a.length - 3,
      s"only $commonSuffix of ${a.length} chunks survived a head insertion")
    assert(commonSuffix < b.length, "the head chunk itself must differ")
  }

  test("identical payloads chunk identically; dedup sees the sharing") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", payload(5L, 600)),
      MediaRow(2L, "image", payload(5L, 600)), // exact dup of 1
      MediaRow(3L, "image", payload(6L, 600)), // distinct
      MediaRow(4L, "image", null) // skipped
    ).toDS()
    val chunks = MultimodalOps.contentChunks(rows).collect()
    val byId = chunks.groupBy(_.media_id)
      .map { case (k, v) => k -> v.sortBy(_.chunk_idx).map(c => (c.start, c.len, c.chash)).toSeq }
    assert(byId(1L) == byId(2L))
    assert(byId(1L) != byId(3L))
    assert(!byId.contains(4L))
  }
}
