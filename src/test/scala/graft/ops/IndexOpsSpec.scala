package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("doc_id") < 150)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("postings refresh appends files without rewriting the base segment") {
    val idx = tmp("idxp_")
    IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base")
    val baseFiles = filesWithSize(s"$idx/postings")
    IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 === 0), idx, "delta1")
    val afterFiles = filesWithSize(s"$idx/postings")
    // every base parquet file survives untouched (pure file adds)
    val basePq = baseFiles.filter(_._1.toString.endsWith(".parquet"))
    assert(basePq.nonEmpty)
    assert(basePq.subsetOf(afterFiles), "append rewrote base postings files")
    assert(afterFiles.size > baseFiles.size, "append added no files")
    // merged lake == from-scratch postings over the union
    val merged = IndexOps.readPostings(spark, idx)
      .select("doc_id", "pos", "token")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val scratch = SearchOps.positionalPostings(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(merged == scratch)
  }

  private def filesWithSize(p: String): Set[(Path, Long)] = {
    val root = java.nio.file.Paths.get(p)
    if (!Files.exists(root)) Set.empty
    else {
      val s = Files.walk(root)
      try {
        val it = s.filter(Files.isRegularFile(_)).iterator()
        val b = Set.newBuilder[(Path, Long)]
        while (it.hasNext) { val f = it.next(); b += (f -> Files.size(f)) }
        b.result()
      } finally s.close()
    }
  }

  test("refresh is idempotent per segment name (ledger no-op on re-run)") {
    val idx = tmp("idxi_")
    IndexOps.refreshPostings(docs, idx, "base")
    val once = filesWithSize(s"$idx/postings")
    IndexOps.refreshPostings(docs, idx, "base")
    assert(filesWithSize(s"$idx/postings") == once, "re-run double-appended")
    assert(IndexOps.coveredSegments(spark, idx, "postings") == Set("base"))
  }

  test("coveredSegments: marker fast path, legacy parquet fallback, and " +
    "backfill migration on first extend") {
    val idx = tmp("idxledger_")
    import spark.implicits._
    // legacy store: parquet ledger rows only (pre-marker scheme)
    Seq(("postings", "old1"), ("postings", "old2"), ("bloom", "oldb"))
      .toDF("kind", "segment")
      .coalesce(1).write.mode("append").parquet(s"$idx/segments")
    assert(IndexOps.coveredSegments(spark, idx, "postings") ==
      Set("old1", "old2"))
    // extending the legacy store backfills markers for that kind, so the
    // marker dir is authoritative from then on (and probes stop costing a
    // Spark job); odd segment names survive the filename encoding
    IndexOps.recordSegment(spark, idx, "postings", "we ird/seg")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$idx/segments/.ledger/postings")))
    assert(IndexOps.coveredSegments(spark, idx, "postings") ==
      Set("old1", "old2", "we ird/seg"))
    // other kinds keep their parquet fallback untouched
    assert(IndexOps.coveredSegments(spark, idx, "bloom") == Set("oldb"))
    // the dot-dir is invisible to the parquet ledger reader
    assert(spark.read.parquet(s"$idx/segments").count() == 4)
  }

  test("bloom refresh merge equals from-scratch build (OR-monoid)") {
    val idx = tmp("idxb_")
    val part = col("lang")
    IndexOps.refreshBloom(docs.filter(col("doc_id") % 3 =!= 0), idx, "base",
      part, col("doc_id"), mBits = 4096, k = 3)
    IndexOps.refreshBloom(docs.filter(col("doc_id") % 3 === 0), idx, "delta1",
      part, col("doc_id"), mBits = 4096, k = 3)
    // idempotent re-run
    IndexOps.refreshBloom(docs.filter(col("doc_id") % 3 === 0), idx, "delta1",
      part, col("doc_id"), mBits = 4096, k = 3)
    val merged = IndexOps.readBloom(spark, idx)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val scratch = LakeOps.bloomPartitionIndex(
      docs, part, col("doc_id"), mBits = 4096, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == scratch)
    assert(merged.nonEmpty)
  }

  test("staleness flags exactly the never-refreshed segments") {
    val idx = tmp("idxs_")
    IndexOps.refreshPostings(docs, idx, "base")
    val got = IndexOps.staleness(spark, idx, "postings",
      Seq("base", "delta1")).collect()
      .map(r => (r.getString(1), r.getInt(2))).toMap
    assert(got == Map("base" -> 1, "delta1" -> 0))
    // and the bloom ledger is independent of the postings ledger
    assert(IndexOps.coveredSegments(spark, idx, "bloom").isEmpty)
  }

  test("writeSalt > 1: salted postings lake is read-equivalent and caps " +
    "per-bucket file counts at salt per segment") {
    val plain = tmp("idxsalt0_")
    val salted = tmp("idxsalt_")
    IndexOps.refreshPostings(docs, plain, "base")
    spark.conf.set("spark.graft.store.writeSalt", "4")
    try IndexOps.refreshPostings(docs, salted, "base")
    finally spark.conf.unset("spark.graft.store.writeSalt")
    val a = IndexOps.readPostings(spark, plain)
      .select("doc_id", "pos", "token")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val b = IndexOps.readPostings(spark, salted)
      .select("doc_id", "pos", "token")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(a == b)
    val perBucket = filesWithSize(s"$salted/postings").toSeq
      .map(_._1).filter(_.toString.endsWith(".parquet"))
      .groupBy(_.getParent).values.map(_.length)
    assert(perBucket.nonEmpty && perBucket.forall(_ <= 4),
      "a bucket dir holds at most salt files per segment")
    // POSITIVE split assertion (the <= cap alone would pass even if the
    // salt key were silently dropped): under salt=4 the same segment must
    // write MORE part files than the plain one-file-per-bucket layout
    val plainFiles = filesWithSize(s"$plain/postings").toSeq
      .map(_._1).count(_.toString.endsWith(".parquet"))
    assert(perBucket.sum > plainFiles,
      "salt=4 must split at least one bucket's write into multiple files")
  }

  test("phraseSearch through the lake equals search over raw postings") {
    val idx = tmp("idxq_")
    IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base")
    IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 === 0), idx, "delta1")
    val phrase = Seq("slow", "hash", "batch")
    val viaLake = IndexOps.phraseSearch(spark, idx, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = SearchOps.phraseSearch(
      SearchOps.positionalPostings(docs, "doc_id", "text"), phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLake == direct)
  }
}
