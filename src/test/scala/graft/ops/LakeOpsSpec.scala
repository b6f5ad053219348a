package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LakeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs() =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def filesUnder(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq.filter(f => f.getName.endsWith(".parquet"))
  }

  test("writeSharded: hive layout, per-file row cap, lossless round-trip") {
    val out = Files.createTempDirectory("lake").resolve("corpus").toString
    val df = docs()
    val target = 40L
    val plan = LakeOps.writeSharded(
      df, out, Seq("source"), col("doc_id"), target)

    // the plan matches the real per-partition counts
    val counts = df.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plan.keySet == counts.keySet.map(Seq(_)))
    counts.foreach { case (src, n) =>
      assert(plan(Seq(src)) == ((n + target - 1) / target).toInt,
        s"$src: expected ceil($n/$target)")
    }

    // hive directories exist; every file respects the row cap; file count
    // is at least the plan's (cap respected) and within the shard spread
    counts.foreach { case (src, n) =>
      val files = filesUnder(s"$out/source=$src")
      assert(files.nonEmpty, s"missing dir for source=$src")
      val sizes = files.map(f =>
        spark.read.parquet(f.getAbsolutePath).count())
      assert(sizes.forall(_ <= target),
        s"$src: a file exceeds $target rows: $sizes")
      assert(sizes.sum == n, s"$src: rows lost or duplicated")
      assert(files.size >= plan(Seq(src)),
        s"$src: fewer files than the sizing plan allows")
    }

    // nothing lost end to end (partition column round-trips through the
    // directory name)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    assert(back.select($"doc_id").except(df.select($"doc_id")).isEmpty)
    assert(df.select($"doc_id").except(back.select($"doc_id")).isEmpty)

    // exists-guard + explicit overwrite
    intercept[Exception] {
      LakeOps.writeSharded(df, out, Seq("source"), col("doc_id"), target)
    }
    LakeOps.writeSharded(df, out, Seq("source"), col("doc_id"), target,
      mode = SaveMode.Overwrite)
  }

  test("writeSharded: two-level (source, lang) hive layout sizes and round-trips") {
    val out = Files.createTempDirectory("lake").resolve("corpus2").toString
    val df = docs()
    val target = 25L
    val plan = LakeOps.writeSharded(
      df, out, Seq("source", "lang"), col("doc_id"), target)

    // sizing plan matches the real (source, lang) counts
    val counts = df.groupBy($"source", $"lang").count().collect()
      .map(r => Seq(r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(plan.keySet == counts.keySet)
    counts.foreach { case (key, n) =>
      assert(plan(key) == ((n + target - 1) / target).toInt,
        s"$key: expected ceil($n/$target)")
    }

    // nested hive directories; per-file cap holds at the leaf level
    counts.foreach { case (Seq(src, lang), n) =>
      val files = filesUnder(s"$out/source=$src/lang=$lang")
      assert(files.nonEmpty, s"missing dir source=$src/lang=$lang")
      val sizes = files.map(f => spark.read.parquet(f.getAbsolutePath).count())
      assert(sizes.forall(_ <= target), s"$src/$lang over cap: $sizes")
      assert(sizes.sum == n, s"$src/$lang rows lost or duplicated")
    }

    // lossless: BOTH partition columns round-trip through directory names
    val back = spark.read.parquet(out)
    val orig = df.select($"doc_id", $"source", $"lang")
    assert(back.select($"doc_id", $"source", $"lang").except(orig).isEmpty)
    assert(orig.except(back.select($"doc_id", $"source", $"lang")).isEmpty)

    // directory-level pruning composes across levels: filtering one
    // (source, lang) pair reads only that leaf directory
    val pruned = back.filter($"source" === counts.keySet.head.head &&
      $"lang" === counts.keySet.head(1))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"expected partition pruning:\n$scan")
  }

  test("writeSharded layout is deterministic (content-keyed shards)") {
    val a = Files.createTempDirectory("lake").resolve("a").toString
    val b = Files.createTempDirectory("lake").resolve("b").toString
    val df = docs()
    LakeOps.writeSharded(df.repartition(1), a, Seq("source"), col("doc_id"), 50L)
    LakeOps.writeSharded(df.repartition(7), b, Seq("source"), col("doc_id"), 50L)
    // same (source -> sorted doc_id set per shard-file count) both times:
    // the shard assignment depends on content, not input layout
    def shape(dir: String): Map[String, Long] =
      spark.read.parquet(dir).groupBy($"source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shape(a) == shape(b))
    assert(spark.read.parquet(a).select($"doc_id")
      .except(spark.read.parquet(b).select($"doc_id")).isEmpty)
  }

  test("applyChanges: latest version wins, deletes drop, inserts and re-inserts land") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "v")
    val chg = Seq(
      (2L, "b2", 21L, 1L, "U"), // update ...
      (2L, "b3", 22L, 2L, "U"), // ... beaten by the later version
      (3L, "c", 30L, 1L, "D"),  // delete ...
      (3L, "c2", 31L, 2L, "U"), // ... then re-insert
      (4L, "d", 40L, 1L, "U"))  // plain insert (key absent from snapshot)
      .toDF("id", "name", "v", "seq", "op")
    val out = LakeOps.applyChanges(snap, chg, "id", "seq", "op")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b3", 22L), (3L, "c2", 31L),
      (4L, "d", 40L)))
  }

  test("applyChanges: delete-only winner removes a snapshot row") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "v")
    val chg = Seq((1L, "a", 10L, 5L, "D")).toDF("id", "name", "v", "seq", "op")
    val out = LakeOps.applyChanges(snap, chg, "id", "seq", "op")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }

  test("applyChanges: partitioning-invariant (1 vs 8 input partitions)") {
    val snap = (1L to 400L).map(i => (i, s"n$i", i * 10)).toDF("id", "name", "v")
    val chg = (1L to 600L).flatMap { i =>
      val op = if (i % 5 == 0) "D" else "U"
      val first = (i, s"u$i", i * 100, 1L, op)
      // every 3rd key gets a second, winning version
      if (i % 3 == 0) Seq(first, (i, s"w$i", i * 1000, 2L, "U")) else Seq(first)
    }.toDF("id", "name", "v", "seq", "op")
    def run(sp: Int, cp: Int) =
      LakeOps.applyChanges(snap.repartition(sp), chg.repartition(cp),
        "id", "seq", "op")
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val a = run(1, 1)
    val b = run(8, 3)
    assert(a == b)
    // spot-check semantics: key 5 deleted, key 3 at version 2, key 401
    // inserted (absent from snapshot), key 1 updated
    assert(!a.exists(_._1 == 5L))
    assert(a.find(_._1 == 3L).contains((3L, "w3", 3000L)))
    assert(a.find(_._1 == 401L).contains((401L, "u401", 40100L)))
    assert(a.find(_._1 == 1L).contains((1L, "u1", 100L)))
  }

  test("zoneMap skip is sound on ANY layout: pruned scan == full filter") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val key = round($"l_extendedprice" * 100).cast("long")
    def prunedEqualsFull(zone: org.apache.spark.sql.Column): Unit = {
      val zm = LakeOps.zoneMap(li, zone, "cents" -> key)
      val touched = LakeOps.touchedZones(zm, "cents", lit(2000000L), lit(2500000L))
      val pruned = li.filter(zone.isin(touched: _*) && key.between(2000000L, 2500000L))
      val full = li.filter(key.between(2000000L, 2500000L))
      assert(pruned.count() == full.count() && full.count() > 0)
      assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    }
    // a key-aligned layout AND an adversarial unrelated one both stay exact
    prunedEqualsFull(expr("CAST(l_extendedprice AS BIGINT) DIV 10000"))
    prunedEqualsFull(pmod(xxhash64($"l_orderkey"), lit(7)))
  }

  test("zoneMap on the hive partition key prunes DIRECTORIES (PartitionFilters)") {
    val out = Files.createTempDirectory("lake").resolve("zoned").toString
    LakeOps.writeSharded(docs(), out, Seq("lang"), col("doc_id"), 1000L)
    val back = spark.read.parquet(out)
    val zm = LakeOps.zoneMap(back, col("lang"), "len" -> col("n_chars"))
    // pick a range only SOME languages' envelopes intersect; fall back to
    // asserting soundness if the corpus makes every envelope overlap
    val touched = LakeOps.touchedZones(zm, "len", lit(0L), lit(60L))
    assert(touched.nonEmpty && touched.size < zm.count())
    val pruned = back.filter(col("lang").isin(touched: _*) &&
      col("n_chars").between(0L, 60L))
    val full = back.filter(col("n_chars").between(0L, 60L))
    assert(pruned.count() == full.count())
    // the zone isin lands in the scan's PartitionFilters — skipped
    // languages' directories are never opened
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"zone prune must be a partition filter:\n$plan")
  }

  test("zone envelopes: layout-aligned key skips, unclustered key cannot") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val zm = LakeOps.zoneMap(li, date_format($"l_shipdate", "yyyy-MM"),
      "ship" -> to_date($"l_shipdate"),
      "cents" -> round($"l_extendedprice" * 100).cast("long"))
    val total = zm.count()
    val shipTouched = LakeOps.touchedZones(zm, "ship",
      lit("1996-02-01").cast("date"), lit("1996-04-30").cast("date")).size
    val centsTouched = LakeOps.touchedZones(zm, "cents",
      lit(9000000L), lit(9100000L)).size
    // month zones bound the date key tightly (3 months + boundary zones)
    assert(shipTouched >= 1 && shipTouched <= 4, s"ship range should touch ~3 of $total zones")
    // the unclustered price key's envelopes span nearly everything
    assert(centsTouched > total / 2,
      s"price range touched $centsTouched of $total — expected no skipping")
  }

  test("planCompaction: bin bounds, oversized isolation, layout invariance") {
    val target = 30L
    val files = Seq(
      ("p1", "f1", 10L), ("p1", "f2", 25L), ("p1", "f3", 7L),
      ("p1", "f4", 3L), ("p1", "big", 120L),
      ("p2", "a", 50L), ("p2", "b", 1L))
      .toDF("part", "path", "bytes")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      LakeOps.planCompaction(df, "part", "path", "bytes", target)
        .select($"part", $"path", $"bytes", $"bin")
        .as[(String, String, Long, Long)].collect().toSet
    val plan = planOf(files)

    val bins = plan.groupBy(p => (p._1, p._4))
    bins.foreach { case ((part, bin), fs) =>
      val total = fs.toSeq.map(_._3).sum
      val maxF = fs.toSeq.map(_._3).max
      // cumulative packing: a bin never overshoots target by more than
      // one file
      assert(total < target + maxF || fs.size == 1,
        s"($part, bin $bin): $total exceeds $target + $maxF")
    }
    // at most one undersized bin per partition (the tail remainder)
    bins.keys.map(_._1).toSeq.distinct.foreach { part =>
      val small = bins.collect {
        case ((p, _), fs) if p == part && fs.toSeq.map(_._3).sum < target => fs
      }
      assert(small.size <= 1, s"$part has ${small.size} undersized bins")
    }
    // a file already >= target shares its bin with nobody
    plan.filter(_._3 >= target).foreach { case (part, path, _, bin) =>
      assert(bins((part, bin)).size == 1, s"$path should sit alone in $bin")
    }
    // deterministic under input layout: same plan from a 7-way shuffle
    assert(planOf(files.repartition(7)) == plan)
  }

  test("partitionFingerprints: drift flips the XOR; even-duplicate blind spot caught by count") {
    import spark.implicits._
    val snapA = Seq(
      ("s1", "a"), ("s1", "b"), ("s2", "c")).toDF("part", "txt")
    def fp(df: org.apache.spark.sql.DataFrame) =
      LakeOps.partitionFingerprints(df, xxhash64($"txt"), "part" -> $"part")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val a = fp(snapA)
    // identical snapshot in a different layout matches exactly
    assert(fp(snapA.repartition(5)) == a)
    // one changed row flips that partition's fingerprint, leaves the other
    val b = fp(Seq(("s1", "a"), ("s1", "B"), ("s2", "c")).toDF("part", "txt"))
    assert(b("s1") != a("s1") && b("s2") == a("s2"))
    // XOR blind spot: duplicating a row twice cancels the XOR — the row
    // count is what still differs (why the pair is the contract)
    val c = fp(Seq(("s1", "a"), ("s1", "b"), ("s1", "b"), ("s1", "b"),
      ("s2", "c")).toDF("part", "txt"))
    assert(c("s1")._2 == a("s1")._2 && c("s1")._1 != a("s1")._1)
  }

  test("eraseCascade: partition-granular rewrite, untouched bytes identical, residual 0") {
    import java.security.MessageDigest
    val root = Files.createTempDirectory("erase").toString

    // users partitioned by region; events partitioned by day.
    // region "r9" holds ONLY doomed users -> its directory must vanish;
    // region "r2" holds none -> its files must stay byte-identical.
    val users = Seq(
      (1L, "r1"), (2L, "r1"), (3L, "r1"),
      (4L, "r2"), (5L, "r2"),
      (6L, "r9"), (7L, "r9"))
      .toDF("user_id", "region")
    val events = Seq(
      (10L, 1L, "d1"), (11L, 2L, "d1"), (12L, 4L, "d1"),
      (13L, 6L, "d2"), (14L, 7L, "d2"),
      (15L, 4L, "d3"), (16L, 5L, "d3"))
      .toDF("event_id", "user_id", "day")
    users.write.partitionBy("region").parquet(s"$root/users")
    events.write.partitionBy("day").parquet(s"$root/events")

    def dirHash(dir: String): Seq[(String, String)] = {
      val d = new java.io.File(dir)
      d.listFiles().toSeq.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map { f =>
          val md = MessageDigest.getInstance("SHA-256")
          (f.getName, md.digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map(b => f"$b%02x").mkString)
        }
    }
    val r2Before = dirHash(s"$root/users/region=r2")
    val d3Before = dirHash(s"$root/events/day=d3")

    // cascade: doomed users 3, 6, 7 -> derived doomed events
    val doomed = Seq(3L, 6L, 7L).toDF("user_id")
    val audit = LakeOps.eraseCascade(Seq(
      LakeOps.ErasureStep("users", s"$root/users", "region", "user_id", doomed),
      LakeOps.ErasureStep("events", s"$root/events", "day", "user_id", doomed)))
      .collect().map(r => r.getString(0) -> r).toMap

    // audit: counts and zero residual per table
    assert(audit("users").getLong(1) == 7 && audit("users").getLong(2) == 4)
    assert(audit("users").getLong(3) == 3 && audit("users").getLong(4) == 0)
    assert(audit("users").getLong(5) == 2, "touched r1 and r9 only")
    assert(audit("events").getLong(1) == 7 && audit("events").getLong(2) == 5)
    assert(audit("events").getLong(3) == 2 && audit("events").getLong(4) == 0)
    assert(audit("events").getLong(5) == 1, "touched day=d2 only")

    // erased keys truly absent from the files on disk
    val usersAfter = spark.read.parquet(s"$root/users")
    assert(usersAfter.filter(col("user_id").isin(3L, 6L, 7L)).count() == 0)
    assert(usersAfter.count() == 4)
    val eventsAfter = spark.read.parquet(s"$root/events")
    assert(eventsAfter.filter(col("user_id").isin(3L, 6L, 7L)).count() == 0)

    // fully-doomed partition directory is gone (the replaceWhere edge)
    assert(!new java.io.File(s"$root/users/region=r9").exists())
    // untouched partitions: byte-identical files, not rewritten copies
    assert(dirHash(s"$root/users/region=r2") == r2Before)
    assert(dirHash(s"$root/events/day=d3") == d3Before)
    // touched partition was genuinely rewritten
    assert(spark.read.parquet(s"$root/users/region=r1")
      .select("user_id").as[Long].collect().toSet == Set(1L, 2L))

    // a second pass is a no-op: nothing touched, counts stable
    val again = LakeOps.eraseCascade(Seq(
      LakeOps.ErasureStep("users", s"$root/users", "region", "user_id", doomed)))
      .collect().head
    assert(again.getLong(3) == 0 && again.getLong(5) == 0)
  }

  test("eraseCascade: two-level (year, site) lake, escaped values, parent pruning") {
    import java.security.MessageDigest
    val root = Files.createTempDirectory("erase2").toString

    // two partition levels; site values include characters Spark/Hive
    // %-escape in directory names (':' and space) — the delete path must
    // resolve the directory Spark actually wrote, not the raw string
    val docs = Seq(
      (1L, 2019, "a:b"), (2L, 2019, "a:b"),      // whole year doomed
      (3L, 2020, "a:b"),                          // fully-doomed leaf
      (4L, 2020, "plain"), (5L, 2020, "plain"),   // partially doomed
      (6L, 2020, "with space"),                   // untouched
      (7L, 2021, "plain"))                        // untouched
      .toDF("doc_id", "year", "site")
    docs.write.partitionBy("year", "site").parquet(s"$root/docs")

    def dirHash(dir: String): Seq[(String, String)] = {
      val d = new java.io.File(dir)
      d.listFiles().toSeq.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map { f =>
          val md = MessageDigest.getInstance("SHA-256")
          (f.getName, md.digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map(b => f"$b%02x").mkString)
        }
    }
    // escaped leaf directories as Spark wrote them
    assert(new java.io.File(s"$root/docs/year=2020/site=a%3Ab").exists())
    assert(new java.io.File(s"$root/docs/year=2020/site=with space").exists())
    val untouchedBefore = dirHash(s"$root/docs/year=2020/site=with space")
    val untouched2Before = dirHash(s"$root/docs/year=2021/site=plain")

    val doomed = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val audit = LakeOps.eraseCascade(Seq(LakeOps.ErasureStep(
      "docs", s"$root/docs", Seq("year", "site"), "doc_id", doomed)))
      .collect().head
    assert(audit.getLong(1) == 7 && audit.getLong(2) == 3)
    assert(audit.getLong(3) == 4 && audit.getLong(4) == 0)
    assert(audit.getLong(5) == 3, "touched (2019,a:b), (2020,a:b), (2020,plain)")
    assert(audit.getLong(6) == 5, "five composite leaves total")

    // fully-doomed ESCAPED leaf is gone
    assert(!new java.io.File(s"$root/docs/year=2020/site=a%3Ab").exists())
    // whole-year-doomed: leaf gone AND the now-empty year level pruned
    assert(!new java.io.File(s"$root/docs/year=2019").exists())
    // untouched leaves byte-identical (space is NOT in the escape set)
    assert(dirHash(s"$root/docs/year=2020/site=with space") == untouchedBefore)
    assert(dirHash(s"$root/docs/year=2021/site=plain") == untouched2Before)
    // partially-doomed leaf rewritten correctly
    assert(spark.read.parquet(s"$root/docs")
      .select("doc_id").as[Long].collect().toSet == Set(5L, 6L, 7L))
  }

  // reference splitmix64 — the same chain BloomBitPos generates
  private def refMix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def refPos(key: Long, j: Int, m: Int): Int =
    ((refMix(key * 2654435761L + j) >>> 1) % m).toInt

  test("bloomPartitionIndex: packed words equal a reference bitset") {
    val m = 256; val k = 3
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (1000000007L, "b"))
      .toDF("key", "part")
    val idx = LakeOps.bloomPartitionIndex(df, $"part", $"key", m, k)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val expected = scala.collection.mutable.Map.empty[(String, Long), Long]
    for ((key, part) <- Seq((1L, "a"), (2L, "a"), (3L, "b"), (1000000007L, "b"));
         j <- 0 until k) {
      val pos = refPos(key, j, m)
      val wk = (part, pos / 64L)
      expected(wk) = expected.getOrElse(wk, 0L) | (1L << (pos % 64))
    }
    assert(idx == expected.toMap)
  }

  test("bloomPointLookup: no false negatives, absent keys prune to zero") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // 100 live keys + 100 absent at any scale (testdata orderkeys are
    // dense from 0, so "absent" must come from far outside the keyspace)
    val probeKeys =
      (1L until 101L) ++ (1000000000001L until 1000000000101L)
    val out = LakeOps.bloomPointLookup(
      orders,
      partCol = expr("year(o_orderdate) * 12 + month(o_orderdate)"),
      keyCol = col("o_orderkey"),
      probes = probeKeys.toDF("probe"),
      probeCol = col("probe"),
      mBits = 65536, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val truth = orders
      .select(col("o_orderkey").cast("long"),
        expr("year(o_orderdate) * 12 + month(o_orderdate)").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truthByKey = truth.groupBy(_._1)
    val nParts = truth.map(_._2).distinct.length.toLong

    assert(out.size == 200)
    for (p <- probeKeys) {
      val (nCand, nTrue, nRows, nTotal) = out(p)
      val t = truthByKey.getOrElse(p, Array.empty)
      assert(nTotal == nParts)
      // soundness: every partition truly holding the key is admitted
      assert(nTrue == t.map(_._2).distinct.length.toLong)
      assert(nRows == t.length.toLong)
      assert(nCand >= nTrue, s"false negative for probe $p")
    }
    // the index actually skips: absent probes admit (almost) nothing.
    // 65536 bits vs ~15-40 keys/partition => fpp ~ 1e-8; >0 would mean
    // the filter is saturated or the hash family degenerate
    val absent = probeKeys.filter(p => !truthByKey.contains(p))
    assert(absent.size >= 100)
    assert(absent.map(p => out(p)._1).sum == 0L,
      "absent keys must prune every partition at this m/n ratio")
  }

  test("mergeBloomIndexes: incremental ingest equals a full rebuild") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val part = expr("year(o_orderdate) * 12 + month(o_orderdate)")
    def idx(d: org.apache.spark.sql.DataFrame) =
      LakeOps.bloomPartitionIndex(d, part, col("o_orderkey"), 4096, 3)
    val old = df.filter($"o_orderkey" % 3 =!= 0)
    val delta = df.filter($"o_orderkey" % 3 === 0)
    val merged = LakeOps.mergeBloomIndexes(idx(old), idx(delta))
      .collect().map(r => (r.get(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = idx(df)
      .collect().map(r => (r.get(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
  }

  test("bloom candidates on the hive partition key prune DIRECTORIES") {
    val out = Files.createTempDirectory("lake").resolve("bloomed").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("m", expr("year(o_orderdate) * 12 + month(o_orderdate)"))
      .write.partitionBy("m").parquet(out)
    val back = spark.read.parquet(out)
    val index = LakeOps.bloomPartitionIndex(
      back, col("m"), col("o_orderkey"), 65536, 3)
    val probeKey = 7L
    val cands = LakeOps.bloomCandidates(
        index, spark.range(probeKey, probeKey + 1).toDF("p"), col("p"),
        65536, 3)
      .select("part").collect().map(_.get(0)).toSeq
    assert(cands.size == 1, s"one live key should admit one month: $cands")
    val pruned = back.filter(col("m").isin(cands: _*) &&
      col("o_orderkey") === probeKey)
    assert(pruned.count() ==
      back.filter(col("o_orderkey") === probeKey).count())
    // the candidate isin lands in the scan's PartitionFilters — the 79
    // other month directories are never opened
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("m#"),
      s"bloom prune must be a partition filter:\n$plan")
  }

  test("rendezvousShard: consistent placement when a shard is added") {
    import spark.implicits._
    val keys = spark.range(0, 4000).toDF("k")
    val rows = keys.select(
      col("k"),
      LakeOps.rendezvousShard(col("k"), 8).as("s8"),
      LakeOps.rendezvousShard(col("k"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))

    // range discipline
    assert(rows.forall { case (_, s8, s9) => s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9 })

    // THE HRW law: growing 8 -> 9 only ever moves keys TO the new shard —
    // the argmax over the old scores is untouched unless shard 8 wins
    val moved = rows.filter { case (_, s8, s9) => s8 != s9 }
    assert(moved.forall(_._3 == 8),
      s"moved keys must land on the new shard: ${moved.take(5).mkString(",")}")

    // expected move fraction 1/9 of 4000 ~ 444; generous 2x bounds
    assert(moved.length > 222 && moved.length < 889,
      s"move fraction should be ~1/9, moved ${moved.length}/4000")

    // balance: every shard owns a non-trivial slice under both layouts
    val by8 = rows.groupBy(_._2).map(_._2.size)
    val by9 = rows.groupBy(_._3).map(_._2.size)
    assert(by8.size == 8 && by8.min > 4000 / 8 / 2)
    assert(by9.size == 9 && by9.min > 4000 / 9 / 2)
  }

  test("applyPositionDeletes: tombstoned rows drop; dupes and no-ops are inert") {
    val data = (0L until 40L).map(i => (i % 4, i / 4, s"p$i"))
      .toDF("file", "pos", "payload")
    val dels = Seq((0L, 0L), (0L, 0L), (1L, 2L), (7L, 99L), (0L, 1000L))
      .toDF("file", "pos") // dup of (0,0); (7,99)/(0,1000) hit nothing
    val out = LakeOps.applyPositionDeletes(data, dels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!out.contains((0L, 0L)) && !out.contains((1L, 2L)))
    assert(out.size == 38) // exactly the two real tombstones dropped
    // the delete side must plan as a broadcast join, never a shuffle
    val plan = LakeOps.applyPositionDeletes(data, dels)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan)
  }

  test("applyEqualityDeletes: strictly-lower seq dies, re-insert survives") {
    // key k1: rows at seq 1 and 3; delete at seq 3 -> seq-1 row dies,
    // the seq-3 re-insert SURVIVES (>= semantics). k2 untouched.
    val data = Seq(("k1", 1L, "old"), ("k1", 3L, "reinserted"),
      ("k2", 1L, "other")).toDF("k", "data_seq", "v")
    val dels = Seq(("k1", 2L), ("k1", 3L)).toDF("k", "del_seq")
    val out = LakeOps.applyEqualityDeletes(
      data, dels, Seq("k"), "data_seq", "del_seq")
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set(("k1", "reinserted"), ("k2", "other")))
  }

  test("liveFilesAt / snapshotRead: add, remove, re-add resolve per version") {
    val manifest = Seq(
      (1L, "add", "a"), (1L, "add", "b"),
      (2L, "remove", "a"),
      (3L, "add", "c"), (3L, "add", "a")).toDF("snapshot_id", "op", "file")
    def live(v: Long) = LakeOps.liveFilesAt(manifest, v)
      .collect().map(_.getString(0)).toSet
    assert(live(1L) == Set("a", "b"))
    assert(live(2L) == Set("b"))
    assert(live(3L) == Set("a", "b", "c"))
    val data = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("z", 5))
      .toDF("file", "x")
    val at2 = LakeOps.snapshotRead(data, manifest, 2L)
      .collect().map(_.getInt(1)).toSet
    assert(at2 == Set(3)) // only file b is live; unknown file z never reads
    val at3 = LakeOps.snapshotRead(data, manifest, 3L)
      .collect().map(_.getInt(1)).toSet
    assert(at3 == Set(1, 2, 3, 4))
  }
}
