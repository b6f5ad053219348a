package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageOps

/** Lake-layout sinks: writing a processed corpus OUT is as much a part of
  * the 100 TB pipeline as reading it in. The failure mode at scale is not
  * correctness but layout: one file per task gives millions of small files
  * (name-node pressure, slow listings, tiny row groups), while a blind
  * `coalesce(1)` serializes the write. The fix is explicit file sizing:
  * decide files-per-partition up front, spread the write with one
  * hash-keyed shuffle, and let `maxRecordsPerFile` enforce the per-file
  * cap exactly.
  */
object LakeOps {

  /** Write `df` as a hive-partitioned parquet dataset with SIZED files:
    * every output file holds at most `targetRowsPerFile` rows (enforced by
    * the writer's `maxRecordsPerFile`, a hard cap), and each partition
    * value is spread over `ceil(rows / targetRowsPerFile)` shards by a
    * deterministic hash of `shardKey` (content-keyed, so the layout is
    * reproducible and clustered input order cannot skew a writer task).
    *
    * Plan shape: one small count-by-partition aggregate (bounded by the
    * number of distinct partition values — broadcast-small by the same
    * argument as any dimension table; it becomes a row-local chained
    * literal, never a join), then ONE shuffle of the corpus on
    * (partitionCols, shard). No global sort, no driver-side row movement.
    *
    * Returns the layout plan (partition value -> shard count) so callers
    * and tests can audit file sizing without listing the filesystem.
    */
  /** The file-sizing plan as a frame: one row per distinct partition
    * value with its row count and `ceil(rows / targetRowsPerFile)` file
    * count (exact integer arithmetic — SQL-oracle-able, q_lake_layout).
    */
  def layoutPlan(
      df: DataFrame,
      partitionCols: Seq[String],
      targetRowsPerFile: Long): DataFrame = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be >= 1")
    df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("n_files",
        expr(s"(n_rows + ${targetRowsPerFile - 1}) div $targetRowsPerFile"))
  }

  def writeSharded(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      shardKey: Column,
      targetRowsPerFile: Long,
      mode: SaveMode = SaveMode.ErrorIfExists): Map[Seq[String], Int] = {
    val pcols = partitionCols.map(col)
    // small: one row per distinct partition value
    val counts = layoutPlan(df, partitionCols, targetRowsPerFile).collect()
    val plan: Map[Seq[String], Int] = counts.map { r =>
      val key = partitionCols.indices.map(i => String.valueOf(r.get(i)))
      key -> r.getAs[Number]("n_files").intValue()
    }.toMap
    val nShards: Column = plan.foldLeft(lit(1)) { case (acc, (key, files)) =>
      val matches = partitionCols.zip(key).map { case (c, v) =>
        col(c).cast("string") <=> lit(v)
      }.reduce(_ && _)
      when(matches, lit(files)).otherwise(acc)
    }
    df.withColumn("__shard", pmod(xxhash64(shardKey), nShards))
      .repartition((pcols :+ col("__shard")): _*)
      .drop("__shard")
      .write
      .partitionBy(partitionCols: _*)
      // the hard cap: hash imbalance or task-hash collisions can place
      // more than targetRowsPerFile rows in one (task, dir) pair; the
      // writer then rolls the file, so NO file ever exceeds the target
      .option("maxRecordsPerFile", targetRowsPerFile)
      .mode(mode)
      .parquet(path)
    plan
  }

  /** Zone map (file/partition-level min-max statistics — the data-skipping
    * index behind parquet row-group pruning, Delta/Iceberg file stats and
    * OPTIMIZE ZORDER): one row per `zone` with its row count and the
    * [min, max] envelope of each key column. One map-side-combined
    * aggregate — the output is layout-sized (one row per zone), never
    * corpus-sized, so a 100 TB table's zone map is a driver-small frame.
    *
    * Columns: `zone, n_rows, min_<k>, max_<k>` per key `(k, expr)`.
    * Pair with [[PrepOps.zorderKey]]: a Z-ordered layout makes BOTH
    * dimensions' envelopes tight, a range-clustered layout only its own.
    */
  def zoneMap(df: DataFrame, zone: Column, keys: (String, Column)*): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val aggs = count(lit(1)).as("n_rows") +: keys.flatMap { case (n, c) =>
      Seq(min(c).as(s"min_$n"), max(c).as(s"max_$n"))
    }
    df.groupBy(zone.as("zone")).agg(aggs.head, aggs.tail: _*)
  }

  /** 1 iff the zone's `[min_<key>, max_<key>]` envelope intersects
    * `[lo, hi]` — the skip predicate: a zone scoring 0 provably holds no
    * matching row and is never read.
    */
  def zoneTouched(keyName: String, lo: Column, hi: Column): Column =
    (col(s"max_$keyName") >= lo && col(s"min_$keyName") <= hi).cast("int")

  /** The zones a range predicate must read (driver-small, like any file
    * listing). Callers skip the rest:
    * `df.filter(zoneExpr.isin(touched: _*) && keyExpr.between(lo, hi))` —
    * and when the zone column is the hive partition key of a
    * [[writeSharded]] dataset, the `isin` becomes directory-level
    * `PartitionFilters` (never opens a skipped file; pinned in
    * LakeOpsSpec).
    */
  def touchedZones(
      zm: DataFrame, keyName: String, lo: Column, hi: Column): Seq[Any] =
    zm.filter(zoneTouched(keyName, lo, hi) === 1)
      .select(col("zone")).collect().map(_.get(0)).toSeq

  /** Per-partition Bloom-filter index — the point-lookup data-skipping
    * complement to [[zoneMap]] (Delta/Iceberg `bloomFilterIndex`): zone
    * maps prune RANGE predicates on clustered keys; a Bloom index prunes
    * EQUALITY probes on high-cardinality keys the layout is NOT sorted by,
    * where every zone's [min, max] envelope spans the whole keyspace.
    *
    * One row per (partition, 64-bit word): `k` bit positions per key from
    * the oracle-replayable splitmix64 family ([[graft.expr.BloomBitPos]]),
    * packed by a single map-side-combined `bit_or` aggregate. The output
    * is layout-sized (|partitions| x mBits/64 rows), never corpus-sized —
    * a 100 TB table's index is a broadcastable frame, and the build is one
    * scan with no row shuffle (only k x distinct-words-per-task partial
    * rows reach the exchange).
    *
    * Size `mBits` to the per-partition key count (~10 bits/key for ~1%
    * fpp at k=3); an undersized filter saturates and prunes nothing —
    * correct, just useless, exactly like a production Bloom index.
    */
  def bloomPartitionIndex(
      df: DataFrame, partCol: Column, keyCol: Column,
      mBits: Int = 65536, k: Int = 3): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val positions = (0 until k).map(j =>
      graft.expr.BloomExprs.bitPos(keyCol.cast("long"), j, mBits))
    df.select(partCol.as("part"), explode(array(positions: _*)).as("bitpos"))
      .select(col("part"), expr("bitpos DIV 64").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), bitpos % 64)").as("mask"))
      .groupBy("part", "word_idx")
      .agg(expr("bit_or(mask)").as("word"))
  }

  /** Incremental index maintenance: fold freshly-ingested partitions'
    * word rows into an existing index without touching the rest — Bloom
    * bitsets are an OR-monoid, so append-only ingest never rebuilds
    * history (`bit_or` of the union; both frames are layout-sized). An
    * overwritten partition must instead be dropped from `index` before
    * merging (bits cannot be unset), same as any destructive lake op.
    */
  def mergeBloomIndexes(index: DataFrame, delta: DataFrame): DataFrame =
    index.unionByName(delta)
      .groupBy("part", "word_idx")
      .agg(expr("bit_or(word)").as("word"))

  /** The partitions a batch of equality probes must read: a probe passes a
    * partition iff ALL `k` of its bits are set in that partition's filter.
    * `index` and `probes` are both metadata-sized, so the whole decision
    * is a broadcast join — no corpus scan. No false negatives ever; false
    * positives at the filter's fpp. Returns `(probe, part)`.
    */
  def bloomCandidates(
      index: DataFrame, probes: DataFrame, probeCol: Column,
      mBits: Int, k: Int): DataFrame = {
    val positions = (0 until k).map(j =>
      graft.expr.BloomExprs.bitPos(col("probe"), j, mBits))
    val probeBits = probes.select(probeCol.cast("long").as("probe"))
      .select(col("probe"),
        posexplode(array(positions: _*)).as(Seq("j", "bitpos")))
      .select(col("probe"), col("j"),
        expr("bitpos DIV 64").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), bitpos % 64)").as("mask"))
    probeBits
      .join(broadcast(index), "word_idx")
      .where(col("word").bitwiseAND(col("mask")) === col("mask"))
      // count(distinct j), not count(*): two hashes of one probe may land
      // in the same (word, mask) — each j still joins its own row, and a
      // missing bit drops exactly the j rows that need it
      .groupBy(col("probe"), col("part"))
      .agg(countDistinct(col("j")).as("n_bits_hit"))
      .where(col("n_bits_hit") === k)
      .select("probe", "part")
  }

  /** End-to-end point lookup THROUGH the index: build, prune, then scan
    * only candidate partitions. Per probe: how many partitions the Bloom
    * admitted, how many truly hold the key, and the exact row count —
    * with `n_parts_total` alongside so the skip ratio is read directly
    * off the result. Absent keys appear with zeros (the
    * definitely-absent path: 0 candidates -> 0 partitions opened).
    */
  def bloomPointLookup(
      data: DataFrame, partCol: Column, keyCol: Column,
      probes: DataFrame, probeCol: Column,
      mBits: Int = 65536, k: Int = 3): DataFrame = {
    val index = bloomPartitionIndex(data, partCol, keyCol, mBits, k)
    val cand = bloomCandidates(index, probes, probeCol, mBits, k)
    val hits = data
      .select(partCol.as("d_part"), keyCol.cast("long").as("d_key"))
      .join(broadcast(cand),
        col("d_part") === col("part") && col("d_key") === col("probe"))
      .groupBy(col("probe").as("h_probe"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("d_part")).as("n_true_parts"))
    val candCounts = cand.groupBy(col("probe").as("c_probe"))
      .agg(count(lit(1)).as("n_candidate_parts"))
    val nParts = index.select("part").distinct()
      .agg(count(lit(1)).as("n_parts_total"))
    probes.select(probeCol.cast("long").as("probe_key"))
      // both sides are probe-bounded frames — broadcast at plan time
      .join(broadcast(candCounts), col("probe_key") === col("c_probe"), "left")
      .join(broadcast(hits), col("probe_key") === col("h_probe"), "left")
      .crossJoin(broadcast(nParts)) // 1-row frame
      .select(col("probe_key"),
        coalesce(col("n_candidate_parts"), lit(0L)).as("n_candidate_parts"),
        coalesce(col("n_true_parts"), lit(0L)).as("n_true_parts"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        col("n_parts_total"))
  }

  /** Small-file compaction plan (the lakehouse OPTIMIZE bin-pack):
    * assign existing files to merge bins of ~`targetBytes` within each
    * partition. Input is a file listing `(partCol, pathCol, bytesCol)` —
    * metadata-sized, like any lake file index, never the corpus itself.
    *
    * Deterministic sorted cumulative packing: files order by
    * (bytes DESC, path) within the partition and `bin = floor(cumulative
    * bytes before this file / targetBytes)` — each bin holds at least
    * `targetBytes` of input except the last (so no bin is needlessly
    * small), a bin overshoots by at most one file, and a file already
    * >= targetBytes lands alone. The same plan on the same listing is
    * byte-identical on any cluster layout (exact long arithmetic, total
    * order), so a planner and an executor can run on different days.
    *
    * Scale shape: ONE partition-keyed window over the metadata frame —
    * partitions parallelize; per-partition file counts are listing-sized.
    * [[writeSharded]] is the rewrite executor for the planned bins.
    */
  def planCompaction(
      files: DataFrame,
      partCol: String,
      pathCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol))
      .orderBy(col(bytesCol).desc, col(pathCol))
    files
      .withColumn("__cum", sum(col(bytesCol)).over(w))
      .withColumn("bin",
        expr(s"(__cum - $bytesCol) div $targetBytes").cast("long"))
      .drop("__cum")
  }

  /** CDC merge ("MERGE INTO" / upsert-apply — the lakehouse write path's
    * logical core): apply a changelog onto a snapshot. `changes` carries
    * the snapshot's columns plus `opCol` ('U' upsert, 'D' delete) and a
    * monotone `seqCol` (`>= 0`; (key, seq) unique, as in any CDC log). The
    * per-key winner is the highest-seq row — snapshot rows participate
    * with seq = Long.MinValue so any change beats them — and delete
    * winners drop out.
    *
    * Plan shape: NO join. Snapshot and changelog union and ride ONE hash
    * shuffle on the key with a map-side partial `max_by`. The textbook
    * full-outer-join formulation shuffles both sides AND builds per-key
    * join state; this is the same single Exchange with constant-size agg
    * state per key, and it extends to multi-version changelogs for free.
    */
  /** Per-partition content fingerprints — rsync-style drift detection for
    * a lake: two snapshots of a partition match iff (n_rows, fp_xor)
    * match, so a 100 TB sync/audit pass compares one tiny frame per side
    * instead of re-reading either lake. XOR is the right fold here: it is
    * commutative/associative (layout- and merge-order-proof), needs no
    * overflow handling (unlike an ANSI int64 sum), and any single-row
    * change flips the aggregate with probability 1 - 2^-64. Known XOR
    * blind spot: an EVEN number of byte-identical duplicate rows cancels
    * itself — which the row count catches, hence the pair.
    *
    * `contentHash` should be an engine-portable row hash (e.g.
    * [[TextOps.fingerprint]]) when the result is compared across engines;
    * any deterministic 64-bit hash works within one engine.
    *
    * Output: (partition value(s), n_rows, fp_xor) via ONE
    * map-side-combined aggregate.
    */
  def partitionFingerprints(
      df: DataFrame,
      contentHash: Column,
      partCols: (String, Column)*): DataFrame = {
    require(partCols.nonEmpty, "partitionFingerprints needs >= 1 partition column")
    df.groupBy(partCols.map { case (n, c) => c.as(n) }: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        bit_xor(contentHash).as("fp_xor"))
  }

  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val payload = snapshot.columns.filter(_ != keyCol).toSeq
    val snap = snapshot.select(
      col(keyCol) +: payload.map(col)
        :+ lit(Long.MinValue).as(seqCol) :+ lit("U").as(opCol): _*)
    val chg = changes.select(
      col(keyCol) +: payload.map(col)
        :+ col(seqCol).cast("long") :+ col(opCol): _*)
    snap.unionByName(chg)
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(payload.map(col) :+ col(opCol): _*), col(seqCol)).as("__w"))
      .filter(col(s"__w.$opCol") =!= "D")
      .select(col(keyCol) +: payload.map(p => col(s"__w.$p").as(p)): _*)
  }

  /** Persist `df` as a BUCKETED parquet table: `nBuckets` hash buckets on
    * `keys`, each bucket sorted on the same keys, registered in the
    * session catalog under `table` (dropped first, so re-runs are
    * idempotent).
    *
    * Bucketing is the lake-side answer to the repeated-join shuffle: two
    * tables bucketed on the same keys with the same bucket count report
    * `HashPartitioning(keys, n)` straight from the SCAN, so every later
    * join or aggregation on those keys plans with ZERO Exchange on the
    * bucketed side — the shuffle is paid ONCE at write time and amortized
    * over every downstream query. At 100 TB this is the difference
    * between re-shuffling the fact table per query and never shuffling
    * it again (BucketJoinSpec pins the Exchange-free plan).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      nBuckets: Int): Unit = {
    require(keys.nonEmpty, "writeBucketed needs >= 1 bucket key")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // Unqualified identifiers only: for `db.tbl` the managed location is
    // <warehouse>/db.db/tbl, so the <warehouse>/<table> cleanup below
    // would miss it AND could recursively delete a path this helper
    // never wrote. Cheaper to reject than to half-support.
    require(
      table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"writeBucketed takes an unqualified table identifier, got '$table'")
    val s = df.sparkSession
    // If a previous run's table still exists, clear its ACTUAL location
    // (resolved via the catalog, never guessed) before dropping.
    val staleLoc: Option[org.apache.hadoop.fs.Path] =
      if (s.catalog.tableExists(table))
        scala.util.Try(new org.apache.hadoop.fs.Path(
          new java.net.URI(s.sql(s"DESCRIBE TABLE EXTENDED $table")
            .filter(col("col_name") === "Location")
            .select("data_type").head().getString(0)))).toOption
      else None
    s.sql(s"DROP TABLE IF EXISTS $table")
    // The in-memory catalog dies with the session but the managed-table
    // DIRECTORY survives in the warehouse — a fresh session's DROP is a
    // no-op and CTAS then refuses the non-empty location. Clear the
    // managed path for this (unqualified, validated) identifier.
    val loc = staleLoc.getOrElse(new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT)))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) {
      s.sparkContext.setJobDescription(s"writeBucketed: clearing stale $loc")
      fs.delete(loc, true)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** [[writeBucketed]], skipped when `table` is already registered in THIS
    * session's catalog — the write-once-join-many usage: callers key the
    * table name to the immutable source (q_bucket_join suffixes the input
    * directory's hash), so a registered table is known-current and every
    * later query pays only the shuffle-free read. A fresh session always
    * rebuilds (the in-memory catalog dies with it).
    */
  def writeBucketedIfAbsent(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      nBuckets: Int): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, keys, nBuckets)

  /** One table of an erasure cascade: the hive-partitioned parquet
    * dataset at `path` (one or more partition levels, e.g.
    * `Seq("year", "month")` for `year=2020/month=03/...` layouts), the
    * column that joins it to the delete-key frame, and a display name
    * for the audit.
    */
  final case class ErasureStep(
      name: String,
      path: String,
      partitionCols: Seq[String],
      keyCol: String,
      keys: DataFrame)

  object ErasureStep {
    /** Single-level convenience form (the common date- or
      * region-partitioned lake).
      */
    def apply(
        name: String,
        path: String,
        partitionCol: String,
        keyCol: String,
        keys: DataFrame): ErasureStep =
      ErasureStep(name, path, Seq(partitionCol), keyCol, keys)
  }

  /** Right-to-be-forgotten erasure as a real STORAGE operation: for each
    * step, rewrite ONLY the partitions that contain doomed rows
    * (replaceWhere-style), leave every other partition's files untouched
    * byte for byte, and return the audit frame regulators ask for —
    * per-table before/after/erased counts, touched-partition counts, and
    * a residual that MUST be zero (recounted from the files actually on
    * disk, not from the plan that wrote them).
    *
    * Why partition-granular: a naive "filter and rewrite the table"
    * rewrites 100 TB to delete a few thousand users. Here each table
    * pays (1) one semi-join to find touched partitions (collected —
    * bounded by the partition count, the same driver bound as any
    * partition listing), (2) one anti-join rewrite of ONLY those
    * partitions via dynamic partition overwrite, (3) one semi-join
    * recount for the residual. Partitions whose every row is doomed
    * produce no output rows — dynamic overwrite would silently leave
    * their old files in place, so their directories are deleted
    * explicitly (the classic replaceWhere edge case).
    *
    * The touched-partition slice is eagerly materialized
    * (`localCheckpoint`) before the overwrite: Spark (correctly) refuses
    * plans that overwrite a path they are still reading from; the
    * checkpoint bounds memory by the touched partitions' size — the
    * point of partition-granular erasure is that this is small.
    *
    * Cascades compose by key derivation at the call site (delete-list ->
    * fact-derived child keys), exactly like `q_erasure`'s report-only
    * form; [[LakeOpsSpec]] drives the customer->orders-style cascade on
    * a temp lake and pins untouched-partition byte-identity.
    */
  def eraseCascade(steps: Seq[ErasureStep]): DataFrame = {
    require(steps.nonEmpty, "eraseCascade needs >= 1 step")
    steps.map(eraseTable).reduce(_.unionByName(_))
  }

  private def eraseTable(step: ErasureStep): DataFrame = {
    val spark = step.keys.sparkSession
    import spark.implicits._
    val pcols = step.partitionCols
    require(pcols.nonEmpty, s"${step.name}: >= 1 partition column required")
    // delete-lists are SETS: dedup so the outer-join audit below cannot
    // double-count rows against a repeated key
    val keyFrame = step.keys.select(step.keys.columns.head).toDF("__dk")
      .distinct()
    val before = spark.read.parquet(step.path)
    pcols.foreach(c => require(before.columns.contains(c),
      s"${step.name}: partition column $c missing"))
    require(before.columns.contains(step.keyCol),
      s"${step.name}: key column ${step.keyCol} missing")

    // (1) ONE audit pass: per-partition (rows, doomed rows), grouped by
    // the FULL partition-column sequence (composite leaves for
    // multi-level lakes). Everything the pre-image audit needs — total
    // rows, partition count, touched partitions — falls out of this
    // partition-sized frame; a naive formulation (count + distinct +
    // semi-join) scans the lake three times for the same numbers.
    val k = pcols.length
    val preAudit = before
      .join(keyFrame, col(step.keyCol) === col("__dk"), "left_outer")
      .groupBy(pcols.map(col): _*)
      .agg(count(lit(1)).as("__n"), count(col("__dk")).as("__doomed"))
      .collect()
    val nBefore = preAudit.map(_.getLong(k)).sum
    val nPartsTotal = preAudit.length.toLong
    // touched partitions as composite value tuples, in partitionCols order
    val touched: Array[List[Any]] =
      preAudit.filter(_.getLong(k + 1) > 0).map(r => (0 until k).map(r.get).toList)
    require(!touched.exists(_.contains(null)),
      s"${step.name}: NULL ${pcols.mkString("/")} partition cannot be " +
        "rewritten partition-granularly (no directory to replace); " +
        "repartition the lake or erase it with a full rewrite")

    // one composite leaf = the conjunction of its level equalities; the
    // touched set = the disjunction (bounded by the partition count,
    // same driver bound as any partition listing)
    def leafPredicate(vals: Seq[Any]) =
      pcols.zip(vals).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)

    var nErased = 0L
    if (touched.nonEmpty) {
      // (2) rewrite only the touched partitions, minus doomed rows.
      // Eager checkpoint: breaks the read-the-path-being-overwritten
      // cycle and bounds the rewrite to touched-partition bytes.
      val slice = before
        .filter(touched.map(leafPredicate).reduce(_ || _))
        .join(keyFrame, col(step.keyCol) === col("__dk"), "left_anti")
        .cutLineage()
      // touched-partition row count comes from the pre-audit frame —
      // no extra scan; the checkpointed slice's count is block-local
      val sliceBefore = preAudit.filter(_.getLong(k + 1) > 0)
        .map(_.getLong(k)).sum
      nErased = sliceBefore - slice.count()
      val prevMode =
        spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        slice.write.mode(SaveMode.Overwrite)
          .partitionBy(pcols: _*).parquet(step.path)
      finally prevMode match {
        case Some(m) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // fully-erased partitions wrote no rows -> dynamic overwrite left
      // their directories alone; remove them explicitly. Directory names
      // use Spark's own partition-path escaping
      // (ExternalCatalogUtils.getPartitionPathString — space, ':', '%',
      // ... are %-encoded in Hive layouts), so values with special
      // characters resolve to the directory Spark actually wrote, and
      // emptied parent levels are pruned once their last child goes.
      val surviving = slice.select(pcols.map(col): _*).distinct()
        .collect().map(r => (0 until k).map(r.get).toList).toSet
      val emptied = touched.filterNot(surviving)
      if (emptied.nonEmpty) {
        val root = new org.apache.hadoop.fs.Path(step.path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val rootQ = fs.makeQualified(root)
        emptied.foreach { vals =>
          val rel = pcols.zip(vals).map { case (c, v) =>
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .getPartitionPathString(c, String.valueOf(v))
          }.mkString("/")
          fs.delete(new org.apache.hadoop.fs.Path(root, rel), true)
          // prune now-empty ancestor level dirs up to (not incl.) the root
          var parent = new org.apache.hadoop.fs.Path(root, rel).getParent
          while (parent != null && fs.makeQualified(parent) != rootQ &&
              fs.exists(parent) && fs.listStatus(parent).isEmpty) {
            fs.delete(parent, false)
            parent = parent.getParent
          }
        }
      }
    }

    // (3) ONE post-image audit pass from the files actually on disk:
    // total rows + residual doomed rows in the same scan
    val postAudit = spark.read.parquet(step.path)
      .join(keyFrame, col(step.keyCol) === col("__dk"), "left_outer")
      .agg(count(lit(1)).as("__n"), count(col("__dk")).as("__res"))
      .head()
    val nAfter = postAudit.getLong(0)
    val nResidual = postAudit.getLong(1)
    Seq((step.name, nBefore, nAfter, nErased, nResidual,
      touched.length.toLong, nPartsTotal))
      .toDF("table_name", "n_before", "n_after", "n_erased", "n_residual",
        "n_partitions_touched", "n_partitions_total")
  }

  /** Salt base distinguishing the rendezvous hash family from the Bloom /
    * KMV / CMS members of the same splitmix64 family.
    */
  val RendezvousSaltBase: Int = 7001

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar, IEEE ToN '98 — the consistent-placement scheme behind
    * cache rings and object-store placement): shard =
    * `argmax_{s in [0, nShards)} h(key, s)` with
    * `h = splitmix64(key * 2654435761 + RendezvousSaltBase + s) >>> 1`
    * (sign-cleared so the Spark Long comparison and the oracle's HUGEINT
    * `m // 2` order identically). Ties — probability ~2^-63 but the
    * oracle demands determinism — go to the smallest shard id (the
    * argmax scan takes the FIRST maximum).
    *
    * THE property that matters at 100 TB: growing `nShards` by one moves
    * exactly the keys whose new shard wins the argmax — an expected
    * `1/(nShards+1)` fraction, every one of them moving TO the new
    * shard — instead of the `(nShards-1)/nShards` reshuffle a
    * `hash % nShards` layout forces. Entirely row-local codegen (one
    * splitmix per shard per row, no shuffle, no coordination state);
    * the assignment is a pure function of (key, nShards), so ingest
    * writers on 1000 executors agree without a directory service.
    */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val scores = (0 until nShards).map(s =>
      shiftrightunsigned(
        graft.expr.BloomExprs.splitmixHash(key, RendezvousSaltBase + s), 1))
    val arr = array(scores: _*)
    // first index of the max = smallest shard id on (impossible) ties
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  // ------------------------------------------- merge-on-read delete files

  /** Merge-on-read POSITION deletes (the Iceberg v2 / Delta deletion-
    * vector read path): a delete file lists `(file, pos)` tombstones; a
    * read returns every data row whose position was not tombstoned —
    * without rewriting a single data byte. The read is ONE left-anti
    * equi-join on `(file, pos)`; deletes are deduped first (delete
    * files accumulate duplicates across commits by design).
    *
    * Scale shape: tombstones are a small fraction of the data by
    * construction (compaction folds them in before they grow), so the
    * delete side broadcasts — the scan never shuffles. A pathological
    * delete pile should compact, not drop the hint. Tombstones aimed at
    * positions that don't exist are no-ops (anti-join semantics), which
    * is what makes delete replay idempotent.
    */
  def applyPositionDeletes(
      data: DataFrame, deletes: DataFrame,
      fileCol: String = "file", posCol: String = "pos"): DataFrame =
    data.join(
      broadcast(deletes.select(col(fileCol), col(posCol)).distinct()),
      Seq(fileCol, posCol), "left_anti")

  /** Merge-on-read EQUALITY deletes (Iceberg v2 sequence semantics): an
    * equality-delete row `(key, delete_seq)` deletes every data row
    * with the same key whose data sequence number is STRICTLY LOWER
    * (rows re-inserted at or after the delete survive it). Folding all
    * deletes per key to `max(delete_seq)` preserves the semantics
    * exactly — a row survives iff `data_seq >= max(delete_seq)` — so
    * the read is ONE key-grain aggregate over the (small) delete side
    * broadcast-joined onto the scan; data bytes never rewritten, data
    * never shuffled.
    */
  def applyEqualityDeletes(
      data: DataFrame, deletes: DataFrame, keyCols: Seq[String],
      dataSeqCol: String, deleteSeqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "equality deletes need at least one key column")
    val folded = deletes
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(deleteSeqCol)).as("__max_del_seq"))
    data.join(broadcast(folded), keyCols, "left")
      .filter(col("__max_del_seq").isNull ||
        col(dataSeqCol) >= col("__max_del_seq"))
      .drop("__max_del_seq")
  }

  /** The file set live at `version` from an add/remove manifest ledger
    * `(snapshot_id, op IN ('add','remove'), file)` — snapshot isolation
    * / time travel's metadata half: a file is live iff its LATEST
    * ledger entry at-or-before the version is an add. One file-grain
    * `max_by(op, snapshot_id)` aggregate over the manifest — metadata-
    * sized (file counts, never rows), so the whole resolution is a
    * broadcast-sized frame at any corpus scale.
    */
  def liveFilesAt(manifest: DataFrame, version: Long): DataFrame =
    manifest
      .filter(col("snapshot_id") <= version)
      .groupBy(col("file"))
      .agg(max_by(col("op"), col("snapshot_id")).as("__last_op"))
      .filter(col("__last_op") === "add")
      .select(col("file"))

  /** Time-travel read: the data rows belonging to the file set live at
    * `version` ([[liveFilesAt]]) — ONE broadcast left-semi join of the
    * scan against the metadata-sized live-file frame; partition/file
    * pruning at planning time is the production analogue, the semi-join
    * is its engine-checkable twin.
    */
  def snapshotRead(
      data: DataFrame, manifest: DataFrame, version: Long,
      fileCol: String = "file"): DataFrame =
    data.join(
      broadcast(liveFilesAt(manifest, version)
        .withColumnRenamed("file", fileCol)),
      Seq(fileCol), "left_semi")
}
