package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Lake layout and serving: bucketing, z-order, indexes, sketches, CDC apply, erasure.
  *
  * Domain slice of the gated catalog (split out of PipelineQueries
  * in round 9); assembled and exposed by [[PipelineQueries]].
  */
private[queries] object LakeQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Output-layout sizing plan for the sharded corpus sink
    // (LakeOps.writeSharded): files-per-partition by exact integer
    // ceiling — the sizing half of the write is fully oracled; the
    // filesystem effects (hive dirs, per-file row cap, losslessness,
    // layout determinism) are pinned in LakeOpsSpec.
    "q_lake_layout" -> ((s, dir) =>
      LakeOps.layoutPlan(t(s, dir, "documents"), Seq("source"), 40L)),

    // Two-level hive layout sizing (the multi-column partitionBy case
    // LakeOpsSpec round-trips on disk): one count aggregate over both
    // partition columns.
    "q_lake_layout2" -> ((s, dir) =>
      LakeOps.layoutPlan(t(s, dir, "documents"), Seq("source", "lang"), 25L)),

    // Shuffle-once-at-write-time: both join sides land as bucketed tables
    // on the join key (8 buckets, bucket-sorted), then the revenue join
    // reads HashPartitioning straight from the scans — zero Exchange on
    // either join input (BucketJoinSpec pins it). The oracle re-joins the
    // raw parquet, so a green row also proves the bucketed round-trip is
    // lossless.
    "q_bucket_join" -> ((s, dir) => {
      // table names keyed to the (immutable) input dir: within a session
      // the bucketed write happens ONCE and later runs pay only the
      // shuffle-free join — the amortization the operator exists for
      val sfx = java.lang.Integer.toHexString(dir.hashCode)
      LakeOps.writeBucketedIfAbsent(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        s"graft_bkt_lineitem_$sfx", Seq("l_orderkey"), nBuckets = 8)
      LakeOps.writeBucketedIfAbsent(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        s"graft_bkt_orders_$sfx", Seq("o_orderkey"), nBuckets = 8)
      s.table(s"graft_bkt_lineitem_$sfx")
        .join(s.table(s"graft_bkt_orders_$sfx"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg((sum(revU) / 10000.0).as("revenue"))
    }),

    // Right-to-be-forgotten erasure with cascade + residual audit: a
    // deterministic delete-list of customers propagates through the FK
    // chain (customer -> orders -> lineitem) via anti joins, and each
    // table reports before/after/erased plus a residual count that MUST
    // be zero — the verification regulators actually ask for. The
    // delete-list broadcasts; the doomed-orders key set is fact-derived,
    // so the lineitem erase is a keyed anti join (never broadcast at
    // 100 TB) — each anti join is the table's one shuffle.
    "q_erasure" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ords = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val doomed = cust.filter(pmod(col("c_custkey"), lit(10)) === 3)
        .select(col("c_custkey"))
      val custAfter = cust.join(broadcast(doomed), Seq("c_custkey"),
        "left_anti")
      val ordsAfter = ords.join(broadcast(doomed),
        col("o_custkey") === col("c_custkey"), "left_anti")
      val doomedOrders = ords.join(broadcast(doomed),
        col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"))
      val liAfter = li.join(doomedOrders,
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      def leg(name: String, before: DataFrame, after: DataFrame,
          residual: DataFrame) =
        before.agg(count(lit(1)).as("n_before")).crossJoin(
          after.agg(count(lit(1)).as("n_after"))).crossJoin(
          residual.agg(count(lit(1)).as("n_residual")))
          .select(lit(name).as("table_name"), col("n_before"),
            col("n_after"),
            (col("n_before") - col("n_after")).as("n_erased"),
            col("n_residual"))
      leg("customer", cust, custAfter,
        custAfter.join(broadcast(doomed), Seq("c_custkey"), "left_semi"))
        .unionByName(leg("orders", ords, ordsAfter,
          ordsAfter.join(broadcast(doomed),
            col("o_custkey") === col("c_custkey"), "left_semi")))
        .unionByName(leg("lineitem", li, liAfter,
          liAfter.join(doomedOrders,
            col("l_orderkey") === col("o_orderkey"), "left_semi")))
    }),

    // Join-key skew diagnostic (run BEFORE choosing saltedJoin): key
    // cardinality, max/median/p99 group sizes, skew ratio, hottest keys.
    // One corpus-sized count shuffle; rank selection pays one KEY-sized
    // SinglePartition window (the op's documented bound).
    "q_skew_report" -> ((s, dir) =>
      ProfileOps.skewReport(t(s, dir, "lineitem"), col("l_suppkey"))),

    // Zone-map stats (the data-skipping index) over lineitem laid out by
    // ship month, with the skip verdicts of two range predicates: the
    // date range touches ~3 zones (layout-aligned key -> tight
    // envelopes), while the same-selectivity price range touches nearly
    // every zone (unclustered key -> useless envelopes) — the measured
    // argument for Z-ordering. Pruned-scan == full-filter equivalence
    // and directory-level PartitionFilters are pinned in LakeOpsSpec.
    "q_zone_map" -> ((s, dir) => {
      val zm = LakeOps.zoneMap(t(s, dir, "lineitem"),
        date_format(col("l_shipdate"), "yyyy-MM"),
        "ship" -> to_date(col("l_shipdate")),
        "cents" -> round(col("l_extendedprice") * 100).cast("long"))
      zm.select(col("zone"), col("n_rows"),
        date_format(col("min_ship"), "yyyy-MM-dd").as("min_ship"),
        date_format(col("max_ship"), "yyyy-MM-dd").as("max_ship"),
        col("min_cents"), col("max_cents"),
        LakeOps.zoneTouched("ship",
          lit("1996-02-01").cast("date"), lit("1996-04-30").cast("date"))
          .as("touch_ship"),
        LakeOps.zoneTouched("cents", lit(9000000L), lit(9100000L))
          .as("touch_cents"))
    }),

    // Bloom-filter partition index — the point-lookup twin of q_zone_map:
    // orders laid out by month, probed with 400 keys — 200 live ones and
    // 200 from 1e12 up (absent at ANY scale factor; keys stay positive so
    // the HUGEINT mod-2^64 replay stays on the unsigned branch). The
    // splitmix64 family replays in HUGEINT SQL, so the oracle gates the
    // PRUNING DECISIONS themselves (n_candidate_parts per probe), not
    // just the row counts — a false negative or a wrongly-set bit on
    // either side breaks the hash.
    "q_bloom_index" -> ((s, dir) =>
      LakeOps.bloomPointLookup(
        t(s, dir, "orders"),
        partCol = expr("year(o_orderdate) * 12 + month(o_orderdate)"),
        keyCol = col("o_orderkey"),
        probes = s.range(1, 201)
          .union(s.range(1000000000001L, 1000000000201L)).toDF("probe"),
        probeCol = col("probe"),
        mBits = 65536, k = 3)),

    // Bloom-index LIFECYCLE through IndexOps.refresh: base 2/3 of the
    // orders built first, the remaining 1/3 folded in as a segment via
    // the OR-monoid merge (one layout-sized bit_or — the corpus is read
    // once per segment, ever), idempotent re-refresh, then EVERY pruning
    // decision of the merged index gated: the oracle replays the
    // from-scratch build over the full table in HUGEINT splitmix SQL, so
    // green means merged-after-append == rebuilt, bit for bit.
    "q_index_refresh_bloom" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val part = expr("year(o_orderdate) * 12 + month(o_orderdate)")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_idxb_").toString
      IndexOps.refreshBloom(orders.filter(col("o_orderkey") % 3 =!= 0),
        idx, "base", part, col("o_orderkey"))
      IndexOps.refreshBloom(orders.filter(col("o_orderkey") % 3 === 0),
        idx, "delta1", part, col("o_orderkey"))
      IndexOps.refreshBloom(orders.filter(col("o_orderkey") % 3 === 0),
        idx, "delta1", part, col("o_orderkey")) // idempotent re-run
      LakeOps.bloomCandidates(
        IndexOps.readBloom(s, idx),
        probes = s.range(1, 201)
          .union(s.range(1000000000001L, 1000000000201L)).toDF("probe"),
        probeCol = col("probe"), mBits = 65536, k = 3)
        .select(col("probe"), col("part").cast("long").as("part"))
    }),

    // Lake drift detection: one (n_rows, xor-of-content-hash) row per
    // (source, lang) partition — snapshot comparison without re-reading
    // either lake. The portable rolling fingerprint makes the XOR
    // engine-comparable.
    "q_partition_hash" -> ((s, dir) =>
      LakeOps.partitionFingerprints(
        t(s, dir, "documents"),
        TextOps.fingerprint(col("text")),
        "source" -> col("source"), "lang" -> col("lang"))),

    // Rendezvous (HRW) shard placement under 8 shards and after growing
    // to 9: row-local argmax over the splitmix family, no shuffle, no
    // directory service. The gated frame carries BOTH assignments plus
    // the moved flag, so the oracle hash-pins the consistent-placement
    // law: every moved key lands on the NEW shard (RendezvousSpec
    // asserts it; the driver hash would break if either argmax drifted).
    "q_rendezvous_shard" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        LakeOps.rendezvousShard(col("doc_id"), 8).as("shard8"),
        LakeOps.rendezvousShard(col("doc_id"), 9).as("shard9"))
        .withColumn("moved", (col("shard8") =!= col("shard9")).cast("int"))),

    // MERGE INTO / CDC upsert-apply (lakehouse incremental write): a
    // changelog of updates, deletes, re-inserts and multi-version rows
    // lands on a snapshot; latest seq wins per key, delete winners drop.
    // NO join — snapshot+changelog union rides ONE key shuffle with a
    // map-side partial max_by (LakeOps.applyChanges scaladoc).
    "q_merge_upsert" -> ((s, dir) => {
      val (snapshot, changes) = cdcFeed(s, dir)
      LakeOps.applyChanges(snapshot, changes,
        keyCol = "o_orderkey", seqCol = "seq", opCol = "op")
    }),

    // Merge-on-read POSITION deletes (deletion-vector read): orders laid
    // out as a synthetic 8-file lake ((key%8, key DIV 8) is a bijection,
    // so positions are deterministic), tombstones planted for key%5==0
    // PLUS duplicated delete entries and a whole file of no-op
    // tombstones aimed at a nonexistent file — the read must survive
    // both. One broadcast anti-join; the oracle replays the logical
    // deletion predicate over raw parquet, so green proves the
    // (file,pos) round-trip is lossless.
    "q_pos_deletes" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val data = o.select(
        (col("o_orderkey") % 8).as("file"),
        expr("o_orderkey DIV 8").as("pos"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dels = o.filter(col("o_orderkey") % 5 === 0).select(
        (col("o_orderkey") % 8).as("file"),
        expr("o_orderkey DIV 8").as("pos"))
      val noops = s.range(100)
        .select(lit(99L).as("file"), col("id").as("pos"))
      LakeOps.applyPositionDeletes(
        data, dels.unionAll(dels).unionAll(noops))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
    }),

    // Merge-on-read EQUALITY deletes with Iceberg v2 sequence-number
    // semantics: a delete (key, seq) kills rows with data_seq STRICTLY
    // below it, so later re-inserts survive. Two delete generations per
    // hot key (custkey%7 at seq 2, custkey%14 additionally at seq 3)
    // fold to max(seq) per key — one broadcast join, data never
    // rewritten. The oracle replays the survivor predicate.
    "q_eq_deletes" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val data = o.select(
        col("o_custkey"), col("o_orderstatus"),
        (col("o_orderkey") % 4).as("data_seq"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val d7 = o.filter(col("o_custkey") % 7 === 0)
        .select(col("o_custkey")).distinct()
        .select(col("o_custkey"), lit(2L).as("del_seq"))
      val d14 = o.filter(col("o_custkey") % 14 === 0)
        .select(col("o_custkey")).distinct()
        .select(col("o_custkey"), lit(3L).as("del_seq"))
      LakeOps.applyEqualityDeletes(
        data, d7.unionByName(d14), Seq("o_custkey"), "data_seq", "del_seq")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
    }),

    // Snapshot time travel over an add/remove manifest ledger: documents
    // laid out as a 6-file lake, five snapshots exercising add, remove,
    // and RE-ADD of a removed file. Reads at v2 / v3 / v5 resolve the
    // live file set from max_by(op, snapshot) — a metadata-sized frame —
    // then semi-join the scan. The oracle replays each version's live
    // set as a literal IN list.
    "q_time_travel" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select(
        (col("doc_id") % 6).as("file"), col("doc_id"), col("n_chars"))
      val manifest = Seq(
        (1L, "add", 0L), (1L, "add", 1L), (1L, "add", 2L),
        (2L, "add", 3L), (2L, "add", 4L),
        (3L, "remove", 1L),
        (4L, "add", 5L), (4L, "remove", 3L),
        (5L, "add", 1L)).toDF("snapshot_id", "op", "file")
      Seq(2L, 3L, 5L).map { v =>
        LakeOps.snapshotRead(d, manifest, v)
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
          .select(lit(v).as("version"), col("n_docs"), col("chars_sum"))
      }.reduce(_ unionByName _)
    }),

    // The streaming CDC operator's batch form: the SAME planted
    // changelog, bootstrap snapshot replayed as seq=-inf 'U' changes
    // (the standard streaming bootstrap), folded by
    // CdcStream.latestView — the IDENTICAL declarative plan the
    // streaming twin runs as ONE stateful aggregation in update mode
    // (CdcStreamSpec pins streamed == batch on out-of-order, stale,
    // duplicate-delivery and post-tombstone feeds). applyChanges
    // (q_merge_upsert) and this fold agree by construction — both
    // gated so neither formulation can drift.
    "q_cdc_view" -> ((s, dir) => {
      val (snapshot, changes) = cdcFeed(s, dir)
      val snapAsChanges = snapshot.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("total_cents"),
        lit(Long.MinValue).as("seq"), lit("U").as("op"))
      graft.streaming.CdcStream.latestView(
        snapAsChanges.unionByName(changes), "o_orderkey", "seq", "op")
    }),

    // Index LIFECYCLE, gated end to end (IndexOps.refresh): build the
    // token-bucket postings lake on the base 2/3 of the corpus, APPEND
    // the remaining 1/3 as a named segment (pure file adds into the
    // existing bucket partitions — base postings bytes never rewritten),
    // prove idempotence by re-refreshing the base segment (a ledger
    // no-op), then phrase-search THROUGH the refreshed lake. The oracle
    // replays the phrase over the full corpus — green means
    // append-without-rebuild produced exactly the from-scratch index's
    // answers, delta docs included (the from_delta flag pins that delta
    // occurrences are really present).
    "q_index_refresh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_idx_").toString
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base")
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 === 0), idx, "delta1")
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base") // idempotent re-run
      IndexOps.phraseSearch(s, idx, Seq("slow", "hash", "batch"))
        .withColumn("from_delta", (col("doc_id") % 3 === 0).cast("int"))
    }),

    // The ledger side of the lifecycle: which EXPECTED segments has the
    // index not folded in yet? (The assertion a scheduled ingest alerts
    // on.) base+delta1 refreshed, delta2 deliberately absent -> covered
    // 1/1/0.
    "q_index_staleness" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 120)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_idxs_").toString
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base")
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 === 0), idx, "delta1")
      IndexOps.staleness(s, idx, "postings", Seq("base", "delta1", "delta2"))
    }),

    // Z-order (Morton) clustering key over the 2-D (partkey, suppkey)
    // access pattern — the lakehouse OPTIMIZE-ZORDER layout key. Pure
    // codegen'd bit arithmetic, zero shuffles; file-skipping effect
    // quantified in PrepOpsSpec (an aligned 2-D box touches 1 contiguous
    // key bucket vs one stripe per x under lexicographic order).
    "q_zorder" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        PrepOps.zorderKey(col("l_partkey"), col("l_suppkey")).as("zkey"))),

    // Hilbert clustering key over the same access pattern: no diagonal
    // jumps (consecutive curve positions are grid neighbors), so bbox
    // predicates touch fewer contiguous key runs than under the Morton
    // key in aggregate (PrepOpsSpec measures the box sweep). The
    // stateful per-bit walk is one codegen'd expression; the oracle
    // unrolls the identical walk level by level.
    "q_hilbert_layout" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        PrepOps.hilbertKey(col("l_partkey"), col("l_suppkey")).as("hkey"))),

    // Two-pass heavy hitters: a Misra-Gries sketch (bounded buffers — the
    // shuffle is partitions x capacity counters no matter how many distinct
    // keys exist) yields a GUARANTEED candidate superset of every key with
    // count > N/1025; an exact count restricted to the broadcast candidates
    // then makes the output exact — so the gated result is deterministic
    // and fully oracled even though any MG summary's surviving-counter set
    // is split-order-dependent. At a billion distinct keys this replaces a
    // full groupBy-every-key shuffle with kilobytes.
    "q_heavy_hitters" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val sk = orders.agg(
        graft.agg.FrequentItems.freqSketch(col("o_custkey"), 1024).as("mg"),
        count(lit(1)).as("total"))
      val cands = sk
        .select(explode(col("mg")).as("e"), col("total"))
        .select(col("e.key").as("o_custkey"), col("total"))
      orders.join(broadcast(cands), "o_custkey")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), max(col("total")).as("total"))
        .filter(col("n_orders") * 1024 > col("total"))
        .select(col("o_custkey"), col("n_orders"))
    }),

    // Count-min sketch point-frequency estimates (SketchOps) — the
    // fixed-space complement to q_heavy_hitters' Misra-Gries top-k. w=256
    // is deliberately tight for ~1000 live keys so collisions HAPPEN and
    // the min-fold does real work; the oracle replays every counter and
    // gates est >= exact per probe (overcount is exact-valued, never a
    // statistical bound, because the hash family is deterministic).
    "q_cms_freq" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val probes = s.range(1, 201).toDF("probe")
      val sketch = SketchOps.cmsSketch(orders, col("o_custkey"), w = 256, d = 3)
      val est = SketchOps.cmsEstimate(sketch, probes, col("probe"), w = 256, d = 3)
      // the exact leg stays probe-bounded: broadcast-semi the corpus down
      // to probed keys FIRST, so the verification frame never grows with
      // the key universe (the sketch exists precisely because that
      // universe is too big to groupBy)
      val exact = orders
        .join(broadcast(probes.select(col("probe").as("ck"))),
          col("o_custkey").cast("long") === col("ck"))
        .groupBy("ck").agg(count(lit(1)).as("exact_count"))
      est.join(broadcast(exact), col("probe") === col("ck"), "left")
        .select(col("probe").as("probe_key"), col("cms_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"),
          (col("cms_count") - coalesce(col("exact_count"), lit(0L)))
            .as("overcount"))
    }),

    // KMV set algebra (SketchOps.kmvIntersect): |A union B| and
    // |A intersect B| estimated from the two k-long sketches ALONE —
    // the optimizer's join-cardinality / overlap primitive. A = customers
    // with orders, B = one market segment; the exact legs ride one
    // full-outer on distinct keys purely for the gate's comparison.
    "q_kmv_join_card" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("key"))
      val b = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("key"))
      val sk = SketchOps.kmvIntersect(a, col("key"), b, col("key"), k = 64)
      val ex = a.distinct().withColumnRenamed("key", "ak")
        .join(b.distinct().withColumnRenamed("key", "bk"),
          col("ak") === col("bk"), "full")
        .agg(count(col("ak")).as("exact_a"), count(col("bk")).as("exact_b"),
          count(lit(1)).as("exact_union"),
          sum(when(col("ak").isNotNull && col("bk").isNotNull, 1L)
            .otherwise(0L)).as("exact_inter"))
      sk.crossJoin(broadcast(ex)) // 1-row x 1-row
    }),

    // KMV distinct sketch (SketchOps.kmvDistinct) — the third sketch leg:
    // Misra-Gries answers "which keys are hot", CMS "how often is key x",
    // KMV "how many distinct keys" — and unlike the HLL++ in
    // q_approx_distinct (gated within 5%), every KMV number is
    // deterministic, so the oracle pins the k-th order-statistic hash and
    // the estimate bit-for-bit. Grouped by (month, status): F/O cells
    // hold > k distinct custkeys (estimate branch), the rare 'P' cells
    // fewer (exact small-set branch) — both paths live at every SF.
    // KMV as a STREAMED summary, driver-gated: the event feed split into
    // 3 "micro-batch" segments, one sketch per segment, and a merged row
    // folded from the segment sketches alone (k-smallest of the union of
    // k-smallest — the monoid a streaming ingest applies per trigger and
    // a lake applies per partition). The oracle computes every segment
    // AND the merged row from the raw feed, so a hash match proves
    // merge(sketches) == sketch(union) exactly — the mergeable-summary
    // law itself, not a recomputation. SketchStreamSpec carries the live
    // streamed==batch differential for the same aggregate.
    "q_kmv_stream" -> ((s, dir) =>
      SketchOps.kmvSegmented(
        RefQueries.events(s, dir),
        segCol = pmod(col("event_id"), lit(3)),
        keyCol = col("user_id"), k = 64)),

    "q_kmv_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val month = expr("year(o_orderdate) * 12 + month(o_orderdate)")
      val sk = SketchOps.kmvDistinct(
        o, Seq("part_month" -> month.cast("long"),
          "status" -> col("o_orderstatus")),
        col("o_custkey"), k = 64)
      val exact = o
        .groupBy(month.cast("long").as("m2"), col("o_orderstatus").as("s2"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      sk.join(broadcast(exact),
          col("part_month") === col("m2") && col("status") === col("s2"))
        .select(col("part_month"), col("status"), col("n_kept"),
          col("kth_hash"), col("est_distinct"), col("n_exact"),
          (col("est_distinct") / col("n_exact").cast("double"))
            .as("est_ratio"))
    }),

    // Snapshot diff (dataset versioning): v2 = the corpus after a policy
    // change (drop docs under 20 tokens, truncate to 40). The full-outer
    // join carries only (id, sha256) — never the text — so diffing two
    // 100 TB snapshots moves 40 bytes per doc; the oracle compares the
    // texts directly, proving the hash comparison classifies identically.
    "q_dataset_diff" -> ((s, dir) => {
      val v1 = t(s, dir, "documents")
      val v2 = v1
        .filter(TextOps.tokenCount(col("text")) >= 20)
        .select(col("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 40), " ").as("text"))
      // presence flags key added/removed on doc_id existence, NOT on hash
      // NULLness — a NULL text must not masquerade as a missing row (the
      // oracle keys on doc_id presence; sha2(NULL) is NULL). Two NULL
      // texts compare NULL = NULL -> not-true -> 'changed' on BOTH
      // engines, so the hash path stays oracle-consistent.
      val h1 = v1.select(col("doc_id"), sha2(col("text"), 256).as("h1"),
        lit(true).as("in_v1"))
      val h2 = v2.select(col("doc_id"), sha2(col("text"), 256).as("h2"),
        lit(true).as("in_v2"))
      h1.join(h2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("in_v1").isNull, "added")
            .when(col("in_v2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed").as("status"))
    }),

    // SCD2 dimension build (slowly-changing dimension, type 2): collapse
    // each user's event-type history into validity intervals — a row per
    // CHANGE, valid_from/valid_to half-open, NULL valid_to = current.
    // Both windows share the user_id partitioning and (ts, event_id)
    // order, so Spark plans ONE Exchange + one sort for the lag, and the
    // post-filter lead reuses the layout.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val changes = RefQueries.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes.select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(lead(col("ts"), 1).over(w), "yyyy-MM-dd HH:mm:ss")
          .as("valid_to"))
    }),

    // Removal-list anti join, Bloom-pruned: definite keeps stream from the
    // scan with zero shuffle; only sketch "maybes" take the exact anti
    // join. Bit-identical to a plain left_anti for any fpp.
    "q_bloom_anti" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val removals = docs.filter(col("n_chars") < 150)
        .select(col("doc_id").as("rm_id"))
      JoinOps.bloomAntiJoin(
        docs.select(col("doc_id"), col("source")), "doc_id",
        removals, "rm_id", expectedItems = 1 << 16)
    }),

    // Skew-resistant join as a gated component: the salted plan spreads
    // each hot o_custkey over 8 salt buckets (customer side replicated
    // 8x) — the RESULT is identical to the plain equi-join, which is what
    // the oracle checks; the spread is visible in the shuffle key, not
    // the rows. Aggregated to per-customer order value in exact cents.
    "q_salted_join" -> ((s, dir) =>
      JoinOps.saltedJoin(
        t(s, dir, "orders")
          .withColumn("price_c", round(col("o_totalprice") * 100).cast("long")),
        t(s, dir, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        keys = Seq("o_custkey"), saltBuckets = 8)
        .groupBy(col("o_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("price_c")).cast("double") / 100).as("total_value"))),

    // Incremental aggregation maintenance (materialized-view delta
    // merge): the base partials and the delta batch's partials merge
    // WITHOUT rescanning the base — counts and sums are monoids, so
    // maintenance is groupBy-sum over the union of partials (the same
    // merge Spark's partial/final aggregation does inside one query,
    // lifted across snapshots). The oracle recomputes from scratch over
    // the full table: hash equality IS the maintenance-correctness
    // proof.
    "q_incr_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def partials(df: DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val base = partials(o.filter(col("o_orderdate") < lit("2000-01-01")))
      val delta = partials(o.filter(col("o_orderdate") >= lit("2000-01-01")))
      base.unionByName(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n_orders")).as("n_orders"),
          (sum(col("cents")).cast("double") / 100).as("total_spend"))
    }),

    // Incremental JOIN-view maintenance (the ΔR⋈S delta rule next to
    // q_incr_agg's monoid merge): the per-nation revenue view over
    // orders⋈customer is maintained under an order-batch insert by
    // joining ONLY the delta batch against the unchanged broadcast
    // dimension and merging partials — the base fact is never rescanned
    // at maintenance time. The oracle recomputes the view from the full
    // join: hash equality is the delta-rule proof.
    "q_incr_join_view" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"))
      def viewPartials(o: DataFrame) = o
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val o = t(s, dir, "orders")
      val base = viewPartials(o.filter(col("o_orderkey") % 10 < 8))
      val delta = viewPartials(o.filter(col("o_orderkey") % 10 >= 8))
      base.unionByName(delta)
        .groupBy(col("c_nationkey"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("cents")).as("cents"))
    }),

    // Small-file compaction plan (lakehouse OPTIMIZE): bin-pack a file
    // listing into ~30 KB merge groups per source. The listing here is
    // DERIVED from the corpus (16 content-keyed shards per source with
    // their byte volumes) standing in for a lake's file index; the plan
    // itself is LakeOps.planCompaction — deterministic sorted cumulative
    // packing over a metadata-sized frame (ONE partition-keyed window;
    // partitions parallelize). writeSharded executes the planned bins.
    "q_compaction_plan" -> ((s, dir) => {
      val listing = t(s, dir, "documents")
        .groupBy(col("source"), pmod(col("doc_id"), lit(16)).as("shard"))
        .agg(sum(col("n_chars")).as("bytes"))
      LakeOps.planCompaction(listing, "source", "shard", "bytes",
          targetBytes = 30000)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // Full-join recompute — hash equality proves the delta merge.
    "q_incr_join_view" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,

    "q_lake_layout" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST((count(*) + 39) // 40 AS BIGINT) AS n_files
        |FROM documents GROUP BY source""".stripMargin,

    "q_lake_layout2" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST((count(*) + 24) // 25 AS BIGINT) AS n_files
        |FROM documents GROUP BY source, lang""".stripMargin,

    // Same cascade and audit in plain SQL; every residual must be 0.
    "q_erasure" ->
      """WITH doomed AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 10 = 3),
        |ca AS (SELECT * FROM customer
        |       WHERE c_custkey NOT IN (SELECT c_custkey FROM doomed)),
        |oa AS (SELECT * FROM orders
        |       WHERE o_custkey NOT IN (SELECT c_custkey FROM doomed)),
        |dord AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM doomed)),
        |la AS (SELECT * FROM lineitem
        |       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dord))
        |SELECT 'customer' AS table_name,
        |  CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_before,
        |  CAST((SELECT count(*) FROM ca) AS BIGINT) AS n_after,
        |  CAST((SELECT count(*) FROM customer)
        |    - (SELECT count(*) FROM ca) AS BIGINT) AS n_erased,
        |  CAST((SELECT count(*) FROM ca
        |    WHERE c_custkey IN (SELECT c_custkey FROM doomed))
        |    AS BIGINT) AS n_residual
        |UNION ALL
        |SELECT 'orders',
        |  CAST((SELECT count(*) FROM orders) AS BIGINT),
        |  CAST((SELECT count(*) FROM oa) AS BIGINT),
        |  CAST((SELECT count(*) FROM orders)
        |    - (SELECT count(*) FROM oa) AS BIGINT),
        |  CAST((SELECT count(*) FROM oa
        |    WHERE o_custkey IN (SELECT c_custkey FROM doomed)) AS BIGINT)
        |UNION ALL
        |SELECT 'lineitem',
        |  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |  CAST((SELECT count(*) FROM la) AS BIGINT),
        |  CAST((SELECT count(*) FROM lineitem)
        |    - (SELECT count(*) FROM la) AS BIGINT),
        |  CAST((SELECT count(*) FROM la
        |    WHERE l_orderkey IN (SELECT o_orderkey FROM dord)) AS BIGINT)
        |""".stripMargin,

    // Re-joins the RAW parquet: a hash match proves the bucketed
    // round-trip lost and changed nothing.
    "q_bucket_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) / 10000 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_zone_map" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS zone,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_ship,
        |  strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_ship,
        |  CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents,
        |  CASE WHEN max(CAST(l_shipdate AS DATE)) >= DATE '1996-02-01'
        |        AND min(CAST(l_shipdate AS DATE)) <= DATE '1996-04-30'
        |    THEN 1 ELSE 0 END AS touch_ship,
        |  CASE WHEN max(CAST(round(l_extendedprice * 100) AS BIGINT)) >= 9000000
        |        AND min(CAST(round(l_extendedprice * 100) AS BIGINT)) <= 9100000
        |    THEN 1 ELSE 0 END AS touch_cents
        |FROM lineitem GROUP BY 1""".stripMargin,

    // The Bloom pruning decisions replayed bit-for-bit: the same
    // splitmix64 chain in HUGEINT mod-2^64 SQL (RefQueries.mixSql), the
    // same (hash >>> 1) % mBits positions, the same all-k-bits pass rule.
    "q_bloom_index" ->
      s"""WITH o AS (
         |  SELECT o_orderkey AS key,
         |    year(CAST(o_orderdate AS DATE)) * 12
         |      + month(CAST(o_orderdate AS DATE)) AS part
         |  FROM orders),
         |js(j) AS (VALUES (0), (1), (2)),
         |kb AS (
         |  SELECT part, key, j,
         |  ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761 + j")}
         |  FROM o CROSS JOIN js),
         |bits AS (SELECT DISTINCT part, (am // 2) % 65536 AS pos FROM kb),
         |pr AS (SELECT t.range AS probe FROM range(1, 201) t
         |       UNION ALL
         |       SELECT t.range
         |       FROM range(1000000000001, 1000000000201) t),
         |pb AS (
         |  SELECT probe, j,
         |  ${RefQueries.mixSql("b", "probe::HUGEINT * 2654435761 + j")}
         |  FROM pr CROSS JOIN js),
         |pbits AS (SELECT probe, j, (bm // 2) % 65536 AS pos FROM pb),
         |cand AS (
         |  SELECT p.probe, b.part
         |  FROM pbits p JOIN bits b ON b.pos = p.pos
         |  GROUP BY p.probe, b.part
         |  HAVING count(DISTINCT p.j) = 3),
         |truth AS (
         |  SELECT key, part, CAST(count(*) AS BIGINT) AS nr
         |  FROM o GROUP BY 1, 2),
         |hits AS (
         |  SELECT c.probe,
         |    CAST(count(*) AS BIGINT) AS n_true_parts,
         |    CAST(sum(t.nr) AS BIGINT) AS n_rows
         |  FROM cand c JOIN truth t ON t.part = c.part AND t.key = c.probe
         |  GROUP BY 1),
         |cc AS (
         |  SELECT probe, CAST(count(*) AS BIGINT) AS n_candidate_parts
         |  FROM cand GROUP BY 1),
         |np AS (
         |  SELECT CAST(count(DISTINCT part) AS BIGINT) AS n_parts_total
         |  FROM o)
         |SELECT pr.probe AS probe_key,
         |  coalesce(cc.n_candidate_parts, 0) AS n_candidate_parts,
         |  coalesce(hits.n_true_parts, 0) AS n_true_parts,
         |  coalesce(hits.n_rows, 0) AS n_rows,
         |  np.n_parts_total
         |FROM pr LEFT JOIN cc ON cc.probe = pr.probe
         |LEFT JOIN hits ON hits.probe = pr.probe
         |CROSS JOIN np""".stripMargin,

    // From-scratch Bloom build over the FULL table (same HUGEINT
    // splitmix replay as q_bloom_index), emitting every (probe, part)
    // pruning decision: the OR-monoid guarantees the engine's
    // base-build + delta-merge index equals this, and the hash compare
    // enforces it bit for bit.
    "q_index_refresh_bloom" ->
      s"""WITH o AS (
         |  SELECT o_orderkey AS key,
         |    year(CAST(o_orderdate AS DATE)) * 12
         |      + month(CAST(o_orderdate AS DATE)) AS part
         |  FROM orders),
         |js(j) AS (VALUES (0), (1), (2)),
         |kb AS (
         |  SELECT part, key, j,
         |  ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761 + j")}
         |  FROM o CROSS JOIN js),
         |bits AS (SELECT DISTINCT part, (am // 2) % 65536 AS pos FROM kb),
         |pr AS (SELECT t.range AS probe FROM range(1, 201) t
         |       UNION ALL
         |       SELECT t.range
         |       FROM range(1000000000001, 1000000000201) t),
         |pb AS (
         |  SELECT probe, j,
         |  ${RefQueries.mixSql("b", "probe::HUGEINT * 2654435761 + j")}
         |  FROM pr CROSS JOIN js),
         |pbits AS (SELECT probe, j, (bm // 2) % 65536 AS pos FROM pb)
         |SELECT p.probe, CAST(b.part AS BIGINT) AS part
         |FROM pbits p JOIN bits b ON b.pos = p.pos
         |GROUP BY p.probe, b.part
         |HAVING count(DISTINCT p.j) = 3""".stripMargin,

    // Same portable rolling fingerprint; DuckDB's bit_xor is the same
    // order-free 64-bit fold.
    "q_partition_hash" ->
      s"""SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
         |  bit_xor(${S.fingerprint("text")}) AS fp_xor
         |FROM documents GROUP BY 1, 2""".stripMargin,

    // Every per-shard splitmix score regenerated in HUGEINT mod-2^64 SQL
    // (`m // 2` == the Spark side's sign-clearing >>> 1); argmax via
    // row_number (score DESC, s ASC) = the expression's first-maximum.
    "q_rendezvous_shard" ->
      s"""WITH d AS (SELECT doc_id FROM documents),
         |h AS (SELECT doc_id, s, am // 2 AS score
         |      FROM (SELECT d.doc_id, t.range AS s,
         |        ${RefQueries.mixSql("a",
              s"doc_id::HUGEINT * 2654435761 + (${LakeOps.RendezvousSaltBase} + t.range)")}
         |        FROM d CROSS JOIN range(0, 9) t)),
         |a8 AS (SELECT doc_id, s AS shard8 FROM (
         |  SELECT doc_id, s, row_number()
         |    OVER (PARTITION BY doc_id ORDER BY score DESC, s) AS rn
         |  FROM h WHERE s < 8) WHERE rn = 1),
         |a9 AS (SELECT doc_id, s AS shard9 FROM (
         |  SELECT doc_id, s, row_number()
         |    OVER (PARTITION BY doc_id ORDER BY score DESC, s) AS rn
         |  FROM h) WHERE rn = 1)
         |SELECT d.doc_id, CAST(shard8 AS INT) AS shard8,
         |  CAST(shard9 AS INT) AS shard9,
         |  CAST(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END AS INT) AS moved
         |FROM d JOIN a8 USING (doc_id) JOIN a9 USING (doc_id)""".stripMargin,

    // The logical deletion predicate the (file,pos) tombstones encode —
    // green proves the synthetic layout bijection + anti-join read
    // dropped exactly the tombstoned positions (dupes and no-op
    // tombstones included).
    "q_pos_deletes" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders WHERE o_orderkey % 5 <> 0
        |GROUP BY o_orderstatus""".stripMargin,

    // The survivor predicate of sequence-numbered equality deletes:
    // custkey%14 keys need data_seq >= 3, other custkey%7 keys >= 2,
    // everyone else survives.
    "q_eq_deletes" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders
        |WHERE CASE WHEN o_custkey % 14 = 0 THEN (o_orderkey % 4) >= 3
        |           WHEN o_custkey % 7 = 0 THEN (o_orderkey % 4) >= 2
        |           ELSE TRUE END
        |GROUP BY o_orderstatus""".stripMargin,

    // Each version's live file set replayed as a literal IN list over
    // the doc_id%6 layout: v2 = all five initial adds, v3 drops file 1,
    // v5 re-adds 1 and has dropped 3 (add/remove/RE-ADD all exercised).
    "q_time_travel" ->
      """SELECT CAST(2 AS BIGINT) AS version,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM documents WHERE doc_id % 6 IN (0, 1, 2, 3, 4)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 6 IN (0, 2, 3, 4)
        |UNION ALL
        |SELECT CAST(5 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT)
        |FROM documents WHERE doc_id % 6 IN (0, 1, 2, 4, 5)""".stripMargin,

    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |  FROM orders),
        |snap AS (
        |  SELECT *, CAST(-1 AS BIGINT) AS seq, 'U' AS op
        |  FROM base WHERE o_orderkey % 4 < 3),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
        |    total_cents + 100 AS total_cents, CAST(1 AS BIGINT) AS seq,
        |    'U' AS op
        |  FROM base WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'D'
        |  FROM base WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'U'
        |  FROM base WHERE o_orderkey % 4 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'Y', total_cents + 200, 2, 'U'
        |  FROM base WHERE o_orderkey % 8 = 0),
        |w AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg))
        |SELECT o_orderkey, o_custkey, o_orderstatus, total_cents
        |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // Same changelog, same winner-per-key semantics — the bootstrap
    // snapshot enters as seq -1 'U' rows (below every change seq, as
    // Long.MinValue is on the Spark side).
    "q_cdc_view" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |  FROM orders),
        |snap AS (
        |  SELECT *, CAST(-1 AS BIGINT) AS seq, 'U' AS op
        |  FROM base WHERE o_orderkey % 4 < 3),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
        |    total_cents + 100 AS total_cents, CAST(1 AS BIGINT) AS seq,
        |    'U' AS op
        |  FROM base WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'D'
        |  FROM base WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'U'
        |  FROM base WHERE o_orderkey % 4 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'Y', total_cents + 200, 2, 'U'
        |  FROM base WHERE o_orderkey % 8 = 0),
        |w AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg))
        |SELECT o_orderkey, o_custkey, o_orderstatus, total_cents
        |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin,

    "q_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${PrepOps.zorderKeySql("l_partkey", "l_suppkey")} AS zkey
         |FROM lineitem""".stripMargin,

    "q_hilbert_layout" ->
      PrepOps.hilbertKeySqlQuery(
        "l_partkey", "l_suppkey", "lineitem",
        carry = Seq("l_orderkey", "l_linenumber"), keyAlias = "hkey"),

    // Full-corpus phrase replay (the q_phrase_search oracle) + the
    // segment flag: green means the refreshed (base build + delta
    // append) postings lake answers exactly like a from-scratch index.
    "q_index_refresh" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("lower(text)")} AS w FROM documents)
         |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS from_delta
         |FROM toks, LATERAL unnest(range(1, len(w) - 1)) r(i)
         |WHERE array_to_string(w[i:i+2], ' ') = 'slow hash batch'""".stripMargin,

    // The ledger assertion is deterministic by construction: base and
    // delta1 refreshed, delta2 deliberately left out.
    "q_index_staleness" ->
      """SELECT * FROM (VALUES
        |  ('postings', 'base',   CAST(1 AS INT)),
        |  ('postings', 'delta1', CAST(1 AS INT)),
        |  ('postings', 'delta2', CAST(0 AS INT))) t(kind, segment, covered)""".stripMargin,

    // The sketch is an implementation detail on the Spark side (candidate
    // generation only); the exact-verify pass makes the contract pure SQL.
    "q_heavy_hitters" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) * 1024 > (SELECT count(*) FROM orders)""".stripMargin,

    // Every CMS counter regenerated in HUGEINT splitmix SQL, then the
    // same min-fold — the estimate values themselves are gated, and with
    // them the est >= exact guarantee (overcount would go negative on a
    // hash-family or fold bug and break the hash compare).
    "q_cms_freq" ->
      s"""WITH o AS (SELECT o_custkey AS key FROM orders),
         |js(j) AS (VALUES (0), (1), (2)),
         |cells AS (
         |  SELECT j, (am // 2) % 256 AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT key, j,
         |    ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761 + j")}
         |    FROM o CROSS JOIN js)
         |  GROUP BY 1, 2),
         |pr AS (SELECT t.range AS probe FROM range(1, 201) t),
         |pc AS (
         |  SELECT probe, j, (bm // 2) % 256 AS bucket
         |  FROM (SELECT probe, j,
         |    ${RefQueries.mixSql("b", "probe::HUGEINT * 2654435761 + j")}
         |    FROM pr CROSS JOIN js)),
         |est AS (
         |  SELECT probe, min(coalesce(c.cnt, 0)) AS cms_count
         |  FROM pc LEFT JOIN cells c ON c.j = pc.j AND c.bucket = pc.bucket
         |  GROUP BY 1),
         |ex AS (SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS exact_count
         |       FROM orders GROUP BY 1)
         |SELECT e.probe AS probe_key,
         |  CAST(e.cms_count AS BIGINT) AS cms_count,
         |  coalesce(x.exact_count, 0) AS exact_count,
         |  CAST(e.cms_count - coalesce(x.exact_count, 0) AS BIGINT) AS overcount
         |FROM est e LEFT JOIN ex x ON x.ck = e.probe""".stripMargin,

    // Order statistics and set memberships of both sketches replayed
    // exactly; the union/intersection estimates are the same IEEE op
    // chains on them.
    "q_kmv_join_card" ->
      s"""WITH ah AS (
         |  SELECT DISTINCT (am // 2) AS u
         |  FROM (SELECT
         |    ${RefQueries.mixSql("a", "o_custkey::HUGEINT * 2654435761")}
         |    FROM orders)),
         |ka AS (SELECT u FROM (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rk FROM ah)
         |  WHERE rk <= 64),
         |b0 AS (SELECT c_custkey AS key FROM customer
         |       WHERE c_mktsegment = 'AUTOMOBILE'),
         |bh AS (
         |  SELECT DISTINCT (bm // 2) AS u
         |  FROM (SELECT
         |    ${RefQueries.mixSql("b", "key::HUGEINT * 2654435761")}
         |    FROM b0)),
         |kb AS (SELECT u FROM (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rk FROM bh)
         |  WHERE rk <= 64),
         |m AS (SELECT u FROM (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rk FROM
         |    (SELECT DISTINCT u FROM
         |      (SELECT u FROM ka UNION ALL SELECT u FROM kb)))
         |  WHERE rk <= 64),
         |ms AS (SELECT CAST(count(*) AS BIGINT) AS n_kept_union,
         |              max(u) AS max_u FROM m),
         |cm AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM m
         |       WHERE u IN (SELECT u FROM ka)
         |         AND u IN (SELECT u FROM kb)),
         |ad AS (SELECT DISTINCT o_custkey AS k1 FROM orders),
         |bd AS (SELECT DISTINCT key AS k2 FROM b0),
         |ex AS (SELECT
         |    CAST(count(k1) AS BIGINT) AS exact_a,
         |    CAST(count(k2) AS BIGINT) AS exact_b,
         |    CAST(count(*) AS BIGINT) AS exact_union,
         |    CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
         |        THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
         |  FROM ad FULL JOIN bd ON k1 = k2)
         |SELECT ms.n_kept_union,
         |  CASE WHEN ms.n_kept_union >= 64
         |       THEN CAST(ms.max_u AS BIGINT) END AS kth_union,
         |  CASE WHEN ms.n_kept_union >= 64
         |       THEN 63.0 * (9223372036854775808.0 / CAST(ms.max_u AS DOUBLE))
         |       ELSE CAST(ms.n_kept_union AS DOUBLE) END AS union_est,
         |  cm.n_common,
         |  CASE WHEN ms.n_kept_union > 0
         |       THEN (CAST(cm.n_common AS DOUBLE)
         |             / CAST(ms.n_kept_union AS DOUBLE)) * union_est
         |       ELSE 0.0 END AS inter_est,
         |  ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_inter
         |FROM ms CROSS JOIN cm CROSS JOIN ex""".stripMargin,

    // The k-th order statistic of the distinct hash set, replayed in
    // HUGEINT SQL; the estimate is the same two correctly-rounded IEEE
    // ops (divide, then multiply) on it.
    // Per-segment k-smallest AND the merged row computed from the raw
    // feed — matching them against the Spark side's sketch-only fold IS
    // the mergeable-summary proof.
    "q_kmv_stream" -> {
      val k = 64
      s"""WITH e AS (
         |  SELECT CAST(event_id % 3 AS VARCHAR) AS segment,
         |    user_id AS key
         |  FROM events),
         |m AS (
         |  SELECT DISTINCT segment, (am // 2) AS u
         |  FROM (SELECT segment,
         |    ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761")}
         |    FROM e)),
         |a AS (
         |  SELECT segment, u FROM m
         |  UNION
         |  SELECT 'merged', u FROM m),
         |r AS (
         |  SELECT segment, u, row_number() OVER (
         |    PARTITION BY segment ORDER BY u) AS rk
         |  FROM a),
         |cnt AS (
         |  SELECT segment, CAST(count(*) AS BIGINT) AS n_all
         |  FROM a GROUP BY 1),
         |kth AS (
         |  SELECT segment, CAST(u AS BIGINT) AS kth_hash
         |  FROM r WHERE rk = $k)
         |SELECT c.segment,
         |  CAST(least(c.n_all, $k) AS BIGINT) AS n_kept,
         |  k2.kth_hash,
         |  CASE WHEN k2.kth_hash IS NULL THEN CAST(c.n_all AS DOUBLE)
         |       ELSE ${k - 1}.0 * (9223372036854775808.0
         |              / CAST(k2.kth_hash AS DOUBLE))
         |  END AS est_distinct
         |FROM cnt c
         |LEFT JOIN kth k2 ON k2.segment = c.segment""".stripMargin
    },

    "q_kmv_distinct" ->
      s"""WITH o AS (
         |  SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12
         |           + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS part_month,
         |    o_orderstatus AS status, o_custkey AS key
         |  FROM orders),
         |m AS (
         |  SELECT DISTINCT part_month, status, (am // 2) AS u
         |  FROM (SELECT part_month, status,
         |    ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761")}
         |    FROM o)),
         |r AS (
         |  SELECT part_month, status, u, row_number() OVER (
         |    PARTITION BY part_month, status ORDER BY u) AS rk
         |  FROM m),
         |cnt AS (
         |  SELECT part_month, status, CAST(count(*) AS BIGINT) AS n_all
         |  FROM m GROUP BY 1, 2),
         |kth AS (
         |  SELECT part_month, status, CAST(u AS BIGINT) AS kth_hash
         |  FROM r WHERE rk = 64),
         |ex AS (
         |  SELECT part_month, status,
         |    CAST(count(DISTINCT key) AS BIGINT) AS n_exact
         |  FROM o GROUP BY 1, 2)
         |SELECT c.part_month, c.status,
         |  CAST(least(c.n_all, 64) AS BIGINT) AS n_kept,
         |  k.kth_hash,
         |  CASE WHEN k.kth_hash IS NULL THEN CAST(c.n_all AS DOUBLE)
         |       ELSE 63.0 * (9223372036854775808.0 / CAST(k.kth_hash AS DOUBLE))
         |  END AS est_distinct,
         |  e.n_exact,
         |  est_distinct / CAST(e.n_exact AS DOUBLE) AS est_ratio
         |FROM cnt c
         |LEFT JOIN kth k ON k.part_month = c.part_month AND k.status = c.status
         |JOIN ex e ON e.part_month = c.part_month AND e.status = c.status""".stripMargin,

    "q_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM ev
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id),
        |    '%Y-%m-%d %H:%M:%S') AS valid_to
        |FROM ch""".stripMargin,

    "q_dataset_diff" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text, ${S.tokens("text")} AS w FROM documents),
         |v2 AS (
         |  SELECT doc_id, array_to_string(w[1:40], ' ') AS text2
         |  FROM toks WHERE len(w) >= 20)
         |SELECT coalesce(d.doc_id, v.doc_id) AS doc_id,
         |  CASE WHEN d.doc_id IS NULL THEN 'added'
         |       WHEN v.doc_id IS NULL THEN 'removed'
         |       WHEN v.text2 = d.text THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM documents d FULL JOIN v2 v ON d.doc_id = v.doc_id""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt
        |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT key, cnt, row_number() OVER (ORDER BY cnt, key) AS r,
        |    count(*) OVER () AS n
        |  FROM c),
        |h AS (
        |  SELECT string_agg(key || ':' || cnt, ',' ORDER BY cnt DESC, key DESC)
        |    AS hot_keys
        |  FROM (SELECT key, cnt FROM c ORDER BY cnt DESC, key DESC LIMIT 5)),
        |s AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n_keys,
        |    CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt,
        |    CAST(max(CASE WHEN r = (n + 1) // 2 THEN cnt END) AS BIGINT)
        |      AS p50_cnt,
        |    CAST(max(CASE WHEN r = (99 * n + 99) // 100 THEN cnt END) AS BIGINT)
        |      AS p99_cnt
        |  FROM r)
        |SELECT n_keys, n_rows, max_cnt, p50_cnt, p99_cnt,
        |  CAST(max_cnt // greatest(p50_cnt, 1) AS BIGINT) AS skew_ratio,
        |  hot_keys
        |FROM s CROSS JOIN h""".stripMargin,

    "q_bloom_anti" ->
      """SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (
        |  SELECT doc_id FROM documents WHERE n_chars < 150)""".stripMargin,

    // the salt only changes the physical shuffle; the logical join result
    // is the plain equi-join
    "q_salted_join" ->
      """SELECT o_custkey, c_mktsegment,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    "q_incr_agg" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
        |    AS total_spend
        |FROM orders GROUP BY 1""".stripMargin,

    "q_compaction_plan" ->
      """WITH listing AS (
        |  SELECT source, doc_id % 16 AS shard,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2),
        |binned AS (
        |  SELECT source, shard, bytes,
        |    CAST((sum(bytes) OVER (PARTITION BY source
        |      ORDER BY bytes DESC, shard) - bytes) // 30000 AS BIGINT) AS bin
        |  FROM listing)
        |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes
        |FROM binned GROUP BY 1, 2""".stripMargin,
  )
}
