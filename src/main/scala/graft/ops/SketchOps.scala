package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.BloomExprs

/** Count-min sketch — frequency estimation in fixed space (Cormode &
  * Muthukrishnan 2005), the streaming/scale answer to "how often does key
  * x occur?" when the key universe is too large for an exact groupBy.
  *
  * The sketch is a `d x w` counter grid: row `j` counts keys by hash
  * `h_j(key)`; an estimate reads one counter per row and takes the MIN.
  * Estimates NEVER undercount, and overcount only by colliding keys'
  * mass (<= 2N/w with probability 1 - (1/2)^d) — both properties are
  * deterministic given the hash family, and the family here is the same
  * oracle-replayable splitmix64 chain as the Bloom index
  * ([[graft.expr.BloomBitPos]]), so a DuckDB oracle gates the exact
  * counter values AND the estimate=min fold, not a statistical bound.
  *
  * Scale shape: building is one map-side-combined aggregate whose output
  * is sketch-sized (<= d*w rows) regardless of input rows; estimating is
  * a broadcast join of probe hash coordinates against that frame. No
  * corpus-sized shuffle anywhere — the 100 TB path is the same plan.
  *
  * Both sketches here are STREAMING-READY as-is: each build is a standard
  * keyed aggregate with bounded state by construction, so update-mode
  * structured streaming maintains it over an unbounded feed (streamed ==
  * batch pinned in SketchStreamSpec).
  */
object SketchOps {

  /** Build the `d x w` counter grid over `keyCol`: one row per non-empty
    * `(j, bucket)` cell (empty cells are implicit zeros — the frame stays
    * minimal under skew, `d*w` rows at worst).
    */
  def cmsSketch(df: DataFrame, keyCol: Column, w: Int, d: Int): DataFrame = {
    require(w > 0, s"width must be positive, got $w")
    require(d >= 1 && d <= 16, s"depth must be in [1, 16], got $d")
    val coords = (0 until d).map(j =>
      struct(lit(j).as("j"),
        BloomExprs.bitPos(keyCol.cast("long"), j, w).as("bucket")))
    df.select(explode(array(coords: _*)).as("c"))
      .select(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** KMV (k-minimum-values) distinct sketch, Bar-Yossef et al. 2002: per
    * group, keep the k SMALLEST distinct 63-bit hashes of the key; the
    * k-th smallest `u` estimates the distinct count as
    * `(k-1) * 2^63 / u` (hashes of a set of n distinct keys behave like n
    * uniform draws, so the k-th order statistic sits near `k/n` of the
    * range). Unlike HLL++, every number here is DETERMINISTIC given the
    * hash family — the shared splitmix64 chain — so a DuckDB oracle gates
    * the k-th hash and the estimate bit-for-bit, not an error band.
    *
    * Scale shape: the buffer rides [[graft.agg.TopKByScoreAgg]] (constant
    * score, long id => exact integer k-smallest with set semantics), i.e.
    * standard two-phase hash aggregation — each map task forwards <= k
    * values per group, the shuffle carries groups x k x partitions rows,
    * and sketches MERGE (union of k-smallest is the k-smallest of the
    * union), which is what makes KMV a lake-metadata citizen like the
    * zone map and the Bloom index.
    *
    * Output per group: `n_kept` (min(k, distinct hashes)), `kth_hash`
    * (NULL when the group holds fewer than k distinct hashes — the sketch
    * then IS the exact distinct set) and `est_distinct`.
    */
  def kmvDistinct(
      df: DataFrame, groups: Seq[(String, Column)], keyCol: Column,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")
    require(groups.nonEmpty, "need at least one group column")
    val u = shiftrightunsigned(
      BloomExprs.splitmixHash(keyCol.cast("long"), 0), 1)
    val kmv = col("__kmv")
    val kth = get(kmv, lit(k - 1)).getField("id")
    df.select(groups.map { case (n, c) => c.as(n) } :+ u.as("__u"): _*)
      .groupBy(groups.map { case (n, _) => col(n) }: _*)
      .agg(graft.agg.TopKFunctions.topKByScore(lit(0.0), col("__u"), k)
        .as("__kmv"))
      .select(groups.map { case (n, _) => col(n) } ++ Seq(
        size(kmv).cast("long").as("n_kept"),
        when(size(kmv) >= k, kth).as("kth_hash"),
        when(size(kmv) >= k,
          // division FIRST, then multiply — the oracle runs the same
          // two correctly-rounded IEEE ops in the same order
          lit((k - 1).toDouble) *
            (lit(9223372036854775808.0) / kth.cast("double")))
          .otherwise(size(kmv).cast("double")).as("est_distinct")): _*)
  }

  /** One GLOBAL KMV sketch of `keyCol` as a single-row frame holding the
    * ascending array of the k smallest distinct hashes — the mergeable
    * set-summary form [[kmvIntersect]] combines. One map-side-combined
    * aggregate; the row is k longs no matter the corpus.
    */
  def kmvSetSketch(df: DataFrame, keyCol: Column, k: Int,
      name: String): DataFrame = {
    val u = shiftrightunsigned(
      BloomExprs.splitmixHash(keyCol.cast("long"), 0), 1)
    df.agg(graft.agg.TopKFunctions.topKByScore(lit(0.0), u, k).as("__t"))
      .select(transform(col("__t"), x => x.getField("id")).as(name))
  }

  /** Set-cardinality algebra on KMV sketches (Beyer et al. 2007): from
    * the two k-long summaries ALONE — never re-reading either table —
    * estimate |A ∪ B| and |A ∩ B| distinct keys. The k smallest of
    * K(A) ∪ K(B) is exactly the k smallest hashes of A ∪ B (each side's
    * sketch covers at least up to the union's k-th order statistic), so
    * the union estimate is the same (k-1)·2^63/u_k; the Jaccard estimate
    * is the fraction of those k that BOTH sides kept, and intersection =
    * jaccard × union. This is the optimizer's join-cardinality /
    * overlap-planning primitive: at 100 TB each table contributes one
    * k-long row of lake metadata, and the combine is row-local array
    * arithmetic on a 1×1 cross of two 1-row frames.
    *
    * Every number is deterministic given the hash family — the oracle
    * replays the order statistics and set memberships exactly. Under-k
    * unions degrade to the exact distinct-hash count, like
    * [[kmvDistinct]].
    */
  def kmvIntersect(
      a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")
    val sa = kmvSetSketch(a, keyA, k, "ka")
    val sb = kmvSetSketch(b, keyB, k, "kb")
    val merged = slice(
      array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, k)
    val kth = get(col("__m"), lit(k - 1))
    sa.crossJoin(broadcast(sb)) // 1-row x 1-row sketch combine
      .select(col("ka"), col("kb"), merged.as("__m"))
      .select(
        size(col("__m")).cast("long").as("n_kept_union"),
        when(size(col("__m")) >= k, kth).as("kth_union"),
        when(size(col("__m")) >= k,
          lit((k - 1).toDouble) *
            (lit(9223372036854775808.0) / kth.cast("double")))
          .otherwise(size(col("__m")).cast("double")).as("union_est"),
        size(array_intersect(col("__m"),
          array_intersect(col("ka"), col("kb")))).cast("long")
          .as("n_common"))
      .select(col("n_kept_union"), col("kth_union"), col("union_est"),
        col("n_common"),
        // jaccard uses the KEPT size, so the under-k branch stays exact;
        // empty-input guard keeps the 0/0 double out of the frame
        when(col("n_kept_union") > 0,
          (col("n_common").cast("double") /
            col("n_kept_union").cast("double")) * col("union_est"))
          .otherwise(lit(0.0)).as("inter_est"))
  }

  /** Streaming-maintenance demo of the KMV monoid, driver-gatable: one
    * `(segment, n_kept, kth_hash, est_distinct)` row per feed segment
    * PLUS a `'merged'` row folded from the SEGMENT SKETCHES ALONE — the k
    * smallest of the union of per-segment k-smallest, never re-reading
    * the feed (the fold's input is segments x k hashes, sketch-sized).
    * Because that fold is the KMV monoid, the merged row is bit-identical
    * to the sketch of the whole feed — which is exactly what the oracle
    * computes, so the gate proves the MERGEABLE-SUMMARY LAW itself: the
    * property that lets a stream maintain the sketch per micro-batch
    * (SketchStreamSpec pins streamed == batch over the same feed) and a
    * lake keep one k-long summary per partition that ingest merges
    * instead of rebuilding.
    */
  def kmvSegmented(
      df: DataFrame, segCol: Column, keyCol: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")
    val u = shiftrightunsigned(
      BloomExprs.splitmixHash(keyCol.cast("long"), 0), 1)
    val segs = df.select(segCol.cast("string").as("segment"), u.as("__u"))
      .groupBy(col("segment"))
      .agg(graft.agg.TopKFunctions.topKByScore(lit(0.0), col("__u"), k)
        .as("__t"))
      .select(col("segment"),
        transform(col("__t"), x => x.getField("id")).as("ks"))
    val merged = segs
      .select(explode(col("ks")).as("__u"))
      .agg(graft.agg.TopKFunctions.topKByScore(lit(0.0), col("__u"), k)
        .as("__t"))
      .select(lit("merged").as("segment"),
        transform(col("__t"), x => x.getField("id")).as("ks"))
    def stats(s: DataFrame) = {
      val kth = get(col("ks"), lit(k - 1))
      s.select(col("segment"),
        size(col("ks")).cast("long").as("n_kept"),
        when(size(col("ks")) >= k, kth).as("kth_hash"),
        when(size(col("ks")) >= k,
          lit((k - 1).toDouble) *
            (lit(9223372036854775808.0) / kth.cast("double")))
          .otherwise(size(col("ks")).cast("double")).as("est_distinct"))
    }
    stats(segs).unionByName(stats(merged))
  }

  /** Point-query the sketch for each probe: `est = min_j grid[j][h_j(p)]`
    * (missing cells read 0). `sketch` and `probes` are both tiny, so the
    * whole lookup is broadcast joins.
    */
  def cmsEstimate(
      sketch: DataFrame, probes: DataFrame, probeCol: Column,
      w: Int, d: Int): DataFrame = {
    val coords = (0 until d).map(j =>
      struct(lit(j).as("j"),
        BloomExprs.bitPos(col("probe"), j, w).as("bucket")))
    probes.select(probeCol.cast("long").as("probe"))
      .select(col("probe"), explode(array(coords: _*)).as("c"))
      .select(col("probe"), col("c.j").as("j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
