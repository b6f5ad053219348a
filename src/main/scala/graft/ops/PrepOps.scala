package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sample preparation operators: token-window chunking, bucketed
  * sequence packing, and int8 embedding quantization. All row-local or
  * single-bounded-shuffle shapes — the last mile between a cleaned corpus
  * and model-ready samples.
  */
object PrepOps {

  /** Split each document into overlapping token windows of `chunkSize`
    * tokens with stride `chunkSize - overlap` (the RAG/pretraining chunk
    * convention; the final chunk may be shorter). One row per chunk:
    * `(doc_id, chunk_idx, chunk_text, n_tokens)`.
    *
    * Row-local UDTF shape: chunk starts computed per row with `sequence`,
    * one `explode` emits the windows — no shuffle at any corpus size.
    */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks)
    // chunk i starts at i*stride (0-based); i ranges over [0, (n-1)/stride]
    val lastIdx = floor((n - 1).cast("double") / stride).cast("int")
    docs
      .filter(n > 0)
      .select(col(idCol).as("doc_id"), toks.as("__toks"),
        explode(sequence(lit(0), lastIdx)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Greedy sequence packing: assign documents to fixed-token-budget packs
    * by running token count, independently within `buckets` hash-style
    * buckets. Output: `(doc_id, bucket, pack_id, n_tokens)` where
    * `pack_id = floor(tokens_before_this_doc_in_bucket / budget)`.
    *
    * True bin packing is NP-hard and inherently sequential; greedy-by-order
    * within a bucket is the standard streaming approximation, and the
    * BUCKETING is what makes it scale: each bucket's running sum is an
    * independent window over its own partition (one shuffle by bucket,
    * `buckets`-way parallel — a single global cumulative sum would
    * serialize the corpus through one partition).
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Int,
      buckets: Int): DataFrame = {
    require(budgetTokens > 0 && buckets > 0)
    val nTok = TextOps.tokenCount(col(textCol)).cast("long")
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol).as("doc_id"),
        pmod(col(idCol), lit(buckets.toLong)).as("bucket"),
        nTok.as("n_tokens"))
      .withColumn("pack_id",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budgetTokens).cast("long"))
      .select(col("doc_id"), col("bucket"), col("pack_id"), col("n_tokens"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * `127 / max|x|` (1.0 for all-zero vectors), elements
    * `round(x * scale)` in [-127, 127]. Cuts embedding storage 4x for
    * ANN/near-dup work at recall cost bounded by the per-element error
    * `<= max|x|/254` (dequantization spec-tested). Row-local, no shuffle.
    */
  def quantizeInt8(
      vecs: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val m = array_max(transform(vd, x => abs(x)))
    val s = when(m > 0, lit(127.0) / m).otherwise(lit(1.0))
    vecs
      .select(col(idCol).as("vec_id"), vd.as("__v"), s.as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("__v"), x => round(x * col("scale")).cast("int")).as("qvec"))
  }

  /** Per-group z-score standardization of an integer fixed-point column —
    * the tabular-feature scaling step (fit on the corpus, apply row-local).
    * Population std via `E[x²] − E[x]²` from exact int64 sums: the three
    * group aggregates (n, Σx, Σx²) are reduction-order-proof integers, and
    * the float tail (two divisions, one multiply-subtract, one sqrt, one
    * normalize) is a fixed chain of correctly-rounded IEEE ops — so scores
    * are bit-portable across engines and partitionings. Groups with zero
    * variance (or one row) emit z = 0. Σx² headroom: |cents| ≤ 3·10⁶ holds
    * to ~10⁹ rows per group in int64; beyond that, sum DECIMAL(38,0).
    *
    * Scale shape: one map-side-combined group aggregate produces the
    * GROUP-sized stats frame, broadcast-joined back; the apply side is a
    * pure row-local map — the fit/apply split every feature pipeline
    * wants at 100 TB.
    * Output: (id, group, cents, z).
    */
  def standardizeByGroup(
      df: DataFrame,
      idCol: Column,
      groupCol: Column,
      centsCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), groupCol.as("group"),
      centsCol.as("cents"))
    val stats = base.groupBy(col("group"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("cents")).as("__s"),
        sum(col("cents") * col("cents")).as("__sq"))
      .select(col("group"),
        (col("__s").cast("double") / col("__n")).as("__mean"),
        sqrt(col("__sq").cast("double") / col("__n") -
          (col("__s").cast("double") / col("__n")) *
          (col("__s").cast("double") / col("__n"))).as("__std"))
    base.join(broadcast(stats), "group")
      .select(col("id"), col("group"), col("cents"),
        when(col("__std") > 0,
          (col("cents").cast("double") - col("__mean")) / col("__std"))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Deterministic negative sampling over a DENSE id domain [0, N) —
    * k pseudo-random non-matching partners per document for contrastive
    * training pairs, with no RNG state: negative j of id d is
    * `(d·2654435761 + j·40503 + 104729) mod N`, bumped by one (mod N)
    * on self-collision. Fully ROW-LOCAL after a 1-row (count, min, max)
    * attach — no join against the corpus, no shuffle of it; layout-
    * reproducible like every hash-driven sampler here
    * ([[graft.ops.SamplingOps.hashKeep]] discipline).
    *
    * The dense-domain contract (min = 0, max = N−1) is CHECKED, not
    * assumed: a gap would alias negatives onto missing ids, so the 1-row
    * frame carries the bounds and any violation fails loudly via
    * raise_error. Sparse-id corpora should pass through a dense-rank
    * re-index first.
    *
    * Output: (id, j, neg_id), j in [0, k).
    */
  def negativeSamples(df: DataFrame, idCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ids = df.select(idCol.cast("long").as("id"))
    val bounds = ids.agg(count(lit(1)).as("__n"), min(col("id")).as("__lo"),
      max(col("id")).as("__hi"))
    val dense = col("__lo") === 0L && col("__hi") === col("__n") - 1L
    val raw = pmod(col("id") * 2654435761L + col("j") * 40503L + 104729L,
      col("__n"))
    ids.crossJoin(broadcast(bounds))
      .select(col("id"),
        explode(sequence(lit(0L), lit(k.toLong - 1L))).as("j"),
        col("__n"), col("__lo"), col("__hi"))
      .withColumn("__raw",
        when(dense, raw).otherwise(raise_error(format_string(
          "negativeSamples: id domain not dense [0, N): n=%s min=%s max=%s" +
            " — re-index with a dense rank first",
          col("__n"), col("__lo"), col("__hi"))).cast("long")))
      .select(col("id"), col("j"),
        when(col("__raw") === col("id"),
          pmod(col("__raw") + 1L, col("__n"))).otherwise(col("__raw"))
          .as("neg_id"))
  }

  /** Curriculum ordering with ROUND-ROBIN source interleave: rank docs
    * within each source by descending score, then place rank r of source
    * s at global position (r−1)·|sources| + idx(s) — the best document
    * of every source leads, sources alternate, and quality decays down
    * the curriculum. The arithmetic position is what makes this scale:
    * a direct global ORDER BY (rank, source) would funnel the corpus
    * through one partition, while here the only corpus-sized work is the
    * per-source rank window; the position is a row-local formula against
    * a broadcast sources-frame index. Positions are a SPARSE total order
    * (a source exhausted early leaves its residue of slots empty) —
    * consumers sort by position, which any engine does identically on
    * exact integers.
    *
    * Output: (id, source, rank, position).
    */
  def curriculumInterleave(
      df: DataFrame,
      idCol: Column,
      sourceCol: Column,
      scoreCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), sourceCol.as("source"),
      scoreCol.as("__score"))
    val wRank = Window.partitionBy(col("source"))
      .orderBy(col("__score").desc, col("id"))
    // sources-sized frame: a window over dozens of rows, then broadcast
    val srcIdx = base.select(col("source")).distinct()
      .withColumn("__idx",
        (row_number().over(Window.orderBy(col("source"))) - 1).cast("long"))
      .withColumn("__nsrc",
        count(lit(1)).over(Window.partitionBy()).cast("long"))
    base
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .join(broadcast(srcIdx), "source")
      .select(col("id"), col("source"), col("rank"),
        ((col("rank") - 1L) * col("__nsrc") + col("__idx")).as("position"))
  }

  /** Quantile normalization against a FROZEN reference distribution —
    * map each value onto the distribution described by `refBoundaries`
    * (B+1 ascending quantile boundaries of the reference, e.g. an
    * offline-profiled quality-score distribution), preserving each
    * value's rank within its group. This is the production shape: the
    * reference is a constant artifact (like [[bpeEncode]]'s frozen
    * merges), so the corpus-scale apply is one rank window + a
    * ROW-LOCAL piecewise-linear interpolation — no global sort, no
    * corpus-sized lookup join. (An EXACT corpus-global quantile map
    * would need a total order over 100 TB; freezing the reference is
    * how real pipelines sidestep exactly that.)
    *
    * Portability: p = (rank−1)/(n_g−1) is one exact-integer-fed
    * division; the interpolation `lo + (p·B − i)·(hi − lo)` is a fixed
    * chain of correctly-rounded IEEE ops over literal boundaries —
    * bit-portable. Ties take distinct ranks (ordered by the unique id),
    * matching row_number semantics on any engine. Groups with one row
    * map to the reference minimum (p = 0 by convention).
    *
    * Output: (id, group, x, p, qnorm).
    */
  def quantileNormalizeRef(
      df: DataFrame,
      idCol: Column,
      groupCol: Column,
      xCol: Column,
      refBoundaries: Seq[Double]): DataFrame = {
    require(refBoundaries.size >= 2, "need >= 2 reference boundaries")
    require(refBoundaries == refBoundaries.sorted,
      s"reference boundaries must ascend: $refBoundaries")
    val b = refBoundaries.size - 1
    val w = Window.partitionBy(col("group")).orderBy(col("x"), col("id"))
    val wn = Window.partitionBy(col("group"))
    // bucket i = min(floor(p·B), B−1); interpolate inside [bnd_i, bnd_i+1]
    val p = when(col("__n") === 1L, lit(0.0))
      .otherwise((col("__rk") - 1L).cast("double") /
        (col("__n") - 1L).cast("double"))
    val pos = col("p") * b
    val idx = least(floor(pos).cast("int"), lit(b - 1))
    val lo = element_at(lit(refBoundaries.toArray), idx + 1)
    val hi = element_at(lit(refBoundaries.toArray), idx + 2)
    df.select(idCol.as("id"), groupCol.as("group"), xCol.as("x"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("p", p)
      .select(col("id"), col("group"), col("x"), col("p"),
        (lo + (pos - idx.cast("double")) * (hi - lo)).as("qnorm"))
  }

  /** Adjacent-symbol pair counts over the corpus' words with characters as
    * the initial symbols — round one of BPE vocabulary induction. Pure
    * explode + groupBy: counting occurrences directly equals the classic
    * distinct-word-times-frequency formulation.
    */
  def bpePairCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs
      .select(explode(TextOps.tokens(lower(textCol))).as("w"))
      .select(explode(TextOps.ngramsOfTokens(TextOps.chars(col("w")), 2)).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))

  /** BPE merge training: `merges` rounds of "count adjacent symbol pairs,
    * merge the most frequent" (ties broken lexicographically — fully
    * deterministic) over the corpus vocabulary. Returns the learned merge
    * rules in order.
    *
    * Scale shape: the corpus is read ONCE to build the distinct-word
    * frequency table (the classic BPE trainer input); each round is one
    * small groupBy over that table — `vocab x avg-word-length` pair rows,
    * independent of corpus size — plus a row-local regex merge. Like
    * [[graft.ops.IvfOps.trainCentroids]], the driver holds only the
    * argmax per round, never data.
    */
  def bpeTrain(
      docs: DataFrame,
      textCol: Column,
      merges: Int): Seq[(String, String)] = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    var words = docs
      .select(explode(TextOps.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat_ws(" ", TextOps.chars(col("w"))).as("sym"), col("freq"))
      .cache()
    val out = List.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < merges && !done) {
      val top = words
        .select(explode(TextOps.ngramsOfTokens(split(col("sym"), " "), 2)).as("p"),
          col("freq"))
        .groupBy(col("p")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("p"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        out += ((a, b))
        // merge every full-symbol occurrence of "a b" left-to-right
        // (lookarounds keep symbol boundaries; non-overlapping regex
        // replacement IS the BPE merge convention)
        val target = java.util.regex.Pattern.quote(s"$a $b")
        val repl = java.util.regex.Matcher.quoteReplacement(a + b)
        val next = words.withColumn("sym",
          regexp_replace(col("sym"), s"(?<=^|\\s)$target(?=\\s|$$)", repl))
          .cache()
        next.count() // materialize before dropping the previous round
        words.unpersist()
        words = next
      }
      round += 1
    }
    words.unpersist()
    out.result()
  }

  /** [[bpeTrain]] with the merge loop run DRIVER-LOCAL on the collected
    * word-frequency table: the corpus contributes exactly ONE
    * `tokens -> groupBy(word)` pass (the same shuffle shape as
    * [[bpeTrain]]'s first step — bounded by vocabulary, not corpus,
    * size), and every merge round is then a few ms over the in-memory
    * vocab instead of a full Spark job round trip (8 rounds cost ~3 s of
    * pure scheduling at any data size). This is how production BPE
    * trainers work (count distributed, merge locally): the word-freq
    * table for even a 100 TB corpus is vocabulary-bounded.
    * `maxVocab` guards the collect. Identical output to [[bpeTrain]]
    * (same counts, same (count desc, pair asc) tie-break, same
    * left-to-right non-overlapping replacement) — differential-tested.
    */
  def bpeTrainLocal(
      docs: DataFrame,
      textCol: Column,
      merges: Int,
      maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    val rows = docs
      .select(explode(TextOps.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect()
    require(rows.length <= maxVocab,
      s"vocabulary ${rows.length} exceeds maxVocab=$maxVocab")
    // word -> (symbol sequence, freq); symbols start as code points
    val words = rows.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + cc)
        i += cc
      }
      (syms, r.getLong(1))
    }
    val out = List.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < merges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, freq) =>
        var j = 0
        while (j < syms.length - 1) {
          counts.merge((syms(j), syms(j + 1)), freq, (a, b) => a + b)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax count; ties by the space-joined pair string ascending —
        // bpeTrain's orderBy(n DESC, p ASC)
        var best: (String, String) = null
        var bestN = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val p = e.getKey
          if (e.getValue > bestN ||
            (e.getValue == bestN && s"${p._1} ${p._2}" < s"${best._1} ${best._2}")) {
            best = p; bestN = e.getValue
          }
        }
        out += best
        var wi = 0
        while (wi < words.length) {
          val syms = words(wi)._1
          var j = 0
          var w = 0
          // in-place left-to-right non-overlapping merge
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              syms(w) = best._1 + best._2; j += 2
            } else {
              syms(w) = syms(j); j += 1
            }
            w += 1
          }
          syms.remove(w, syms.length - w)
          wi += 1
        }
      }
      round += 1
    }
    out.result()
  }

  /** Apply a trained BPE merge list to every document: lowercased
    * whitespace tokens -> subword pieces (token order preserved). The
    * row-local encode is [[graft.expr.BpeEncode]] — merges ship as a
    * plan literal (tokenizers train once, apply at corpus scale), so a
    * 100 TB tokenization pass is a pure map with zero shuffles.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    graft.expr.BpeExprs.bpeEncode(TextOps.tokens(lower(text)), merges)

  /** Deterministic training-order shuffle: assign each row to one of
    * `shards` by an affine id map salted per epoch, then rank within the
    * shard by (`orderCol`, id). Returns (id, shard, rank).
    *
    * This is how you "globally shuffle" 100 TB for training without a
    * global sort: shards are the parallel unit (scale `shards` with the
    * corpus so one shard = one training file), the only shuffle is the
    * shard partitioning, and each shard sorts locally — a global
    * `orderBy(rand())` would be a full-corpus range sort AND
    * layout-dependent. Pass a content key (e.g. [[TextOps.fingerprint]])
    * as `orderCol` for a reproducible pseudo-random order, and a new
    * `salt` per epoch for a different permutation each epoch.
    */
  def trainingOrder(
      df: DataFrame,
      idCol: Column,
      orderCol: Column,
      shards: Int,
      salt: Long): DataFrame = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col("id"))
    df.select(idCol.cast("long").as("id"), orderCol.as("__ord"))
      .withColumn("shard",
        pmod(col("id") * 104729L + lit(salt), lit(shards.toLong)))
      .select(col("id"), col("shard"),
        row_number().over(w).cast("long").as("rank"))
  }

  /** (shift, mask) schedule that spreads a 31-bit value over the even bit
    * positions of a long (the standard Morton bit-twiddle — 5 mask-shift
    * rounds instead of a 31-term per-bit loop). Shared verbatim by the
    * Column form and the SQL-oracle twin so the two engines compute the
    * identical arithmetic.
    */
  private[graft] val spreadMasks: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  private def spreadBits(c: Column): Column =
    spreadMasks.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (v, (s, m)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** 2-D Z-order (Morton) clustering key: interleaves the low 31 bits of
    * `x` (even positions) and `y` (odd positions) into one nonnegative
    * long, so sorting by the key gives space-filling-curve locality —
    * rows close in BOTH dimensions land in the same file/row-group, and a
    * 2-D range predicate prunes to a few contiguous key ranges instead of
    * one stripe per distinct x (what a lexicographic (x, y) sort gives).
    * This is the layout-optimization key behind lakehouse `OPTIMIZE
    * ZORDER BY`: at 100 TB the win is at the SCAN — min/max file
    * statistics on the key skip files for bbox-style queries on (lat,
    * lon), (partkey, suppkey), ... Pure codegen'd bit arithmetic
    * (5 mask-shift rounds per side), zero shuffles; the sort that USES
    * the key is a separate, explicit `repartitionByRange`/`sortWithinPartitions`.
    *
    * Inputs are masked to [0, 2^31): callers quantize doubles to
    * nonnegative grid indices first (e.g. `floor((lat+90)/cell)`).
    */
  def zorderKey(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** SQL twin of [[zorderKey]] (same mask schedule, engine-portable
    * integer ops) — used by the DuckDB oracle.
    */
  def zorderKeySql(x: String, y: String): String = {
    def spread(c: String): String =
      spreadMasks.foldLeft(s"(CAST($c AS BIGINT) & 2147483647)") {
        case (e, (s, m)) => s"(($e | ($e << $s)) & $m)"
      }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  /** 2-D Hilbert clustering key: the space-filling curve WITHOUT the
    * Morton key's diagonal jumps (consecutive curve positions are grid
    * neighbors), so 2-D boxes split into fewer contiguous key runs in
    * aggregate — fewer files touched for the same bbox predicates
    * (PrepOpsSpec measures total runs across a box sweep: Hilbert <
    * Morton). Inputs masked to `[0, 2^order)`; the walk itself is the
    * codegen'd [[graft.expr.HilbertIndex]].
    */
  def hilbertKey(x: Column, y: Column, order: Int = 16): Column =
    graft.expr.HilbertIndex.hilbertIndex(x.cast("long"), y.cast("long"), order)

  /** SQL twin of [[hilbertKey]] as a COMPLETE query: the per-level walk
    * unrolled as a chain of MATERIALIZED CTEs, one per bit level. The
    * chain must materialize — expressed as lateral aliases or plain
    * subqueries, each level's 3-4 references to the previous level's
    * state columns let the optimizer inline the whole walk into one
    * expression tree that grows ~4^order (measured: the 16-level inline
    * form never finishes; the materialized chain runs in milliseconds).
    * `carry` columns pass through untouched; the index lands in
    * `keyAlias`.
    */
  def hilbertKeySqlQuery(
      x: String,
      y: String,
      from: String,
      carry: Seq[String],
      keyAlias: String,
      order: Int = 16): String = {
    val mask = (1L << order) - 1
    val cs = carry.mkString(", ")
    val init =
      s"""hh0 AS MATERIALIZED (
         |  SELECT $cs,
         |    (CAST($x AS BIGINT) & $mask) AS hx0,
         |    (CAST($y AS BIGINT) & $mask) AS hy0,
         |    CAST(0 AS BIGINT) AS hacc0
         |  FROM $from)""".stripMargin
    val levels = (0 until order).map { i =>
      val s = 1L << (order - 1 - i)
      s"""hh${i + 1} AS MATERIALIZED (
         |  SELECT $cs,
         |    CASE WHEN (hy$i & $s) = 0 THEN
         |      (CASE WHEN (hx$i & $s) != 0 THEN $s - 1 - hy$i ELSE hy$i END)
         |    ELSE hx$i END AS hx${i + 1},
         |    CASE WHEN (hy$i & $s) = 0 THEN
         |      (CASE WHEN (hx$i & $s) != 0 THEN $s - 1 - hx$i ELSE hx$i END)
         |    ELSE hy$i END AS hy${i + 1},
         |    hacc$i + $s * $s * xor(
         |      3 * (CASE WHEN (hx$i & $s) != 0 THEN 1 ELSE 0 END),
         |      CASE WHEN (hy$i & $s) != 0 THEN 1 ELSE 0 END) AS hacc${i + 1}
         |  FROM hh$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $init,
       |$levels
       |SELECT $cs, hacc$order AS $keyAlias FROM hh$order""".stripMargin
  }

  /** 2-D Pareto frontier (skyline query, Börzsönyi et al. ICDE'01) —
    * the rows no other row strictly dominates under (minimize `cost`,
    * maximize `gain`): the curation readout "best quality at every
    * budget" (token budget vs classifier margin, latency vs recall,
    * price vs size). Dominance is the standard strict form: `a` beats
    * `b` iff `cost_a <= cost_b AND gain_a >= gain_b` with at least one
    * strict; exact-tie rows (equal cost AND gain) dominate nothing and
    * all survive.
    *
    * Scale shape — the naive skyline is an all-pairs NOT EXISTS (the
    * oracle, where quadratic cost is the completeness proof's job); the
    * engine plan is three bounded steps: (1) ONE map-side-combined
    * `groupBy(cost) -> max(gain)` collapses the corpus to a
    * distinct-cost frame (value-domain-sized, not corpus-sized); (2) the
    * running strictly-cheaper max rides the two-phase bucketed prefix
    * scan (the [[graft.ops.ExperimentOps]] rank-stat /
    * lateDataReport shape — until round 9 this was a SinglePartition
    * window over the whole distinct-cost frame): per-bucket maxima
    * collapse map-side, the cross-bucket prefix max is a window over the
    * BUCKET-count-sized frame (broadcast back), and the within-bucket
    * strictly-cheaper max (`RANGE .. 1 PRECEDING`, so equal costs never
    * see each other) runs partitioned by bucket; (3) winning
    * `(cost, gain)` pairs broadcast back as a semi-join. The corpus is
    * scanned twice and never globally sorted.
    *
    * Inputs must be integral (exact comparisons); returns the input rows
    * on the frontier.
    */
  def paretoFrontier(df: DataFrame, cost: Column, gain: Column): DataFrame = {
    val tagged = df.withColumn("__cost", cost.cast("long"))
      .withColumn("__gain", gain.cast("long"))
      .filter(col("__cost").isNotNull && col("__gain").isNotNull)
    val byCost = tagged.groupBy(col("__cost"))
      .agg(max(col("__gain")).as("__best"))
      .withColumn("__pb", expr("__cost DIV 4096"))
    val crossBucket = Window.orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bpre = byCost.groupBy(col("__pb"))
      .agg(max(col("__best")).as("__bmax"))
      .withColumn("__prevBucketMax", max(col("__bmax")).over(crossBucket))
      .select(col("__pb"), col("__prevBucketMax"))
    val inBucket = Window.partitionBy(col("__pb")).orderBy(col("__cost"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = byCost.join(broadcast(bpre), "__pb")
      // greatest() skips NULLs: first value in the first bucket sees
      // NULL/NULL and survives unconditionally, like the old global form
      .withColumn("__cheaperBest", greatest(
        col("__prevBucketMax"), max(col("__best")).over(inBucket)))
      .filter(col("__cheaperBest").isNull ||
        col("__best") > col("__cheaperBest"))
      .select(col("__cost"), col("__best").as("__gain"))
    tagged.join(broadcast(frontier), Seq("__cost", "__gain"), "left_semi")
      .drop("__cost", "__gain")
  }
}
