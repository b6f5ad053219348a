package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.BloomExprs

/** Join utilities for skewed keys at scale.
  *
  * Spark's AQE rewrites skewed SORT-MERGE joins at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`), but only after a stage
  * materializes, only for SMJ/shuffled-hash, and only when one side's
  * partitions exceed the skew thresholds. Explicit salting is the
  * deterministic-plan alternative: spread each hot key over `saltBuckets`
  * reducers by appending a synthetic salt to the join key, replicating the
  * (smaller) other side to every salt value. The result set is IDENTICAL
  * to the plain join for any salt assignment — salt only changes row
  * routing — so correctness never depends on the salt function.
  */
object JoinOps {

  /** Equi-join `skewed` with `other` on `keys`, spreading each key of the
    * skewed side over `saltBuckets` shuffle partitions. `other` is
    * replicated `saltBuckets`x (use the SMALLER side there; replication is
    * the price of de-skewing).
    *
    * The salt is derived from `monotonically_increasing_id()` — stable
    * under task retry (partition-index based), needs no data inspection,
    * and uniform by construction.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    // right/full outer would emit each UNMATCHED replicated `other` row
    // once per salt value — reject join types whose semantics the
    // replication breaks
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val s = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val o = other.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    s.join(o, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Range (interval) join: pair every left POINT with every right range
    * `[start, end)` containing it. A raw `p >= s && p < e` condition gives
    * Spark a BroadcastNestedLoopJoin — O(|L| x |R|) at any scale. This
    * implementation BUCKETS the domain: each range explodes into the
    * `ceil(span / bucketWidth)` buckets it overlaps, points map to one
    * bucket, and a hash equi-join on the bucket id + the exact residual
    * predicate does the rest. Join cost is |L| + |R| x avg-span/width,
    * tunable via `bucketWidth` (pick ~ the typical range span so ranges
    * explode to O(1) buckets).
    *
    * `pointCol`/`startCol`/`endCol` are numeric (cast timestamps to epoch
    * seconds at the call site). Output: all left columns + all right
    * columns, one row per (point, containing range).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"left/right column names collide: $clash")
    val p = left.withColumn("__bk", floor(col(pointCol) / bucketWidth))
    val r = right
      // empty ranges match nothing (and sequence(a, b) with b < a would
      // infer a NEGATIVE step and emit reversed buckets)
      .filter(col(endCol) > col(startCol))
      .withColumn("__bk",
        explode(sequence(
          floor(col(startCol) / bucketWidth),
          // end is exclusive: a range ending exactly on a boundary does
          // not reach the next bucket
          floor((col(endCol) - 1) / bucketWidth))))
    p.join(r, Seq("__bk"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bk")
  }

  /** Point-in-time (as-of) join: for every left row, attach the LATEST
    * right row with `right.tsRight <= left.tsLeft` and equal `keys` — the
    * feature-store / training-snapshot join (no label leakage from the
    * future). Left rows with no earlier right row keep NULLs.
    *
    * Scale shape: a range-condition join in Spark degenerates to a
    * broadcast-nested-loop or a per-key cross product; instead both sides
    * are UNIONED with a side tag and resolved by ONE window pass — a single
    * hash partitioning by `keys`, each row carried exactly once, cost
    * O((|L|+|R|) log per-key-run) with no pair blow-up at any key
    * cardinality or time density.
    *
    * Determinism: window order is (`ts`, side-tag, right payload), so at
    * equal timestamps the right row sorts before the left row it matches
    * (as-of is inclusive) and duplicate right timestamps resolve to the
    * greatest payload tuple — reproducible under any partitioning.
    *
    * Output: all left columns, then `tsRight` and `payloadCols` from the
    * matched right row (names must not collide with left's).
    * `tolerance` (e.g. "3 hours") drops matches older than
    * `left.ts - tolerance`, keeping the left row with NULLs.
    */
  /** Interval-overlap join: pairs of rows whose HALF-OPEN intervals
    * `[start, end)` intersect (`aStart < bEnd && bStart < aEnd`) —
    * concurrent sessions, colliding reservations, overlapping validity
    * windows. A raw inequality-pair predicate plans as a nested-loop
    * join; this buckets the domain like [[rangeJoin]], but with BOTH
    * sides replicated to their covered buckets.
    *
    * The subtlety vs [[rangeJoin]] is duplicate pairs: two long
    * intervals can share many buckets. Rather than a corpus-sized
    * `distinct`, each qualifying pair is emitted ONLY in its canonical
    * bucket — the bucket of `max(aStart, bStart)`, which both sides
    * provably generated (it lies inside each interval) — so every
    * overlapping pair appears exactly once with zero dedup shuffle.
    *
    * `keys` are additional equi-join columns (same name on both sides —
    * e.g. the user whose sessions may overlap); they ride the same hash
    * shuffle as the bucket. All other column names must be disjoint.
    * Bounds are numeric (cast dates/timestamps at the call site); empty
    * intervals (`end <= start`) match nothing. Choose `bucketWidth`
    * near the typical interval length: replication is
    * O(length/width + 1) buckets per row.
    *
    * Skew guard: ONE degenerate interval with `len >> bucketWidth` (a
    * sentinel end like 9999-12-31, a corrupt bound) would fan out to
    * millions of bucket rows at 100 TB — unbounded replication from a
    * single bad record. Any row covering more than `maxBucketsPerRow`
    * buckets fails the job with a `raise_error` naming the offending
    * bounds (the spanDedup posCap discipline: loud refusal beats a
    * silent 10^6× blow-up; widen `bucketWidth` or pre-clamp the data).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerRow: Long = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerRow > 0,
      s"maxBucketsPerRow must be positive, got $maxBucketsPerRow")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(clash.isEmpty, s"non-key column names collide: $clash")
    def buckets(df: DataFrame, s: String, e: String) = {
      val first = floor(col(s) / bucketWidth)
      val last = floor((col(e) - 1) / bucketWidth)
      df.filter(col(e) > col(s))
        .withColumn("__bk", explode(sequence(first,
          when(last - first < maxBucketsPerRow, last).otherwise(raise_error(
            format_string(
              s"intervalJoin: interval [%s, %s) covers more than " +
                s"$maxBucketsPerRow buckets of width $bucketWidth " +
                "(skew guard; widen bucketWidth or clamp the bounds)",
              col(s), col(e))).cast("long")))))
    }
    val l = buckets(left, leftStart, leftEnd)
    val r = buckets(right, rightStart, rightEnd)
    l.join(r, "__bk" +: keys)
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      // canonical-bucket guard: exactly one emission per overlapping pair
      .filter(floor(greatest(col(leftStart), col(rightStart)) / bucketWidth)
        === col("__bk"))
      .drop("__bk")
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsLeft: String,
      tsRight: String,
      payloadCols: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val outNames = tsRight +: payloadCols
    val clash = left.columns.toSet.intersect(outNames.toSet)
    require(clash.isEmpty, s"right output columns collide with left: $clash")

    val payload = struct(outNames.map(col): _*)
    val payloadType = right.select(payload.as("p")).schema("p").dataType
    val leftRest = left.columns.filterNot(keys.contains).toSeq
    val leftTypes = left.schema.map(f => f.name -> f.dataType).toMap

    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(tsLeft).as("__ts"),
        lit(1).as("__tag"),
        lit(null).cast(payloadType).as("__rp")) ++
        leftRest.map(col): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(tsRight).as("__ts"),
        lit(0).as("__tag"),
        payload.as("__rp")) ++
        leftRest.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__rp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val bounded = tolerance.fold(matched) { t =>
      matched.withColumn("__m",
        when(col(s"__m.`$tsRight`") >= col("__ts") - expr(s"INTERVAL $t"), col("__m")))
    }
    bounded.select(
      left.columns.toSeq.map(col) ++
        outNames.map(n => col(s"__m.`$n`").as(n)): _*)
  }

  /** Anti join (`left` minus rows whose `leftKey` appears in
    * `right.rightKey`) pruned by a Bloom sketch of the removal keys — the
    * removal-list shape of a 100 TB dedup-apply pass.
    *
    * A plain `left_anti` join hash-partitions BOTH sides: the entire corpus
    * crosses the wire to meet a removal list that filters out a few
    * percent. Here the removal keys are aggregated once into a Bloom sketch
    * (distributed aggregation — the driver holds only the merged bitmap,
    * sized `expectedItems`/`fpp`), the sketch rides into a row-local
    * codegen'd probe, and:
    *
    *   - rows whose key the sketch DEFINITELY excludes (the vast majority
    *     when the removal fraction is small) are emitted straight from the
    *     scan — zero shuffle;
    *   - only "maybe present" rows (true removals + the `fpp` sliver of
    *     false positives) take the exact anti join, so the shuffle carries
    *     ~`|removals| + fpp × |left|` rows instead of `|left|`.
    *
    * The result is IDENTICAL to the plain anti join for any sketch
    * contents — false positives only route extra rows through the exact
    * check, never change the outcome. NULL keys never equi-match, so they
    * are always kept (the `coalesce` below). Cost note: `left` is scanned
    * twice (columnar scans are cheap; shuffles are not) — at small removal
    * fractions this trades a full-corpus shuffle for a second scan.
    * Spark's own runtime bloom filters (`spark.sql.optimizer.runtime.
    * bloomFilter.enabled`) target selective *inner* join probe sides and do
    * not rewrite anti joins this way.
    *
    * `keys must be BIGINT`-castable; `expectedItems` sizes the sketch (use
    * an upper bound on distinct removal keys; 1M keys at fpp 0.01 ≈ 1.2 MB).
    */
  def bloomAntiJoin(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    // empty removal side -> identity (keep everything). Checked up front:
    // `stat.bloomFilter` over zero rows yields a bloom with a null bit
    // buffer whose probe NPEs at execution. The check reads at most one
    // row of the removal side — negligible against the build it guards.
    if (right.isEmpty) return left
    // build the sketch over an explicit BIGINT view so insertions are
    // `putLong` — the exact probe `mightContainLong` answers
    val bloom = right.select(col(rightKey).cast("long").as(rightKey))
      .stat.bloomFilter(rightKey, expectedItems, fpp)
    val might = coalesce(
      BloomExprs.mightContainLong(col(leftKey).cast("long"), bloom), lit(false))
    val definiteKeep = left.filter(!might)
    val survivors = left.filter(might)
      .join(right.select(col(rightKey)), col(leftKey) === col(rightKey), "left_anti")
    definiteKeep.unionByName(survivors)
  }

  /** Fuzzy entity-matching self-join: all pairs (id1 < id2) whose `strCol`
    * values are within Levenshtein distance 1, via the SymSpell
    * deletion-neighborhood blocking scheme (Garbe's symmetric delete):
    * each string emits the 8-byte hash of itself and of every
    * single-character-deletion variant (≤ len+1 keys). Any two strings
    * within distance 1 share a variant — equal: the string itself; one
    * substitution at i: both delete i; one insert/delete: the longer
    * string deletes the extra char — so candidate generation is COMPLETE
    * and the exact `levenshtein` verify on candidates makes the result
    * identical to the all-pairs predicate join the oracle runs.
    *
    * Scale shape: the candidate join keys on 8-byte hashes (document text
    * never shuffles with the fan-out; strings re-attach by id only for
    * the verify), per-variant fan-in bounds each join bucket, and hash
    * collisions only ADD candidates that the verify then drops. The
    * all-pairs formulation is O(n²) levenshtein evals; this is
    * O(n·len + candidates). Distance k>1 needs C(len,k) variants — k=1 is
    * the scheme's sweet spot; band wider distances with [[rangeJoin]]-style
    * length buckets instead.
    */
  def fuzzySelfPairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
    val cand = fuzzyCandidatePairs(df, idCol, strCol)
    cand
      .join(base.select(col("__id").as("id1"), col("__s").as("__s1")), "id1")
      .join(base.select(col("__id").as("id2"), col("__s").as("__s2")), "id2")
      .withColumn("dist", levenshtein(col("__s1"), col("__s2")))
      .filter(col("dist") <= 1)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** The candidate stage of [[fuzzySelfPairs]] alone — every id pair
    * sharing a deletion-variant key under `hashFn` (default: xxhash64,
    * the production throughput family; pass
    * [[graft.ops.DedupOps.portableShingleHash]] for the ANSI-replayable
    * family, the q_dedup_minhash_portable discipline). Collisions only
    * ADD candidates; the verify in [[fuzzySelfPairs]] drops them.
    */
  def fuzzyCandidatePairs(
      df: DataFrame, idCol: String, strCol: String,
      hashFn: Column => Column = c => xxhash64(c)): DataFrame = {
    val s = col("__s")
    val base = df.select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
    // itself + every single-deletion variant, hashed; distinct (id, key):
    // duplicate chars yield identical variants
    val keyed = base.select(col("__id"),
      explode(array_union(
        array(hashFn(s)),
        when(length(s) > 0,
          transform(sequence(lit(1), length(s)),
            i => hashFn(concat(
              s.substr(lit(1), i - 1),
              s.substr(i + 1, length(s) - i)))))
          .otherwise(array().cast("array<bigint>")))).as("__vh"))
      .distinct()
    keyed.as("a").join(keyed.as("b"),
        col("a.__vh") === col("b.__vh") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
      .distinct()
  }

  /** Blocking-scheme quality report — the three numbers every record-
    * linkage deployment reads before trusting a candidate generator:
    * reduction ratio (how much of the n²/2 comparison space the
    * blocking avoided), pairs completeness (recall of the true matches
    * inside the candidate set — blocking's ONLY irrecoverable error),
    * and pairs quality (candidate precision, what the verify stage will
    * pay per true match). Computed for the [[fuzzyCandidatePairs]]
    * deletion-neighborhood scheme against a caller-supplied truth pair
    * set (`truePairs`: `id1 < id2`, the candidate orientation).
    *
    * All three land exactly on the ×10⁶ grid — counts are exact longs
    * off one left join + fold, and every intdiv numerator is
    * nonnegative (direction-proof). `total_pairs = n·(n−1) DIV 2`
    * (contract `n < 3·10⁹`). Degenerate inputs (no rows, no truth, no
    * candidates) yield NULLs, not division errors.
    *
    * Scale shape: the candidate generator is the variant-key equi-join
    * (never all-pairs); the metrics add one candidate-keyed left join
    * and three 1-row frames crossed at the end (the q_erasure audit
    * shape).
    *
    * Output: `(n_rows, total_pairs, n_cand, n_true, n_matched,
    * rr_micro, pc_micro, pq_micro)`.
    */
  def blockingEval(
      df: DataFrame, idCol: String, strCol: String,
      truePairs: DataFrame,
      hashFn: Column => Column = c => xxhash64(c)): DataFrame = {
    val nRow = df.agg(count(col(idCol)).as("n_rows"))
    val tp = truePairs.select(
      col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"),
      lit(1L).as("__tp"))
    val candM = fuzzyCandidatePairs(df, idCol, strCol, hashFn)
      .join(tp, Seq("id1", "id2"), "left")
      .agg(count(lit(1)).as("n_cand"),
        coalesce(sum(col("__tp")), lit(0L)).as("n_matched"))
    val nTrue = tp.agg(count(lit(1)).as("n_true"))
    candM.crossJoin(nTrue).crossJoin(nRow)
      .select(
        col("n_rows"),
        expr("n_rows * (n_rows - 1) DIV 2").as("total_pairs"),
        col("n_cand"), col("n_true"), col("n_matched"),
        when(col("n_rows") > 1L, lit(1000000L) -
          expr("(1000000 * n_cand) DIV (n_rows * (n_rows - 1) DIV 2)"))
          .as("rr_micro"),
        when(col("n_true") > 0L,
          expr("(1000000 * n_matched) DIV n_true")).as("pc_micro"),
        when(col("n_cand") > 0L,
          expr("(1000000 * n_matched) DIV n_cand")).as("pq_micro"))
  }
}
