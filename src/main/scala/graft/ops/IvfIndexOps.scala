package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.VectorExprs

/** PERSISTED IVF index with incremental maintenance — the lake-metadata
  * story [[LakeOps.bloomPartitionIndex]] gives scan pruning, extended to
  * ANN: a trained index living on disk that a daily ingest APPENDS to
  * without retraining, matching FAISS's add-after-train contract
  * (`IndexIVFFlat.train` once, `add` forever, retrain only when the
  * quantizer drifts off the data).
  *
  * Everything rides the integer lattice ([[LatticeKmeans]]), so the whole
  * lifecycle — training on the base corpus, assignment of every appended
  * segment, probe ranking, final top-k — is exact integer arithmetic that
  * replays bit-for-bit in SQL: the incremental index is FULLY oracled
  * (`q_sim_ivf_incremental`), not rows-only.
  *
  * On-disk layout under `indexPath`:
  *   - `centroids/` — k rows `(cid INT, qc ARRAY<BIGINT>)`, the trained
  *     coarse quantizer. Written once by [[build]]; never touched by
  *     [[append]] (that is what makes the merge cheap AND what makes
  *     drift possible — hence [[driftReport]]).
  *   - `lists/` — the inverted lists, parquet PARTITIONED BY `cid`:
  *     `(corpus_id BIGINT, qv ARRAY<BIGINT>, cn2 BIGINT, segment STRING)`.
  *     [[append]] writes new segment files into the same partition dirs
  *     (pure file adds — no rewrite of existing list data, the FAISS
  *     `add` shape). Probes join on `cid`, so Spark's dynamic partition
  *     pruning reads only the probed lists' bytes — nprobe/k of the
  *     index, the IVF bargain realized at the STORAGE layer.
  *   - `stats/` — per-(segment, cid) assignment stats
  *     `(segment STRING, cid INT, n BIGINT, sum_dist2 BIGINT)`, appended
  *     by build and every append. Exact integers, mergeable by sum.
  *
  * Scale shape: build/append scan their corpus ONCE with the fused
  * [[graft.expr.LatticeArgmin]] assignment pass (centroid matrix as one
  * reference object); the only shuffle is the partitionBy(cid) write and
  * the k-group stats aggregate (map-side combined). Probe = broadcast
  * query side, candidates-only join against DPP-pruned list partitions,
  * partial top-k aggregate. Nothing corpus-sized ever reaches the driver.
  */
object IvfIndexOps {

  /** Train the coarse quantizer and lay down the base index.
    *
    * `trainOn` defaults to the corpus itself; pass a subset to train on a
    * sample (the FAISS idiom for huge corpora) or, in tests, to rebuild
    * the lists of a union corpus under the ORIGINAL quantizer — the
    * rebuild [[append]] must equal.
    */
  def build(
      corpus: DataFrame,
      indexPath: String,
      nLists: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainOn: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = LatticeKmeans.train(
      trainOn.getOrElse(corpus), nLists, iters, idCol, vecCol)
    cents.zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cid", "qc")
      .write.mode("errorifexists").parquet(s"$indexPath/centroids")
    writeSegment(corpus, cents, indexPath, "base", first = true,
      idCol, vecCol)
  }

  /** Append a delta corpus to an existing index WITHOUT retraining:
    * assign under the persisted centroids, add files to the list
    * partitions, append the segment's stats. Existing list data is never
    * rewritten.
    */
  def append(
      delta: DataFrame,
      indexPath: String,
      segment: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    require(segment != "base", "segment name 'base' is reserved for build")
    val cents = readCentroids(delta.sparkSession, indexPath)
    writeSegment(delta, cents, indexPath, segment, first = false,
      idCol, vecCol)
  }

  /** IVF/L2 top-k over the persisted index — identical search semantics
    * to [[LatticeKmeans.ivfTopK]] (exact integer dist2, (dist2, id)
    * ties), but the corpus side comes from the `lists/` files, so the
    * scan is pruned to the probed partitions.
    */
  def probe(
      queries: DataFrame,
      indexPath: String,
      k: Int,
      nprobe: Int,
      queryId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val cents = readCentroids(spark, indexPath)
    if (cents.isEmpty)
      return spark.emptyDataFrame.select(
        lit(null).cast("long").as("query_id"),
        lit(null).cast("int").as("rank"),
        lit(null).cast("long").as("corpus_id"),
        lit(null).cast("long").as("dist2")).limit(0)
    require(nprobe >= 1 && nprobe <= cents.length,
      s"need 1 <= nprobe <= ${cents.length}, got $nprobe")
    val lists = spark.read.parquet(s"$indexPath/lists")
      .select(col("corpus_id"), col("qv").cast("array<double>").as("cv"),
        col("cn2"), col("cid"))
    def centDist2(qd: org.apache.spark.sql.Column,
        n2: org.apache.spark.sql.Column, c: Array[Long]) =
      n2 + lit(c.map(x => x * x).sum) -
        lit(2L) * VectorExprs.vecDot(qd, typedLit(c.map(_.toDouble))).cast("long")
    val probeStructs = cents.zipWithIndex.map { case (c, j) =>
      struct(centDist2(col("__qd"), col("qn2"), c).as("d2"), lit(j).as("j"))
    }
    val qFrame = queries.select(
      col(queryId).cast("long").as("query_id"),
      LatticeKmeans.quantize(col(vecCol)).cast("array<double>").as("__qd"))
      .withColumn("qn2",
        VectorExprs.vecDot(col("__qd"), col("__qd")).cast("long"))
      .filter(col("qn2").isNotNull)
      .select(col("query_id"), col("__qd"), col("qn2"),
        explode(slice(array_sort(array(probeStructs.toIndexedSeq: _*)), 1, nprobe))
          .as("__p"))
      .select(col("query_id"), col("__qd").as("qvq"), col("qn2"),
        col("__p.j").as("cid"))
    val scored = lists.join(broadcast(qFrame), "cid")
      .withColumn("dist2",
        col("cn2") + col("qn2") -
          lit(2L) * VectorExprs.vecDot(col("cv"), col("qvq")).cast("long"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.agg.TopKFunctions.topKByScore(
        -col("dist2").cast("double"), col("corpus_id"), k).as("__topk"))
      .select(col("query_id"),
        posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("corpus_id"),
        (-col("__hit.score")).cast("long").as("dist2"))
  }

  /** Quantizer-drift monitor: per segment, exact mean assignment cost vs
    * the base segment's, flagged when it exceeds `num/den` times the base
    * (rational bound — the comparison is pure integer algebra:
    * `sum_dist2 * base_n * den > num * base_sum * n`). A true flag is the
    * "retrain me" signal FAISS leaves to the operator: appended data no
    * longer resembles what the quantizer was trained on, so its lists are
    * unbalanced and probe recall is decaying.
    */
  def driftReport(
      spark: SparkSession,
      indexPath: String,
      num: Long = 2L,
      den: Long = 1L): DataFrame = {
    val seg = spark.read.parquet(s"$indexPath/stats")
      .groupBy(col("segment"))
      .agg(sum(col("n")).as("n"), sum(col("sum_dist2")).as("sum_dist2"))
    val base = seg.filter(col("segment") === "base")
      .select(col("n").as("base_n"), col("sum_dist2").as("base_sum"))
    // cross-multiplied comparison in DECIMAL(38,0): sum_dist2 can sit
    // near 2^55 * rows, so the 3-way long product would overflow (ANSI
    // throws); decimal keeps the compare exact
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    seg.crossJoin(broadcast(base)) // 1-row base side
      .select(col("segment"), col("n"), col("sum_dist2"),
        (dec(col("sum_dist2")) * dec(col("base_n")) * lit(den) >
          lit(num) * dec(col("base_sum")) * dec(col("n"))).as("needs_retrain"))
  }

  private def readCentroids(
      spark: SparkSession, indexPath: String): Array[Array[Long]] =
    spark.read.parquet(s"$indexPath/centroids")
      .orderBy(col("cid"))
      .collect() // k rows — the k-bounded centroid-frame pattern
      .map(_.getSeq[Long](1).toArray)

  private def writeSegment(
      vecs: DataFrame,
      cents: Array[Array[Long]],
      indexPath: String,
      segment: String,
      first: Boolean,
      idCol: String,
      vecCol: String): Unit = {
    val mode = if (first) "errorifexists" else "append"
    val asg =
      if (cents.isEmpty)
        // empty quantizer (corpus had no non-null vectors): lay down the
        // schema so later appends/probes still read coherently
        vecs.select(col(idCol).cast("long").as("corpus_id"),
          lit(null).cast("array<bigint>").as("qv"),
          lit(null).cast("long").as("cn2"),
          lit(null).cast("int").as("cid")).limit(0)
      else {
        val qv = LatticeKmeans.quantize(col(vecCol))
        vecs.select(
          col(idCol).cast("long").as("corpus_id"),
          qv.as("qv"),
          VectorExprs.vecDot(qv.cast("array<double>"), qv.cast("array<double>"))
            .cast("long").as("cn2"),
          LatticeKmeans.packed(qv, cents).as("__p"))
          .filter(col("__p").isNotNull)
          .select(col("corpus_id"), col("qv"), col("cn2"),
            col("__p").bitwiseAND(255L).cast("int").as("cid"),
            shiftright(col("__p"), 8).as("__dist2"))
      }
    val withSeg = asg.withColumn("segment", lit(segment))
    withSeg.select("corpus_id", "qv", "cn2", "segment", "cid")
      .write.mode(mode).partitionBy("cid").parquet(s"$indexPath/lists")
    val stats =
      if (cents.isEmpty)
        withSeg.sparkSession.emptyDataFrame.select(
          lit(segment).as("segment"), lit(null).cast("int").as("cid"),
          lit(null).cast("long").as("n"),
          lit(null).cast("long").as("sum_dist2")).limit(0)
      else withSeg.groupBy(col("segment"), col("cid"))
        .agg(count(lit(1)).as("n"), sum(col("__dist2")).as("sum_dist2"))
    stats.write.mode(mode).parquet(s"$indexPath/stats")
  }
}
