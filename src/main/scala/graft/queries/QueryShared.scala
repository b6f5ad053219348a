package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ComponentStore, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

/** Shared fixtures, memoized frames, and oracle-SQL builders used by
  * the domain query catalogs (mechanically extracted from the former
  * 10k-line PipelineQueries in round 9 — entry text moved verbatim,
  * behavior unchanged).
  */
private[queries] object QueryShared {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** TPC-H revenue in exact fixed point: cents x (100 - discount
    * basis-points). Integer products sum merge-order-proof; divide by
    * 10000 AFTER the aggregate. One definition — the parity-critical
    * formula must not drift between the queries that share it.
    */
  def revU: Column =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  /** Demo lexicon for `q_quality_classifier` — stands in for an
    * offline-trained linear model's weight vector (content terms positive,
    * filler/degenerate markers negative). Fixed integers so the margin is
    * exact on any engine; the oracle rebuilds the same table as VALUES.
    */
  val qualityLexicon: Map[String, Long] = Map(
    "data" -> 3L, "query" -> 2L, "table" -> 2L, "join" -> 2L,
    "spark" -> 3L, "stream" -> 2L, "column" -> 1L, "group" -> 1L,
    "the" -> 1L, "a" -> -1L, "slow" -> -5L, "small" -> -2L,
    "big" -> -2L, "value" -> -1L, "row" -> -1L)

  /** Frozen BPE merge table for `q_bpe_encode` — the output of
    * [[graft.ops.PrepOps.bpeTrainLocal]](documents, text, 32) on the
    * sf0.01 corpus, then FROZEN as literals. This mirrors production:
    * tokenizers are trained once offline and shipped as a constant
    * artifact; the corpus-scale operation is the apply. Freezing also
    * gives the apply a DuckDB oracle ([[bpeEncodeOracle]]) — the trainer
    * itself stays gated by `q_bpe_pairs` and PrepOpsSpec differentials.
    */
  val bpeFrozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"))

  /** Evaluation term set for `q_mrr` — eight frozen query terms drawn
    * from the corpus vocabulary; relevance is "term appears in the
    * document's first three tokens" (a label independent of the
    * term-frequency ranking signal, so the metric is non-degenerate).
    */
  val MrrTerms: Seq[String] = Seq(
    "vector", "stream", "window", "filter", "merge", "batch", "scan",
    "column")

  /** 10^6/rank pre-rounded once (rank 1..10) — the reciprocal-rank gain
    * table, identical literals in the engine plan and the oracle SQL
    * (the q_ndcg discipline: no division inside the aggregate).
    */
  val MrrGainMicro: Seq[Long] = (1 to 10).map(i => math.round(1e6 / i))

  /** Shared candidate frame for the retrieval-eval pair (`q_mrr`,
    * `q_map_eval`): one corpus scan exploded over the 8 literal terms,
    * pruned to term-matching rows (`tf > 0`) BEFORE any shuffle, with
    * the relevance label row-local.
    */
  def mrrCandidates(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(lower(col("text")))
    t(s, dir, "documents")
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(array(MrrTerms.map(lit): _*)).as("term"))
      .withColumn("tf",
        size(filter(col("tk"), x => x === col("term"))).cast("long"))
      .filter(col("tf") > 0L)
      .withColumn("rel",
        array_contains(slice(col("tk"), 1, 3), col("term")))
      .select(col("doc_id"), col("term"), col("tf"), col("rel"))
  }

  /** The eval pair's shared ranking: per-term tf-desc with doc_id
    * tie-break — MUST stay one definition so the two metrics rank
    * identically.
    */
  def mrrRank: Column = row_number().over(
    Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id")))

  /** The literal 8-term frame both eval queries left-join so termless
    * queries keep a zero row. */
  def mrrTermsDf(s: SparkSession): DataFrame =
    s.createDataFrame(MrrTerms.map(Tuple1(_))).toDF("term")

  /** Soft-dedup weights (1/cluster_size in micro units) over the 3-gram
    * Jaccard near-dup components — shared by `q_dedup_weights` (the
    * per-doc frame) and `q_ess_weights` (its effective-sample-size fold)
    * so the weight definition cannot drift between them.
    */
  def dedupWeightsFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupOps.ngramJaccardPairs(
      docs, "doc_id", "text", k = 3, threshold = 0.2)
    val comp = GraphOps.componentsOf(docs, "doc_id", pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component"))
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("cluster_size"),
        expr("1000000 DIV cluster_size").as("weight_micro"))
  }

  /** The Gopher-style quality rule bundle as four 0/1 columns
    * (word-count bounds, mean-word-length window, symbol ratio, stopword
    * presence) — shared by `q_gopher_rules` and the `q_judge_agreement`
    * kappa so the rater definition cannot drift between them. Every
    * threshold is an exact integer cross-product; the token-length fold
    * is the codegen'd expression (see expr/TokenExprs).
    */
  def gopherRules: (Column, Column, Column, Column) = {
    val toks = TextOps.tokens(lower(col("text")))
    val nW = size(toks).cast("long")
    val sumLen = graft.expr.TokenExprs.tokenLengthSum(toks)
    val nC = TextOps.charCount(col("text")).cast("long")
    val nP = TextOps.punctCount(col("text")).cast("long")
    val stops = TextOps.stopwordHits(col("text"),
      Seq("the", "a", "of", "and", "to", "in", "is", "it"))
    ((nW >= 3 && nW <= 50).cast("int"),
      (nW > 0 && sumLen >= nW && sumLen * 10 <= nW * 45).cast("int"),
      (nP * 10 <= nC).cast("int"),
      (stops >= 1).cast("int"))
  }

  /** Session-scoped memo for the two canonical graph edge tables: the
    * heaviest graph queries each used to rebuild the same
    * project→explode→distinct edge list from scratch (`q_triangles`/
    * `q_communities`/`q_modularity` the co-occurrence pairs;
    * `q_pagerank`/`q_pagerank_dangling`/`q_kcore` the order-line
    * customer-supplier join), so a catalog run paid the build five
    * times. The memo persists the frame ONCE per (session, input dir)
    * and every later query reads the materialized cache — the
    * `writeBucketedIfAbsent` write-once-read-many amortization, in
    * memory. Keys hold the session reference, so a stopped session's
    * entries are never revived; robustness sweeps (empty/nulled/skewed
    * dirs) key separately by dir. Results are unchanged — only the
    * number of times the identical build executes.
    */
  /** Component-store artifact shared by the artifact-riding dedup
    * queries (weights / ESS / apply / k-fold): built ONCE per
    * (session, sf dir) through the segment lifecycle (even base + odd
    * delta) and reused from DISK — riding a PERSISTED artifact is these
    * queries' semantics (the expensive clustering happened at ingest),
    * so rebuilding the store inside every rider would mis-price exactly
    * the cost the artifact amortizes (measured: 13-21 s/query at sf0.1
    * rebuilt, ~1 s riding). q_components_refresh deliberately does NOT
    * share it: that query prices the lifecycle itself (fresh store,
    * build + append + idempotent re-run).
    */
  val componentStoreMemo =
    scala.collection.mutable.HashMap.empty[(SparkSession, String), String]

  def componentStore(s: SparkSession, dir: String): String =
    componentStoreMemo.synchronized {
      componentStoreMemo.filterInPlace { case ((sess, _), _) =>
        !sess.sparkContext.isStopped }
      componentStoreMemo.getOrElseUpdate((s, dir), {
        val docs = t(s, dir, "documents")
        val store = java.nio.file.Files
          .createTempDirectory("graft_comp_shared_").toString
        ComponentStore.refresh(docs.filter(col("doc_id") % 2 === 0), store, "base")
        ComponentStore.refresh(docs.filter(col("doc_id") % 2 =!= 0), store, "delta1")
        store
      })
    }

  val edgeMemo =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), DataFrame]

  def memoized(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val key = (s, dir, tag)
    val hit = edgeMemo.synchronized {
      // evict entries pinned to STOPPED sessions on every access: a
      // long-lived JVM that creates many sessions (suite runners) must
      // not accumulate dead session references + persisted frames
      edgeMemo.filterInPlace { case ((sess, _, _), _) =>
        !sess.sparkContext.isStopped }
      edgeMemo.get(key)
    }
    hit.getOrElse {
      // build OUTSIDE the lock (this is minutes of Spark work); if two
      // threads raced to build the same key, the loser unpersists its
      // copy instead of orphaning it
      val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize once; consumers start from the cache
      edgeMemo.synchronized {
        edgeMemo.get(key) match {
          case Some(winner) => df.unpersist(blocking = false); winner
          case None => edgeMemo.put(key, df); df
        }
      }
    }
  }

  /** Part co-occurrence edges (parts bought in the same order),
    * generated ROW-LOCALLY from each order's sorted part set — shared by
    * `q_triangles`, `q_communities`, and `q_modularity` (one definition;
    * see q_triangles' plan note for the measured rationale), built once
    * per session+dir via [[memoized]].
    */
  def partCooccurrenceEdges(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "part_cooccurrence") {
      val ps = col("ps")
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(ps,
          (x, i) => transform(slice(ps, i + 2, size(ps)),
            y => struct(x.cast("long").as("u"), y.cast("long").as("v"))))))
          .as("p"))
        .select(col("p.u"), col("p.v")).distinct()
    }

  /** The 4-round LPA labels over [[partCooccurrenceEdges]], memoized:
    * shared by `q_communities` (the partition itself) and `q_modularity`
    * (its quality score) so the iterative rounds run once per
    * session+dir.
    */
  def partCommunities(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "part_communities_r4") {
      GraphOps.labelPropagation(partCooccurrenceEdges(s, dir), "u", "v",
        rounds = 4)
    }

  /** Customer-supplier interaction pairs from the orders-lineitem join,
    * on the disjoint even/odd node encoding (customers 2k, suppliers
    * 2k+1) — shared by `q_pagerank`, `q_pagerank_dangling`, and
    * `q_kcore`, built once per session+dir via [[memoized]]. Kept raw
    * (with multiplicities): each consumer applies its own distinct.
    */
  def custSuppPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "cust_supp") {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * lit(2L)).as("cust"),
          (col("l_suppkey") * lit(2L) + lit(1L)).as("supp"))
    }

  /** Run-time export of float-trained model state into the oracle
    * catalog. [[IvfOps.trainCentroids]] is DETERMINISTIC (xxhash64
    * seeding, fixed-point Lloyd sums — layout-invariant by construction,
    * spec-pinned), so the centroids a query trains are a pure function
    * of the input tables; exporting them as exact shortest-repr double
    * literals (which round-trip bit-for-bit through SQL text) lets the
    * DuckDB oracle re-derive EVERYTHING DOWNSTREAM of training —
    * assignment argmax, probe selection, candidate cosine, closure —
    * upgrading `q_sim_ivf_topk`/`q_semdedup` from rows-only checks to
    * hash-gated ones. Training itself remains the un-oracled half
    * (unchanged trade, now confined to exactly that stage). `Verify`
    * runs every query BEFORE dumping `oracleSql`, so the export is
    * always populated in the driver's correctness pass; when the
    * queries have not run (or a dev subset excluded them) the dynamic
    * entries are simply absent and the pair degrades to its old
    * rows-only status.
    */
  object TrainedExport {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
    def put(key: String, c: Array[Array[Double]]): Array[Array[Double]] = {
      cache.put(key, c); c
    }
    def get(key: String): Option[Array[Array[Double]]] = Option(cache.get(key))
  }

  /** Shared daily series for the trend pair (`q_ols_trend`,
    * `q_theilsen`): per (event_type, day) mean value in cents —
    * `sum div count`, nonnegative toward-zero on both engines — with
    * x = days since the table's literal epoch (2024-01-01, TESTDATA's
    * fixed event window) so the regression moments' ×10^6 products stay
    * far inside int64 at any scale factor.
    */
  def trendDaily(s: SparkSession, dir: String): DataFrame =
    RefQueries.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type").as("g"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("x"))
      .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
        .as("y"))

  // ------------------------------------------------------------ oracle SQL

  val S = TextOps.Sql

  /** Shared daily-series CTE for the trend-pair oracles — mirrors
    * [[trendDaily]]: per (event_type, day) mean cents (`//` with
    * nonnegative operands = Spark `div`), x anchored to the literal
    * 2024-01-01 epoch.
    */
  val trendDailySql: String =
    """d AS (
      |  SELECT event_type AS g,
      |    CAST(date_diff('day', DATE '2024-01-01', dt) AS BIGINT) AS x, y
      |  FROM (
      |    SELECT event_type, CAST(ts AS DATE) AS dt,
      |      CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*)
      |        AS BIGINT) AS y
      |    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |    GROUP BY event_type, CAST(ts AS DATE)))""".stripMargin

  /** Unrolled integer-PageRank recurrence over the cust<->supp trade
    * graph — mirrors [[graft.ops.GraphOps.pageRank]]'s fixed-point
    * arithmetic step for step. DuckDB `//` and Spark `div` are both
    * truncating integer division for the nonnegative operands here, and
    * all sums are integer sums, so the two engines agree bit for bit; the
    * iteration count is a literal because SQL has no loop — each round is
    * its own CTE reading the previous one.
    */
  /** Unrolled HITS replay: per round an authority aggregate + 1-row max
    * normalize, then the hub half — mirrors [[GraphOps.hits]] exactly
    * (scale 2^20; `//` operands nonnegative, so either DuckDB division
    * semantics matches Java's toward-zero `div`).
    */
  def hitsOracle(iters: Int): String = {
    val scale = 1L << 20
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.dst AS node, CAST(sum(h.v) AS BIGINT) AS v
         |  FROM eraw e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst),
         |a$i AS (SELECT node,
         |  CAST(v * $scale // (SELECT max(v) FROM ar$i) AS BIGINT) AS v
         |  FROM ar$i),
         |hr$i AS (SELECT e.src AS node, CAST(sum(a.v) AS BIGINT) AS v
         |  FROM eraw e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
         |h$i AS (SELECT node,
         |  CAST(v * $scale // (SELECT max(v) FROM hr$i) AS BIGINT) AS v
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS src,
       |    CAST(2 * l_suppkey + 1 AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS (SELECT src AS node FROM eraw UNION SELECT dst FROM eraw),
       |h0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes),
       |$rounds
       |SELECT n.node, coalesce(h.v, 0) AS hub_fp, coalesce(a.v, 0) AS auth_fp
       |FROM nodes n
       |LEFT JOIN h$iters h ON h.node = n.node
       |LEFT JOIN a$iters a ON a.node = n.node""".stripMargin
  }

  def pageRankOracle(iters: Int, dangling: Boolean = false): String = {
    // per round: optional dangling share d$i (sum of the previous ranks
    // over nodes with no out-edges, integer-divided by n), then the rank
    // recurrence — mirrors GraphOps.pageRank(redistributeDangling = ...)
    val rounds = (1 to iters).map { i =>
      val shareCte =
        if (dangling)
          s"""d$i AS (SELECT coalesce(sum(rank), 0) // (SELECT n FROM p) AS share
             |  FROM r${i - 1} WHERE node NOT IN (SELECT src FROM deg)),
             |""".stripMargin
        else ""
      val contrib =
        if (dangling) s"(coalesce(s.s, 0) + (SELECT share FROM d$i))"
        else "coalesce(s.s, 0)"
      s"""${shareCte}r$i AS (SELECT n.node,
         |  (SELECT base FROM p) + (85 * $contrib) // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.rank // d.outdeg) AS s
         |    FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    // customers 2k, suppliers 2k+1: disjoint at any scale (an additive
    // offset merges nodes once keys outgrow it — and the shared encoding
    // would hide that from the hash compare)
    val eraw =
      """eraw AS (
        |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS src,
        |    CAST(2 * l_suppkey + 1 AS BIGINT) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""".stripMargin
    val edges =
      if (dangling) "edges AS (SELECT src, dst FROM eraw)"
      else "edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw)"
    s"""WITH $eraw,
       |$edges,
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |p AS (SELECT CAST(1000000000000 AS BIGINT) // count(*) AS init,
       |  (CAST(1000000000000 AS BIGINT) // count(*)) * 15 // 100 AS base,
       |  CAST(count(*) AS BIGINT) AS n
       |  FROM nodes),
       |r0 AS (SELECT node, (SELECT init FROM p) AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r$iters""".stripMargin
  }

  /** Seeded (personalized) PageRank replay — the [[pageRankOracle]]
    * recurrence with teleport mass restricted to the seed set: init and
    * base are `scale/|seeds|`-derived on seeds and 0 elsewhere.
    */
  def pprOracle(seeds: Seq[Long], iters: Int): String = {
    val seedList = seeds.distinct.sorted.mkString("(", ", ", ")")
    val nSeeds = seeds.distinct.length
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |  (CASE WHEN n.node IN $seedList THEN (SELECT base FROM p)
         |        ELSE 0 END) + (85 * coalesce(s.s, 0)) // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.rank // d.outdeg) AS s
         |    FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS src,
       |    CAST(2 * l_suppkey + 1 AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |p AS (SELECT CAST(1000000000000 AS BIGINT) // $nSeeds AS init,
       |  (CAST(1000000000000 AS BIGINT) // $nSeeds) * 15 // 100 AS base),
       |r0 AS (SELECT node,
       |  CASE WHEN node IN $seedList THEN (SELECT init FROM p)
       |       ELSE CAST(0 AS BIGINT) END AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r$iters""".stripMargin
  }

  /** DuckDB twin of [[GraphOps.kCoreNodes]]: the same `rounds`
    * synchronous Matula-Beck peel rounds, unrolled (degree aggregate ->
    * keep-set -> edge restriction per round), over the identical
    * canonical simple-graph edge list. Any rounds at or past fixpoint
    * yields the true k-core in both engines, so the unroll depth only
    * has to MATCH the Spark side, which it does by construction.
    */
  def kCoreSql(k: Int, rounds: Int): String = {
    // AS MATERIALIZED: each round's CTEs are referenced 2-3x; inlining
    // would re-expand the whole prefix per reference (3^rounds parquet
    // scans — observed as a "too many open files" blow-up at rounds=8).
    val peels = (0 until rounds).map { i =>
      s"""d${i + 1} AS MATERIALIZED (SELECT node, count(*) AS n FROM (
         |  SELECT u AS node FROM e$i UNION ALL SELECT v FROM e$i) GROUP BY node),
         |k${i + 1} AS MATERIALIZED (SELECT node FROM d${i + 1} WHERE n >= $k),
         |e${i + 1} AS MATERIALIZED (SELECT u, v FROM e$i
         |  WHERE u IN (SELECT node FROM k${i + 1})
         |    AND v IN (SELECT node FROM k${i + 1}))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT
       |    least(CAST(2 * o_custkey AS BIGINT), CAST(2 * l_suppkey + 1 AS BIGINT)) AS u,
       |    greatest(CAST(2 * o_custkey AS BIGINT), CAST(2 * l_suppkey + 1 AS BIGINT)) AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |$peels
       |SELECT node, CAST(n AS BIGINT) AS degree FROM (
       |  SELECT node, count(*) AS n FROM (
       |    SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
       |  GROUP BY node) WHERE n >= $k""".stripMargin
  }

  /** DuckDB twin of [[GraphOps.labelPropagation]] on the part
    * co-occurrence graph: the same `rounds` synchronous label updates,
    * unrolled (neighbor-label count -> per-node argmax with the
    * identical ties-to-smallest-label rule), MATERIALIZED against
    * exponential CTE inlining as [[kCoreSql]].
    */
  def lpaSql(
      rounds: Int,
      extraCtes: String = "",
      finalSelect: String = null): String = {
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT b.node, l.label, count(*) AS cnt
         |  FROM bid b JOIN l${i - 1} l ON b.nbr = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |      PARTITION BY node ORDER BY cnt DESC, label) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val fin = Option(finalSelect).getOrElse(
      s"SELECT node, CAST(label AS BIGINT) AS label FROM l$rounds")
    s"""WITH it AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS item
       |  FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.item AS u, b.item AS v
       |  FROM it a JOIN it b
       |    ON a.l_orderkey = b.l_orderkey AND a.item < b.item),
       |bid AS MATERIALIZED (
       |  SELECT u AS node, v AS nbr FROM e0
       |  UNION ALL SELECT v, u FROM e0),
       |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM bid),
       |$steps$extraCtes
       |$fin""".stripMargin
  }

  /** [[lpaSql]] extended with the modularity closing algebra of
    * [[graft.ops.GraphOps.modularity]]: the same exact integer rational
    * Σ(4·m·e_c − d_c²) / 4m² over the round-`rounds` LPA labels.
    */
  def modularitySql(rounds: Int): String = {
    val num = "sum(4 * (SELECT m FROM mm) * coalesce(ec, 0) - dc * dc)"
    lpaSql(rounds,
      extraCtes = s""",
        |lab AS MATERIALIZED (SELECT node, label FROM l$rounds),
        |mm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
        |le AS MATERIALIZED (
        |  SELECT la.label AS la, lb.label AS lb
        |  FROM e0 JOIN lab la ON e0.u = la.node
        |          JOIN lab lb ON e0.v = lb.node),
        |intra AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS ec
        |          FROM le WHERE la = lb GROUP BY la),
        |degc AS (SELECT label, CAST(count(*) AS BIGINT) AS dc FROM (
        |  SELECT la AS label FROM le UNION ALL SELECT lb FROM le)
        |  GROUP BY label)""".stripMargin,
      finalSelect = s"""SELECT (SELECT m FROM mm) AS m_edges,
        |  CAST($num AS BIGINT) AS q_num,
        |  CAST($num AS DOUBLE) /
        |    (4.0 * (SELECT m FROM mm) * (SELECT m FROM mm)) AS q
        |FROM degc LEFT JOIN intra USING (label)""".stripMargin)
  }

  /** DuckDB twin of the literal-centroid IVF search (q_sim_ivf_literal):
    * per-vector dots against the K=4 inlined centroids, sequential-CASE
    * argmax for the corpus assignment (ties -> lowest cid, matching the
    * struct-max tie-break in [[IvfOps.assignmentCol]]), the query's
    * second probe as the argmax over the complement, then the standard
    * cosine + window top-k over candidates from the probed lists only.
    */
  /** An exact double literal for oracle SQL. A bare decimal like
    * `0.19102453383572876` is typed DECIMAL by DuckDB, and its
    * decimal-to-double conversion computes int/10^scale in double
    * arithmetic — DOUBLE-ROUNDED, up to 1 ulp off the correctly-rounded
    * parse of the same digits (found via q_pca_project, whose projected
    * scores expose the literal dot directly; the assignment-only users
    * are ulp-robust but ride the same fix). The string cast routes
    * through the correctly-rounded parser, so the shortest-repr
    * round-trip is bit-exact. */
  def dlit(d: Double): String = s"CAST('$d' AS DOUBLE)"

  /** Literal-centroid dot product in DuckDB: the K centroid weight lists
    * are inlined, the fold order matches [[SimilarityOps.Sql.dot]].
    */
  def dotLit(c: Array[Double]): String = {
    val ws = c.map(dlit).mkString("[", ", ", "]")
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(" +
      s"range(1, len(embedding) + 1), i -> CAST(embedding[i] AS DOUBLE) * ($ws)[i])), " +
      s"(acc, v) -> acc + v)"
  }

  /** Sequential-CASE argmax over `d<i>` columns; ties -> lowest cid,
    * matching the struct-max tie-break in [[IvfOps.assignmentCol]].
    */
  def argmaxSql(ids: Seq[Int]): String =
    ids.init.zipWithIndex.map { case (c, idx) =>
      val rest = ids.drop(idx + 1)
      s"WHEN ${rest.map(r => s"d$c >= d$r").mkString(" AND ")} THEN $c"
    }.mkString("CASE ", " ", s" ELSE ${ids.last} END")

  def ivfLiteralOracle: String = {
    val cents = IvfOps.literalCentroids(4, 64)
    def argmax(ids: Seq[Int]): String = argmaxSql(ids)
    val all = 0 until 4
    val p2 = all.map(p =>
      s"WHEN $p THEN ${argmax(all.filterNot(_ == p))}")
      .mkString("CASE p1 ", " ", " END")
    val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
    s"""WITH a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
        .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmax(all)} AS cid FROM a),
       |qp AS (SELECT vec_id, embedding, d0, d1, d2, d3,
       |         ${argmax(all)} AS p1
       |       FROM a WHERE vec_id < 10),
       |q AS (SELECT vec_id, embedding, p1, $p2 AS p2 FROM qp)
       |SELECT query_id, rank, corpus_id, cosine FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cos DESC, c.vec_id) AS rank
       |  FROM q JOIN c ON c.cid IN (q.p1, q.p2)
       |  WHERE $cos IS NOT NULL)
       |WHERE rank <= 10""".stripMargin
  }

  /** DuckDB twin of centroid-parameterized SemDeDup: inlined-centroid
    * argmax assignment, within-cluster cosine pairs at the threshold,
    * then min-label transitive closure via a recursive CTE
    * (reach(node, r) holds "r reaches node"; min(r) per node is the
    * component's min id — exactly [[graft.ops.GraphOps.componentsOf]]).
    * Serves both the frozen-literal variant (q_semdedup_literal) and —
    * since round 8 — the TRAINED variant (q_semdedup), whose centroids
    * arrive from the engine's deterministic training via
    * [[TrainedExport]] as exact shortest-repr double literals.
    */
  def semDedupCentroidOracle(
      cents: Array[Array[Double]], threshold: Double): String = {
    val cos = SimilarityOps.Sql.cosine("x.embedding", "y.embedding")
    s"""WITH RECURSIVE a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
        .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmaxSql(cents.indices)} AS cid FROM a),
       |p AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM c x JOIN c y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE $cos >= $threshold),
       |e AS (SELECT id_a AS u, id_b AS v FROM p
       |      UNION ALL SELECT id_b, id_a FROM p),
       |reach(node, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node)
       |SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS rep_id,
       |       CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS INT) AS keep
       |FROM reach GROUP BY node""".stripMargin
  }

  def semDedupLiteralOracle: String =
    semDedupCentroidOracle(IvfOps.literalCentroids(4, 64), 0.35)

  /** DuckDB twin of the float IVF cosine search under ARBITRARY centroid
    * literals at any k/nprobe — the q_sim_ivf_literal machinery
    * generalized for the trained export: per-vector dots against every
    * inlined centroid, sequential-CASE argmax for the corpus assignment
    * (ties -> lowest cid, matching [[IvfOps.assignmentCol]]), the
    * query's nprobe probe set by (dot DESC, cid) row_number (matching
    * [[IvfOps.probesCol]]'s struct-sort tie-break), then the standard
    * candidates-only cosine + window top-k.
    */
  def ivfCentroidOracle(
      cents: Array[Array[Double]], nprobe: Int, topK: Int): String = {
    val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
    val probeBranches = cents.indices.map(i =>
      s"      SELECT vec_id, embedding, $i AS pcid, d$i AS d FROM a " +
        s"WHERE vec_id < 10").mkString("\n      UNION ALL\n")
    s"""WITH a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
        .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmaxSql(cents.indices)} AS cid FROM a),
       |pr AS (
       |  SELECT vec_id, embedding, pcid FROM (
       |    SELECT vec_id, embedding, pcid, row_number()
       |      OVER (PARTITION BY vec_id ORDER BY d DESC, pcid) AS prn
       |    FROM (
       |$probeBranches))
       |  WHERE prn <= $nprobe)
       |SELECT query_id, rank, corpus_id, cosine FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cos DESC, c.vec_id) AS rank
       |  FROM pr q JOIN c ON c.cid = q.pcid
       |  WHERE $cos IS NOT NULL)
       |WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB twin of the portable-family MinHash pipeline at any
    * geometry: the shingle hashes, the affine permutation constants, the
    * band keys, and the verify arithmetic are generated from the SAME
    * Scala constants as the Spark side
    * ([[graft.ops.DedupOps.portablePerm]]), so the whole
    * MinHash -> banded LSH -> exact-Jaccard-verify path hash-compares.
    * `verified = false` stops at the DISTINCT candidate pairs
    * (q_dedup_minhash); `true` adds the exact-Jaccard verification
    * (q_dedup_minhash_verified at 32/8/4, q_dedup_minhash_portable at
    * 16/4/4).
    */
  def minhashPortableOracle(
      numHashes: Int, bands: Int, rowsPerBand: Int,
      verified: Boolean): String = {
    val p = DedupOps.PortableHashPrime
    val k = 3
    require(bands * rowsPerBand <= numHashes)
    val shingle = s"array_to_string(w[i:i+${k - 1}], ' ')"
    val hash = s"CAST(('0x' || substring(md5($shingle), 1, 15)) AS BIGINT) % $p"
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).map { r =>
        val (a, bb) = DedupOps.portablePerm(b * rowsPerBand + r)
        s"CAST(list_min(list_transform(hs, x -> (x * $a + $bb) % $p)) AS VARCHAR)"
      }.mkString(" || ',' || ")
      s"  SELECT doc_id, $b AS band,\n    $key AS bkey FROM sh"
    }.mkString("\n  UNION ALL\n")
    val base =
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(w) - ${k - 2}), i -> $hash)) AS hs
         |  FROM toks WHERE len(w) >= $k),
         |bands AS (
         |$bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin
    if (!verified) s"$base\nSELECT id_a, id_b FROM cand"
    else
      s"""$base,
         |v AS (
         |  SELECT id_a, id_b,
         |    CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS intersection,
         |    CAST(len(a.hs) AS BIGINT) AS n_a, CAST(len(b.hs) AS BIGINT) AS n_b
         |  FROM cand JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b)
         |SELECT id_a, id_b, intersection, n_a, n_b,
         |  CAST(intersection AS DOUBLE)/(n_a + n_b - intersection) AS jaccard
         |FROM v
         |WHERE CAST(intersection AS DOUBLE)/(n_a + n_b - intersection) >= 0.2""".stripMargin
  }

  /** Shared CTE body for the PQ oracles: per-vector subspace distances
    * to every literal-codebook centroid (`d` — the same expressions serve
    * as the corpus argmin input AND the query lookup table), codes via a
    * lowest-on-ties CASE argmin, and the ADC distance as an
    * explicitly-left-associated sum of `m` CASE lookups — term for term
    * the Spark plan's fold order, so doubles match bit for bit.
    */
  def pqCtes(m: Int, ksub: Int, dsub: Int): String = {
    val cb = PqOps.literalCodebook(m, ksub, dsub)
    def subDist(j: Int, c: Int): String =
      (0 until dsub).map { d =>
        val t = s"(CAST(embedding[${j * dsub + d + 1}] AS DOUBLE) - (${cb(j)(c)(d)}))"
        s"($t * $t)"
      }.mkString(" + ")
    val dcols = (for (j <- 0 until m; c <- 0 until ksub)
      yield s"    ${subDist(j, c)} AS d_${j}_$c").mkString(",\n")
    def argmin(j: Int): String = {
      val ids = 0 until ksub
      ids.init.zipWithIndex.map { case (c, idx) =>
        val rest = ids.drop(idx + 1)
        s"WHEN ${rest.map(r => s"d_${j}_$c <= d_${j}_$r").mkString(" AND ")} THEN $c"
      }.mkString("CASE ", " ", s" ELSE ${ids.last} END")
    }
    val codes = (0 until m).map(j => s"${argmin(j)} AS c_$j").mkString(", ")
    val luts = (for (j <- 0 until m; c <- 0 until ksub)
      yield s"d_${j}_$c AS qd_${j}_$c").mkString(", ")
    val adc = (0 until m).map { j =>
      val arms = (0 until ksub).map(c => s"WHEN $c THEN q.qd_${j}_$c").mkString(" ")
      s"(CASE e.c_$j $arms END)"
    }.mkString(" + ")
    s"""d AS (
       |  SELECT vec_id, embedding,
       |$dcols
       |  FROM embeddings),
       |enc AS (SELECT vec_id AS corpus_id, $codes FROM d),
       |q AS (SELECT vec_id AS query_id, $luts FROM d WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, e.corpus_id, $adc AS adc_dist
       |  FROM enc e CROSS JOIN q),
       |pqtop AS (
       |  SELECT query_id, rank, corpus_id, adc_dist FROM (
       |    SELECT query_id, corpus_id, adc_dist,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_dist, corpus_id) AS rank
       |    FROM scored)
       |  WHERE rank <= 10)""".stripMargin
  }

  /** DuckDB twin of the PQ encode + ADC search (q_sim_pq_literal). */
  def pqLiteralOracle: String =
    s"""WITH ${pqCtes(4, 8, 16)}
       |SELECT query_id, rank, corpus_id, adc_dist FROM pqtop""".stripMargin

  /** DuckDB twin of the ANN recall gate (q_ann_recall): re-derives the
    * exact cosine top-10 (the q_sim_topk statement) and the PQ-ADC
    * top-10 ([[pqCtes]]) and counts their per-query overlap.
    */
  def annRecallOracle: String = {
    val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
    s"""WITH ${pqCtes(4, 8, 16)},
       |exact AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cos DESC, c.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10
       |    WHERE $cos IS NOT NULL)
       |  WHERE rank <= 10),
       |h AS (
       |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM exact e JOIN pqtop p
       |    ON e.query_id = p.query_id AND e.corpus_id = p.corpus_id
       |  GROUP BY e.query_id)
       |SELECT qq.vec_id AS query_id,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10 AS recall_at_10
       |FROM embeddings qq LEFT JOIN h ON h.query_id = qq.vec_id
       |WHERE qq.vec_id < 10""".stripMargin
  }

  /** DuckDB twin of the full IVF-PQ index (q_sim_ivfpq_literal). The
    * coarse assignment and nprobe selection reuse the
    * [[ivfLiteralOracle]] argmax pattern; the residual PQ stages are
    * generated PER LIST BRANCH (`UNION ALL` over cid) with the
    * `centroid + codebook` constants FOLDED into each branch's distance
    * literals — bit-exact vs the Spark side's two-step subtraction
    * because every operand is a float-widened double minus small
    * integers (each subtraction exact in double).
    */
  def ivfPqLiteralOracle: String = {
    val (m, ksub, dsub) = (4, 8, 16)
    val nLists = 4
    val cents = IvfOps.literalCentroids(nLists, 64)
    val cb = PqOps.literalCodebook(m, ksub, dsub)
    def distCols(prefix: String, listCent: Array[Double]): String =
      (for (s <- 0 until m; c <- 0 until ksub) yield {
        val sum = (0 until dsub).map { d =>
          val w = listCent(s * dsub + d) + cb(s)(c)(d)
          val t = s"(CAST(embedding[${s * dsub + d + 1}] AS DOUBLE) - ($w))"
          s"($t * $t)"
        }.mkString(" + ")
        s"      $sum AS ${prefix}_${s}_$c"
      }).mkString(",\n")
    def argmin(prefix: String, s: Int): String = {
      val ids = 0 until ksub
      ids.init.zipWithIndex.map { case (c, idx) =>
        val rest = ids.drop(idx + 1)
        s"WHEN ${rest.map(r => s"${prefix}_${s}_$c <= ${prefix}_${s}_$r").mkString(" AND ")} THEN $c"
      }.mkString("CASE ", " ", s" ELSE ${ids.last} END")
    }
    val all = 0 until nLists
    val p2 = all.map(p => s"WHEN $p THEN ${argmaxSql(all.filterNot(_ == p))}")
      .mkString("CASE p1 ", " ", " END")
    val encBranches = all.map { j =>
      val codes = (0 until m).map(s => s"${argmin("d", s)} AS c_$s").mkString(", ")
      s"""  SELECT corpus_id, cid, $codes FROM (
         |    SELECT vec_id AS corpus_id, cid,
         |${distCols("d", cents(j))}
         |    FROM c WHERE cid = $j)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val lutBranches = all.map { j =>
      s"""  SELECT query_id, cid,
         |${distCols("qd", cents(j))}
         |  FROM probes WHERE cid = $j""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val adc = (0 until m).map { s =>
      val arms = (0 until ksub).map(c => s"WHEN $c THEN q.qd_${s}_$c").mkString(" ")
      s"(CASE e.c_$s $arms END)"
    }.mkString(" + ")
    s"""WITH a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
          .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmaxSql(all)} AS cid FROM a),
       |enc AS (
       |$encBranches),
       |qp AS (SELECT vec_id, embedding, d0, d1, d2, d3,
       |         ${argmaxSql(all)} AS p1
       |       FROM a WHERE vec_id < 10),
       |q2 AS (SELECT vec_id, embedding, p1, $p2 AS p2 FROM qp),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding, p1 AS cid FROM q2
       |  UNION ALL
       |  SELECT vec_id AS query_id, embedding, p2 AS cid FROM q2),
       |qlut AS (
       |$lutBranches),
       |scored AS (
       |  SELECT q.query_id, e.corpus_id, $adc AS adc_dist
       |  FROM enc e JOIN qlut q ON e.cid = q.cid)
       |SELECT query_id, rank, corpus_id, adc_dist FROM (
       |  SELECT query_id, corpus_id, adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, corpus_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10""".stripMargin
  }

  /** DuckDB twin of the frozen-merge BPE apply (q_bpe_encode): a
    * recursive CTE replaying [[graft.expr.BpeCodec]]'s exact priority
    * loop per word — find the LOWEST-ranked merge pair present, replace
    * ALL its left-to-right non-overlapping occurrences, repeat until no
    * rule applies. Words are space-joined symbol strings; the
    * double-space trick (`replace(sym,' ','  ')` then matching
    * `' a  b '`) makes plain non-regex `replace` perform exactly the
    * non-overlapping full-symbol merge (adjacent occurrences don't share
    * boundary spaces). Merge literals come from the same Scala constant
    * as the Spark side ([[bpeFrozenMerges]]).
    */
  def bpeEncodeOracle: String = {
    def esc(s: String) = s.replace("'", "''")
    val vals = bpeFrozenMerges.zipWithIndex
      .map { case ((a, b), i) => s"($i, '${esc(a)}', '${esc(b)}')" }
      .mkString(", ")
    val toks = S.tokens("lower(text)")
    val padded = "' ' || replace(e.sym, ' ', '  ') || ' '"
    s"""WITH RECURSIVE
       |m(rank, a, b) AS (VALUES $vals),
       |toks AS (
       |  SELECT doc_id, unnest($toks) AS w,
       |         generate_subscripts($toks, 1) AS ord
       |  FROM documents),
       |words AS (
       |  SELECT doc_id, ord,
       |    array_to_string(list_transform(range(1, len(w)+1), i -> w[i:i]), ' ') AS sym
       |  FROM toks),
       |enc(doc_id, ord, sym) AS (
       |  SELECT doc_id, ord, sym FROM words
       |  UNION ALL
       |  SELECT e.doc_id, e.ord,
       |    trim(replace(replace($padded,
       |      ' ' || mm.a || '  ' || mm.b || ' ',
       |      ' ' || mm.a || mm.b || ' '), '  ', ' '))
       |  FROM enc e JOIN m mm ON mm.rank = (
       |    SELECT min(m2.rank) FROM m m2
       |    WHERE strpos($padded, ' ' || m2.a || '  ' || m2.b || ' ') > 0)),
       |fin AS (
       |  SELECT doc_id, ord, sym FROM enc e
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM m m2
       |    WHERE strpos($padded, ' ' || m2.a || '  ' || m2.b || ' ') > 0)),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(sum(len(string_split(sym, ' '))) AS INTEGER) AS n_pieces,
       |    string_agg(replace(sym, ' ', '|'), '|' ORDER BY ord) AS pieces_str
       |  FROM fin GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(a.n_pieces, 0) AS n_pieces,
       |       COALESCE(a.pieces_str, '') AS pieces_str
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** Shared CTE chain computing the portable 60-bit SimHash signature:
    * 60 per-bit sign sums over the md5-60bit token hash, then the bit
    * assembly — all generated with the same bit weights as the Spark
    * fold. Ends with `sg(doc_id, simhash)`.
    */
  def simhashSigCtes: String = {
    val bits = 60
    val sums = (0 until bits).map(j =>
      s"    sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j")
      .mkString(",\n")
    val sig = (0 until bits).map(j =>
      s"(CASE WHEN s_$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(${S.tokens("text")}) AS t FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),
       |s AS (
       |  SELECT doc_id,
       |$sums
       |  FROM h GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sig AS simhash FROM s)""".stripMargin
  }

  /** DuckDB twin of the portable SimHash signature (q_dedup_simhash).
    */
  def simhashPortableOracle: String =
    s"""WITH $simhashSigCtes
       |SELECT doc_id, simhash FROM sg""".stripMargin

  /** DuckDB twin of the SimHash near-dup pairing (q_simhash_neardup):
    * the NAIVE all-pairs Hamming predicate — the hash-compare against
    * Spark's pigeonhole chunk join is the completeness proof.
    */
  /** DuckDB twin of [[graft.ops.MultimodalOps.pHashStub]] over the
    * documents-derived media table: payload bytes are the raw text's
    * ASCII codes, so per-block byte sums replay as per-block char-code
    * sums; bit i = [64·s_i > Σs] is exact integer algebra on both
    * engines, and bit 63 enters as the int64 MIN literal (two's
    * complement — a positive 2^63 literal would overflow BIGINT).
    */
  /** The planted CDC changelog shared by `q_merge_upsert` and
    * `q_cdc_view`: snapshot = keys with `o_orderkey % 4 < 3`; changes =
    * an update (%4==0, seq 1), a tombstone (%4==1), an out-of-snapshot
    * insert (%4==3) and a second-version update (%8==0, seq 2) — unique
    * (key, seq) pairs, as real CDC logs guarantee, so the max_by fold
    * is tie-free on every engine.
    */
  def cdcFeed(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("total_cents"))
    val snapshot = base.filter(col("o_orderkey") % 4 < 3)
    val changes =
      base.filter(col("o_orderkey") % 4 === 0).select(
          col("o_orderkey"), col("o_custkey"),
          lit("X").as("o_orderstatus"),
          (col("total_cents") + 100).as("total_cents"),
          lit(1L).as("seq"), lit("U").as("op"))
        .unionByName(base.filter(col("o_orderkey") % 4 === 1).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("total_cents"), lit(1L).as("seq"), lit("D").as("op")))
        .unionByName(base.filter(col("o_orderkey") % 4 === 3).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("total_cents"), lit(1L).as("seq"), lit("U").as("op")))
        .unionByName(base.filter(col("o_orderkey") % 8 === 0).select(
          col("o_orderkey"), col("o_custkey"),
          lit("Y").as("o_orderstatus"),
          (col("total_cents") + 200).as("total_cents"),
          lit(2L).as("seq"), lit("U").as("op")))
    (snapshot, changes)
  }

  /** DuckDB replay of the ENTIRE lattice k-means — quantization,
    * seeding, every Lloyd round (assignment argmin + truncating-division centroid
    * update, empty-cluster carryover) and the final assignment — with
    * the rounds unrolled as CTEs. All arithmetic is integer-exact on
    * both engines. The centroid update must divide toward zero like
    * Java's Long `/`, but DuckDB's integer `//` rounding direction is
    * ENVIRONMENT-DEPENDENT (1.0.0 truncates toward zero, newer builds
    * floor-divide — the two differ by one on negative sums). The oracle
    * therefore sign-splits the division so its operands are always
    * nonnegative: `CASE WHEN sv >= 0 THEN sv // n ELSE -((-sv) // n)
    * END` is toward-zero under EITHER `//` semantics (n = count > 0).
    * Ties break on (dist2, j) = the expression's strict-< first-minimum.
    */
  def kmeansLatticeCtes(
      k: Int, iters: Int, dims: Int, trainWhere: String = "TRUE"): String = {
    def distExpr(qv: String, cv: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> ($qv[i] - $cv[i]) * ($qv[i] - $cv[i]))), " +
        s"(a, b) -> a + b)"
    // `src` = qt (the training subset) for the Lloyd rounds, q (the full
    // corpus) for the final assignment — with trainWhere = TRUE the two
    // coincide and this is the original whole-corpus training replay;
    // a narrower predicate replays FAISS add-after-train (train on the
    // base segment, assign everything).
    def assignCte(name: String, src: String, centsCte: String) =
      s"""$name AS (
         |  SELECT vec_id, qv, j, dist2, row_number()
         |    OVER (PARTITION BY vec_id ORDER BY dist2, j) AS rn
         |  FROM (SELECT $src.vec_id, $src.qv, c.j,
         |          ${distExpr(s"$src.qv", "c.qv")} AS dist2
         |        FROM $src CROSS JOIN $centsCte c))""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assignCte(s"a$r", "qt", s"c${r - 1}")},
         |w$r AS (SELECT vec_id, qv, j FROM a$r WHERE rn = 1),
         |n$r AS (SELECT j, count(*) AS n FROM w$r GROUP BY j),
         |u$r AS (SELECT w$r.j, t.range AS d, w$r.qv[t.range + 1] AS v
         |        FROM w$r CROSS JOIN range(0, $dims) t),
         |s$r AS (SELECT j, d, sum(v) AS sv FROM u$r GROUP BY j, d),
         |c$r AS (
         |  SELECT s$r.j, list(CASE WHEN s$r.sv >= 0 THEN s$r.sv // n$r.n
         |                          ELSE -((-s$r.sv) // n$r.n) END
         |                     ORDER BY s$r.d) AS qv
         |  FROM s$r JOIN n$r ON s$r.j = n$r.j GROUP BY s$r.j
         |  UNION ALL
         |  SELECT j, qv FROM c${r - 1}
         |  WHERE j NOT IN (SELECT j FROM w$r))""".stripMargin
    }.mkString(",\n")
    s"""q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |qt AS (SELECT vec_id, qv FROM q WHERE $trainWhere),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, qv
       |  FROM (SELECT vec_id, qv FROM qt ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${assignCte("fin", "q", s"c$iters")}""".stripMargin
  }

  /** The final projection CASTs dist2 back to BIGINT explicitly. In
    * DuckDB 1.0.0 this is a no-op (the lambda fold is BIGINT), but
    * `fin.dist2` is the ONE value path the headline exposes that the
    * green lattice queries (`q_semdedup_lattice`, `q_sim_ivf_lattice` —
    * which embed these same CTEs and pass at the driver) never emit; if
    * a different driver DuckDB widens the fold's result type, pandas
    * renders HUGEINT as float64 and the comparator's stringify turns
    * `123` into `123.0` — a hash mismatch with identical values and
    * matching column names, which is precisely the two-round-old red
    * row's signature. The cast pins the wire type under EITHER
    * behavior without touching the values (dist2 < 2^50, exact in
    * every candidate type). */
  def kmeansLatticeOracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT vec_id, CAST(j AS INTEGER) AS cluster,
       |       CAST(dist2 AS BIGINT) AS dist2
       |FROM fin WHERE rn = 1""".stripMargin

  /** Bisection oracles for the `q_kmeans_lattice_*` debug stages: the
    * SAME kmeansLatticeCtes SQL text as the headline oracle, selecting
    * one intermediate CTE each (quantized input / round-1 winners /
    * per-round centroid matrices), list cells exploded to scalars so the
    * driver comparator never sees an array. */
  def kmeansLatticeQuantOracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT q.vec_id, CAST(t.range AS INTEGER) AS d,
       |       CAST(q.qv[t.range + 1] AS BIGINT) AS coord
       |FROM q CROSS JOIN range(0, $dims) t""".stripMargin

  def kmeansLatticeAssign1Oracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT vec_id, CAST(j AS INTEGER) AS cluster FROM w1""".stripMargin

  def kmeansLatticeCentsOracle(
      k: Int, iters: Int, dims: Int, round: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT CAST(c.j AS INTEGER) AS j, CAST(t.range AS INTEGER) AS d,
       |       CAST(c.qv[t.range + 1] AS BIGINT) AS coord
       |FROM c$round c CROSS JOIN range(0, $dims) t""".stripMargin

  /** Stage "fd": EVERY (vec, final centroid) squared distance — the raw
    * lambda-fold values of the headline's `fin` subquery, not just the
    * argmin winner. If the driver's red row is a genuine value
    * divergence in `distExpr` (rather than a result-type widening), this
    * stage is red and localizes it; if only the headline was red for
    * dtype reasons, this stage is green alongside the cast-pinned
    * headline. */
  def kmeansLatticeFinDistOracle(
      k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT vec_id, CAST(j AS INTEGER) AS j,
       |       CAST(dist2 AS BIGINT) AS dist2
       |FROM fin""".stripMargin

  /** Engine side of the `_c{1,2}` stages: [[LatticeKmeans.trainRounds]]
    * run with the headline query's parameters, one snapshot exploded to
    * (j, d, coord) rows. The collect is k x dims-bounded (4 x 64). */
  def latticeCentroidFrame(
      s: SparkSession, dir: String, round: Int): DataFrame = {
    val rounds =
      LatticeKmeans.trainRounds(t(s, dir, "embeddings"), k = 4, iters = 2)
    val rows = for {
      (c, j) <- rounds.lift(round).getOrElse(Array.empty).zipWithIndex.toSeq
      (v, d) <- c.zipWithIndex.toSeq
    } yield (j, d, v)
    import s.implicits._
    rows.toDF("j", "d", "coord")
  }

  /** Fully-oracled SemDeDup: the lattice training replay above, then
    * within-cluster pairs by the integer cosine test
    * (`dot >= 0 AND den^2*dot^2 >= num^2*|a|^2*|b|^2` on the
    * PairScale-quantized vectors — pure BIGINT algebra), then the
    * min-id transitive closure as a recursive CTE (the
    * q_semdedup_literal machinery).
    */
  def semDedupLatticeOracle(
      k: Int, iters: Int, dims: Int, tauNum: Long, tauDen: Long): String = {
    def dotExpr(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    s"""WITH RECURSIVE ${kmeansLatticeCtes(k, iters, dims)},
       |qs AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${LatticeKmeans.PairScale} + 0.5) AS BIGINT)) AS qs
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |asg AS (
       |  SELECT fin.vec_id, fin.j AS cid, qs.qs,
       |    ${dotExpr("qs.qs", "qs.qs")} AS n2
       |  FROM fin JOIN qs ON fin.vec_id = qs.vec_id WHERE fin.rn = 1),
       |p AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM asg x JOIN asg y
       |    ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE x.n2 > 0 AND y.n2 > 0
       |    AND ${dotExpr("x.qs", "y.qs")} >= 0
       |    AND ${tauDen * tauDen} * ${dotExpr("x.qs", "y.qs")} * ${dotExpr("x.qs", "y.qs")}
       |        >= ${tauNum * tauNum} * x.n2 * y.n2),
       |e AS (SELECT id_a AS u, id_b AS v FROM p
       |      UNION ALL SELECT id_b, id_a FROM p),
       |reach(node, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node)
       |SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS rep_id,
       |       CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS INT) AS keep
       |FROM reach GROUP BY node""".stripMargin
  }

  /** Fully-oracled IVF/L2 search on the lattice: training replay, corpus
    * assignment (`fin`), per-query probe ranking, candidates-only join,
    * exact-integer dist2 top-k — all BIGINT.
    */
  def ivfLatticeOracle(
      k: Int, iters: Int, dims: Int, nprobe: Int, topK: Int,
      trainWhere: String = "TRUE"): String = {
    def dotExpr(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    s"""WITH ${kmeansLatticeCtes(k, iters, dims, trainWhere)},
       |asg AS (
       |  SELECT vec_id AS corpus_id, qv, j AS cid,
       |    ${dotExpr("qv", "qv")} AS cn2
       |  FROM fin WHERE rn = 1),
       |qf AS (
       |  SELECT vec_id AS query_id, qv, ${dotExpr("qv", "qv")} AS qn2
       |  FROM q WHERE vec_id < 10),
       |pr AS (
       |  SELECT query_id, qv, qn2, j AS cid, row_number()
       |    OVER (PARTITION BY query_id ORDER BY d2, j) AS prn
       |  FROM (SELECT qf.query_id, qf.qv, qf.qn2, c.j,
       |          qf.qn2 + ${dotExpr("c.qv", "c.qv")}
       |            - 2 * ${dotExpr("qf.qv", "c.qv")} AS d2
       |        FROM qf CROSS JOIN c$iters c)),
       |sc AS (
       |  SELECT pr.query_id, a.corpus_id,
       |    pr.qn2 + a.cn2 - 2 * ${dotExpr("pr.qv", "a.qv")} AS dist2
       |  FROM pr JOIN asg a ON a.cid = pr.cid WHERE pr.prn <= $nprobe),
       |r AS (
       |  SELECT query_id, corpus_id, dist2, row_number()
       |    OVER (PARTITION BY query_id ORDER BY dist2, corpus_id) AS rnk
       |  FROM sc)
       |SELECT query_id, CAST(rnk AS INT) AS rank, corpus_id, dist2
       |FROM r WHERE rnk <= $topK""".stripMargin
  }

  /** DuckDB replay of the greedy farthest-point coreset: the rounds
    * unrolled, each one a min-over-chosen distance aggregate and a
    * (md DESC, vec_id) LIMIT 1 pick — exactly the Spark loop's
    * TakeOrdered per round.
    */
  def coresetOracle(m: Int, dims: Int): String = {
    def distExpr(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), " +
        s"(x, y) -> x + y)"
    val rounds = (2 to m).map { r =>
      s"""md$r AS MATERIALIZED (
         |  SELECT q.vec_id, q.qv, min(${distExpr("q.qv", "c.qv")}) AS md
         |  FROM q CROSS JOIN ch${r - 1} c
         |  WHERE q.vec_id NOT IN (SELECT vec_id FROM ch${r - 1})
         |  GROUP BY q.vec_id, q.qv),
         |s$r AS (SELECT vec_id, md FROM md$r ORDER BY md DESC, vec_id LIMIT 1),
         |ch$r AS (SELECT vec_id, qv FROM ch${r - 1}
         |         UNION ALL
         |         SELECT q.vec_id, q.qv FROM q JOIN s$r ON q.vec_id = s$r.vec_id)""".stripMargin
    }.mkString(",\n")
    val out = (2 to m).map { r =>
      s"UNION ALL SELECT CAST($r AS INT), vec_id, md FROM s$r"
    }.mkString("\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |ch1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(1 AS INT) AS sel_rank, vec_id, CAST(NULL AS BIGINT) AS min_dist2
       |FROM ch1
       |$out""".stripMargin
  }

  /** Shared sample-replay CTEs for the audio oracles: every PCM sample
    * of every clip regenerated in HUGEINT mod-2^64 SQL via the splitmix
    * rounds ([[RefQueries.mixSql]]), then re-centered to signed 16-bit
    * exactly as [[graft.ops.AudioOps.sampleAt]] does
    * (`(m % 65536) - 32768` == `(m & 0xffff) - 32768`).
    */
  /** Shared winnowing-selection CTEs (k=4, w=8 — MUST match the
    * registered queries' parameters): normalize to the formatting-free
    * space, code points, k-gram polynomial hashes, min per w-window
    * (slices clamp at the end exactly like the expression's final
    * windows), distinct selected values. `range()` ends are exclusive:
    * gram positions run 1 .. len(codes)-k+1 = range(1, len(codes)-2) at
    * k=4; window starts run 1 .. max(nGrams-w+1, 1) =
    * range(1, greatest(len(grams)-6, 2)) at w=8.
    */
  /** SQL replay of [[graft.ops.SelectionOps.log2Fixed]] over a 1-column
    * CTE `valsCte(v)`: msb from the binary string length (bin() has no
    * leading zeros), then the 20 mantissa-squaring rounds UNROLLED as
    * chained CTEs — pure int64 shifts/compares, bit-identical to the
    * driver loop. Emits `lg(v, lg)`. */
  def log2FixedSql(valsCte: String): String = {
    val steps = (0 until graft.ops.SelectionOps.LogFracBits).map { i =>
      val bit = 1L << (graft.ops.SelectionOps.LogFracBits - 1 - i)
      s"""s${i + 1} AS (
         |  SELECT v, msb,
         |    CASE WHEN sq >= 2147483648 THEN sq >> 1 ELSE sq END AS m,
         |    frac + CASE WHEN sq >= 2147483648 THEN $bit ELSE 0 END AS frac
         |  FROM (SELECT v, msb, frac, (m * m) >> 30 AS sq FROM s$i))""".stripMargin
    }.mkString(",\n")
    s"""s0 AS (
       |  SELECT v, length(bin(v)) - 1 AS msb,
       |    CASE WHEN length(bin(v)) - 1 >= 30
       |         THEN v >> (length(bin(v)) - 1 - 30)
       |         ELSE v << (30 - (length(bin(v)) - 1)) END AS m,
       |    CAST(0 AS BIGINT) AS frac
       |  FROM $valsCte),
       |$steps,
       |lg AS (SELECT v, msb * 1048576 + frac AS lg
       |       FROM s${graft.ops.SelectionOps.LogFracBits})""".stripMargin
  }

  /** Full from-scratch DSIR replay: portable md5 token bucketing, the
    * smoothed target/raw counts, [[log2FixedSql]] over every needed
    * value, the per-bucket weight, and the per-doc fold. */
  def dsirOracle(buckets: Int): String = {
    val p = DedupOps.PortableHashPrime
    val hash =
      s"(CAST(('0x' || substring(md5(tk), 1, 15)) AS BIGINT) % $p) % $buckets"
    s"""WITH toksl AS (
       |  SELECT doc_id, lang, ${S.tokens("lower(text)")} AS w FROM documents),
       |tok AS (
       |  SELECT doc_id, lang = 'en' AS is_t, unnest(w) AS tk FROM toksl),
       |bk AS (SELECT doc_id, is_t, CAST($hash AS BIGINT) AS b FROM tok),
       |bc AS (
       |  SELECT b, CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t,
       |    CAST(count(*) AS BIGINT) AS r
       |  FROM bk GROUP BY b),
       |tot AS (SELECT CAST(sum(t) AS BIGINT) AS nt,
       |               CAST(sum(r) AS BIGINT) AS nr FROM bc),
       |vals AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT t + 1 AS v FROM bc
       |    UNION ALL SELECT r + 1 FROM bc
       |    UNION ALL SELECT nt + $buckets FROM tot
       |    UNION ALL SELECT nr + $buckets FROM tot)),
       |${log2FixedSql("vals")},
       |wb AS (
       |  SELECT bc.b, (lt.lg - lr.lg) + (lnr.lg - lnt.lg) AS w
       |  FROM bc CROSS JOIN tot
       |  JOIN lg lt ON lt.v = bc.t + 1
       |  JOIN lg lr ON lr.v = bc.r + 1
       |  JOIN lg lnt ON lnt.v = tot.nt + $buckets
       |  JOIN lg lnr ON lnr.v = tot.nr + $buckets),
       |ds AS (
       |  SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(wb.w) AS BIGINT) AS dsir_fixed
       |  FROM bk JOIN wb ON wb.b = bk.b GROUP BY bk.doc_id)
       |SELECT d.doc_id,
       |  coalesce(ds.n_tokens, 0) AS n_tokens,
       |  coalesce(ds.dsir_fixed, 0) AS dsir_fixed
       |FROM documents d LEFT JOIN ds USING (doc_id)""".stripMargin
  }

  /** Shared CTEs for the substring-span dedup oracles: k-token window
    * rolling hashes (the proven [[TextOps.Sql.fingerprint]] polynomial
    * over the space-joined window), corpus-wide window counts, and the
    * gaps-and-islands merge of duplicated-window positions into maximal
    * spans — the same algebra as [[graft.ops.DedupOps.duplicateSpans]].
    */
  def dupSpanCtes(k: Int): String =
    s"""toksd AS (
       |  SELECT doc_id, ${S.tokens("lower(text)")} AS w FROM documents),
       |gw AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |    ${S.fingerprint(s"array_to_string(w[i:i+${k - 1}], ' ')")} AS h
       |  FROM toksd, LATERAL unnest(range(1, len(w) - ${k - 2})) r(i)
       |  WHERE len(w) >= $k),
       |dh AS (SELECT h FROM gw GROUP BY h HAVING count(*) >= 2),
       |hp AS (
       |  SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM gw JOIN dh USING (h)),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM hp),
       |sp AS (
       |  SELECT doc_id, island,
       |    CAST(min(pos) AS BIGINT) AS span_start,
       |    CAST(max(pos) + $k AS BIGINT) AS span_end
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  def winnowCtes: String =
    """n AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    list_transform(list_filter(string_split(s, ''), ch -> len(ch) > 0),
      |      ch -> CAST(ord(ch) AS BIGINT)) AS codes
      |  FROM n),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(codes) - 2),
      |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i:i+3]),
      |             (a, x) -> (a * 31 + x) % 1000000007)) AS grams
      |  FROM c WHERE len(codes) >= 4),
      |sel AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(grams) - 6, 2)),
      |      j -> list_min(grams[j:j+7]))) AS fps
      |  FROM g)""".stripMargin

  /** Shared content-defined-chunking CTEs: payload bytes (= ASCII text
    * codes — `mediaFromDocuments` encodes the text), the 256-entry gear
    * table regenerated in HUGEINT splitmix SQL, the windowed rolling
    * hash at every full-window position (a 16-wide position self-join —
    * the oracle pays the quadratic window so the engine's O(n)
    * incremental update is independently checked), anchors, and chunk
    * rows with the house polynomial chunk hash.
    */
  def cdcCtes: String = {
    val W = MultimodalOps.Cdc.Window
    s"""pay AS (
       |  SELECT doc_id, list_transform(
       |    list_filter(string_split(text, ''), ch -> len(ch) > 0),
       |    ch -> CAST(ord(ch) AS BIGINT)) AS bytes
       |  FROM documents WHERE text IS NOT NULL),
       |gear AS (SELECT b, (am % 32768)::BIGINT AS g FROM (
       |  SELECT t.range AS b,
       |    ${RefQueries.mixSql("a",
            s"t.range::HUGEINT * 2654435761 + ${MultimodalOps.Cdc.GearSalt}")}
       |  FROM range(0, 256) t)),
       |pos AS (SELECT doc_id, i, bytes[i + 1] AS byte
       |        FROM pay, LATERAL unnest(range(0, len(bytes))) r(i)),
       |hw AS (
       |  SELECT p.doc_id, p.i,
       |    CAST(sum(g.g * (1::BIGINT << (q.i - p.i + ${W - 1}))) AS BIGINT) AS h
       |  FROM pos p
       |  JOIN pos q ON q.doc_id = p.doc_id AND q.i BETWEEN p.i - ${W - 1} AND p.i
       |  JOIN gear g ON g.b = q.byte
       |  WHERE p.i >= ${W - 1}
       |  GROUP BY p.doc_id, p.i),
       |ends AS (SELECT DISTINCT doc_id, i FROM (
       |  SELECT doc_id, i FROM hw
       |  WHERE ((h // ${1 << MultimodalOps.Cdc.AnchorShift})
       |         % ${MultimodalOps.Cdc.AnchorMask + 1}) = 0
       |  UNION ALL
       |  SELECT doc_id, len(bytes) - 1 AS i FROM pay WHERE len(bytes) > 0)),
       |ch AS (
       |  SELECT doc_id, i AS e,
       |    coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), -1) + 1 AS s,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS idx
       |  FROM ends),
       |chk AS (
       |  SELECT ch.doc_id AS media_id, CAST(idx AS INT) AS chunk_idx,
       |    CAST(s AS INT) AS "start", CAST(e - s + 1 AS INT) AS len,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), p.bytes[s + 1:e + 1]),
       |      (a, x) -> (a * 31 + x) % 1000000007) AS chash
       |  FROM ch JOIN pay p ON p.doc_id = ch.doc_id)""".stripMargin
  }

  def audioCtes: String =
    s"""d AS (SELECT doc_id, (doc_id % ${AudioOps.SeedGroups})::HUGEINT AS seed
       |      FROM documents),
       |px AS (SELECT doc_id, seed, t.range AS i
       |       FROM d CROSS JOIN range(0, ${AudioOps.NSamples}) t),
       |m AS (SELECT doc_id, i,
       |  ${RefQueries.mixSql("a", s"seed * ${AudioOps.SeedMult} + i")}
       |  FROM px),
       |x AS (SELECT doc_id, i, (am % 65536)::BIGINT - 32768 AS smp FROM m)""".stripMargin

  def phashCtes: String = {
    val pow2 = (0 until 63).map(i => (1L << i).toString) :+
      Long.MinValue.toString
    s"""ph_c AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(list_filter(string_split(text, ''),
       |      ch -> len(ch) > 0), ch -> CAST(ord(ch) AS BIGINT)) AS codes
       |  FROM documents),
       |ph_s AS (
       |  SELECT media_id, len(codes) // 64 AS w, codes FROM ph_c),
       |ph_b AS (
       |  SELECT media_id,
       |    list_transform(range(0, 64), i -> CASE WHEN w = 0
       |      THEN CAST(0 AS BIGINT)
       |      ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        codes[i*w+1 : i*w+w]), (a, x) -> a + x) END) AS ss
       |  FROM ph_s),
       |ph_t AS (
       |  SELECT media_id, ss,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), ss),
       |      (a, x) -> a + x) AS tot
       |  FROM ph_b),
       |ph AS (
       |  SELECT media_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(0, 64), i ->
       |        CASE WHEN 64 * ss[i+1] > tot
       |          THEN ([${pow2.mkString(", ")}])[i+1]
       |          ELSE CAST(0 AS BIGINT) END)),
       |      (a, x) -> a + x) AS phash
       |  FROM ph_t)""".stripMargin
  }

  def simhashNearDupOracle: String =
    s"""WITH $simhashSigCtes
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""".stripMargin
  /** DuckDB twin of the PCA projection under the exported literal model:
    * per-component sequential-fold dot minus the mean-offset literal —
    * the exact IEEE chain of [[graft.ops.PcaOps.project]]. */
  def pcaProjectOracle(
      comps: Array[Array[Double]], offs: Array[Double]): String = {
    val cols = comps.zipWithIndex.map { case (c, j) =>
      s"  ${dotLit(c)} - ${dlit(offs(j))} AS pc${j + 1}"
    }.mkString(",\n")
    s"""SELECT vec_id,
       |$cols
       |FROM embeddings
       |WHERE embedding IS NOT NULL AND len(embedding) = 64""".stripMargin
  }

  /** CTE list of the soft-dedup weight replay (3-gram Jaccard pairs,
    * recursive min-label components, cluster sizes) — shared by the
    * `q_dedup_weights` and `q_ess_weights` oracles, mirroring
    * [[dedupWeightsFrame]].
    */
  lazy val dedupWeightsCtes: String =
    s"""toks AS (
       |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
       |  FROM toks WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |good AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
       |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.2),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM good
       |  UNION SELECT id_b, id_a FROM good),
       |reach(n, r) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
       |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n),
       |asg AS (
       |  SELECT d.doc_id,
       |    CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.n),
       |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM asg GROUP BY component)""".stripMargin

  lazy val dedupWeightsSelect: String =
    """SELECT asg.doc_id, asg.component, cs.cluster_size,
      |  1000000 // cs.cluster_size AS weight_micro
      |FROM asg JOIN cs USING (component)""".stripMargin
}
