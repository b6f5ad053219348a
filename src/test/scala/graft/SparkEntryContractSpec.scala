package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: the correctness gate is only as strong as
  * the oracle catalog, so a query silently missing its oracle entry (or an
  * oracle keyed to a nonexistent query) must fail THIS suite, not ship as
  * a weaker rows-only check.
  */
class SparkEntryContractSpec extends AnyFunSuite {

  /** Every registered query must ANALYZE AND EXECUTE against the real
    * testdata. Round 3 shipped a query (`q_session_window`) that threw
    * `DATATYPE_MISMATCH` at analysis time; the driver's correctness pass
    * silently omitted it, so the board read "0 red" while a registered
    * query could not run. This smoke loop makes that class of breakage
    * fail the suite loudly: analysis errors surface at `queries(name)`/
    * plan build, runtime errors at the noop-sink write. sf0.001 keeps the
    * whole catalog's cost to seconds.
    */
  test("every registered query analyzes and executes on sf0.001") {
    val spark = SparkSpec.spark
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sf).write.mode("overwrite").format("noop").save()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
            e.getMessage.linesIterator.take(2).mkString(" "))
        }
    }
    assert(broken.isEmpty,
      s"registered queries that cannot run:\n  ${broken.mkString("\n  ")}")
  }

  /** The DYNAMICALLY-oracled set: float-k-means training happens inside
    * these queries, so their oracle SQL cannot be static text — instead
    * the query run exports the (deterministic, fixed-point-trained)
    * centroids and `oracleSql` builds the downstream-of-training oracle
    * from them (PipelineQueries.TrainedExport, round 8; before that the
    * pair was rows-only). Verify runs every query before dumping
    * oracleSql, so the driver always sees these entries; in a fresh JVM
    * where the trainers have not run they are absent. Growing this set
    * is a DELIBERATE act: add the justification to COVERAGE.md when you
    * add a name here.
    */
  private val dynamicOracle = Set(
    "q_sim_ivf_topk", "q_semdedup", "q_pca_project")

  test("every query is oracled (dynamic pair included); no orphan oracles") {
    val q = SparkEntry.queries.keySet
    // test 1 above executed the whole catalog, so the trained exports are
    // populated and the dynamic entries must be present; be explicit
    // anyway so this test stands alone under testOnly -z filtering
    SparkEntry.queries("q_semdedup")(SparkSpec.spark, "/root/testdata/sf0.001")
    SparkEntry.queries("q_pca_project")(SparkSpec.spark, "/root/testdata/sf0.001")
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert(dynamicOracle.subsetOf(o),
      s"dynamic trained-centroid oracles missing: ${dynamicOracle -- o}")
    assert((q -- o).isEmpty,
      s"un-oracled queries drifted: got ${(q -- o).toSeq.sorted}")
  }

  test("no duplicate query names across RefQueries and PipelineQueries") {
    import graft.queries.{PipelineQueries, RefQueries}
    val dup = RefQueries.queries.keySet & PipelineQueries.queries.keySet
    assert(dup.isEmpty, s"duplicate names (later map wins silently): $dup")
    val dupO = RefQueries.oracleSql.keySet & PipelineQueries.oracleSql.keySet
    assert(dupO.isEmpty, s"duplicate oracle names: $dupO")
  }

  test("oracle SQL only references the driver's tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude but effective: every FROM/JOIN target must be a known table,
    // a CTE defined in the same statement, or a parenthesized subquery;
    // identifiers followed by '(' are table functions (range(...)), not
    // tables, and the FROM of IS [NOT] DISTINCT FROM is an operator,
    // not a clause
    val ref =
      "(?i)(?<!DISTINCT\\s)(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*+)(?!\\s*\\()".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      ref.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || ctes.contains(t),
          s"$name references unknown table '$t'")
      }
    }
  }
}
