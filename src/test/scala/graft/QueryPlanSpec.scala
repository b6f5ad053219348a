package graft

import graft.queries.PipelineQueries

/** Executed-plan assertions for the relational query shapes: the join
  * strategies the 100 TB design argues for must actually appear in the
  * physical plan (AQE final plan, real parquet input — local Seq DFs fold
  * to LocalTableScan and prove nothing).
  */
class QueryPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = PipelineQueries.queries(name)(spark, sf)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q_tpch_q5: dimension joins broadcast; no cartesian anywhere") {
    val plan = finalPlan("q_tpch_q5")
    assert(plan.contains("BroadcastHashJoin"), s"nation/region must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in Q5:\n$plan")
  }

  test("q_tpch_q18: the HAVING aggregate is the broadcast build side") {
    val plan = finalPlan("q_tpch_q18")
    assert(plan.contains("BroadcastHashJoin"), s"heavy-orders agg must broadcast:\n$plan")
    // the pre-join aggregate must exist (partial + final over l_orderkey)
    assert(plan.contains("sum_qty") || plan.contains("sum(l_quantity)"),
      s"aggregate-before-join missing:\n$plan")
  }

  test("q_embed_outliers: centroid table broadcasts; corpus side stays map-shaped") {
    val plan = finalPlan("q_embed_outliers")
    assert(plan.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus-wide shuffle join:\n$plan")
  }

  test("q_dedup_incremental: anti joins key on hashes, not text") {
    val plan = finalPlan("q_dedup_incremental")
    assert(plan.contains("LeftAnti"), s"anti-join pass missing:\n$plan")
    assert(plan.contains("xxhash64"), s"exact pass must key on the 8-byte hash:\n$plan")
  }
}
