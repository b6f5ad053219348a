package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Training-data pipeline operators (dedup, similarity search,
  * multimodal, text analysis, event streams) as driver-checkable
  * queries — the assembled catalog. The entries live in the domain
  * files (TextQueries, DedupQueries, ...); shared fixtures and
  * oracle builders in [[QueryShared]].
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    TextQueries.queries ++
      DedupQueries.queries ++
      SimQueries.queries ++
      LakeQueries.queries ++
      CurationQueries.queries ++
      StreamQueries.queries ++
      GraphQueries.queries ++
      StatsQueries.queries ++
      RelationalQueries.queries


  /** The static catalog plus the dynamically-built trained-centroid
    * oracles (present once the float-training queries have run in this
    * JVM — always the case in the driver's Verify pass, which dumps
    * oracleSql AFTER executing every query). */
  def oracleSql: Map[String, String] =
    staticOracleSql ++
      TrainedExport.get("float_k8_i2").map { cents =>
        Map(
          "q_sim_ivf_topk" -> ivfCentroidOracle(cents, nprobe = 4, topK = 10),
          "q_semdedup" -> semDedupCentroidOracle(cents, threshold = 0.35))
      }.getOrElse(Map.empty[String, String]) ++
      TrainedExport.get("pca_m4").map { packed =>
        Map("q_pca_project" ->
          pcaProjectOracle(packed.dropRight(1), packed.last))
      }.getOrElse(Map.empty[String, String])


  private val staticOracleSql: Map[String, String] =
    TextQueries.oracleSql ++
      DedupQueries.oracleSql ++
      SimQueries.oracleSql ++
      LakeQueries.oracleSql ++
      CurationQueries.oracleSql ++
      StreamQueries.oracleSql ++
      GraphQueries.oracleSql ++
      StatsQueries.oracleSql ++
      RelationalQueries.oracleSql
}
