package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Lineage.LineageOps

/** CDC apply as a stream: the streaming twin of
  * [[graft.ops.LakeOps.applyChanges]] — a changelog feed
  * (key, payload..., seq, op∈{U,D}) continuously folded into the
  * current-state view it implies.
  *
  * Two shapes, for two state budgets:
  *
  *   1. [[latestView]] — the SAME declarative aggregate the batch op
  *      plans (`groupBy(key).agg(max_by(struct(payload, op), seq))`,
  *      tombstones filtered after the fold), run in update output mode.
  *      Catalyst plans it as ONE stateful streaming aggregation; state
  *      is max_by's O(1)-per-key merge state (winning seq + row), so the
  *      store scales with DISTINCT KEYS — the floor for any continuously
  *      materialized view. Bootstrap is the standard CDC convention:
  *      replay the initial snapshot into the feed as 'U' changes at
  *      seq = Long.MinValue (exactly what the batch op does internally).
  *
  *   2. [[applyToLake]] — `foreachBatch` folding each micro-batch into a
  *      parquet changelog-lake via [[foldChangelog]]: the lake persists
  *      the winning (seq, op) PER KEY (`__seq`/`__op` bookkeeping
  *      columns), so late, out-of-order and duplicate changes resolve
  *      correctly ACROSS batches — a stale lower-seq update arriving
  *      after the fold cannot clobber a newer row, and a late update
  *      older than an applied tombstone stays dead. Tombstones are
  *      retained (dropping them would let any later stale 'U'
  *      resurrect the key); [[readView]] filters them at read time, and
  *      a compaction pass may drop those older than the feed's true
  *      lateness horizon. No executor state at all — the lake IS the
  *      state, the per-batch cost is one key-shuffle fold.
  *
  * At 100 TB: the view's aggregate carries one winning row per key
  * through ONE shuffle (map-side max_by partials combine first); the
  * lake fold touches lake + micro-batch once per trigger with no
  * driver-side materialization. CdcStreamSpec pins streamed == batch on
  * out-of-order, duplicate, tombstone and post-tombstone-stale feeds.
  */
object CdcStream {

  /** Current-state view of a changelog: max-seq change per key wins,
    * tombstones drop. Works unchanged on a batch OR streaming frame —
    * streaming runs it as one stateful aggregation in update mode.
    * `max_by` ties on equal seq are engine-arbitrary (as in the batch
    * op); feeds must make (key, seq) unique, which real CDC logs do.
    */
  def latestView(
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val payload =
      changes.columns.filterNot(Set(keyCol, seqCol, opCol)).toSeq
    changes
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(payload.map(col) :+ col(opCol): _*),
        col(seqCol).cast("long")).as("__w"))
      .filter(col(s"__w.$opCol") =!= "D")
      .select(col(keyCol) +: payload.map(p => col(s"__w.$p").as(p)): _*)
  }

  /** One associative fold step of a changelog-lake: union the current
    * lake (key, payload..., __seq, __op) with a batch of changes and
    * keep the max-seq version per key, TOMBSTONES INCLUDED. Associative
    * by construction — fold(fold(L, b1), b2) == fold(L, b1 ∪ b2) — so
    * micro-batch boundaries cannot change the result (pinned in spec).
    */
  def foldChangelog(
      lake: DataFrame,
      batch: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val payload =
      batch.columns.filterNot(Set(keyCol, seqCol, opCol)).toSeq
    val chg = batch.select(
      col(keyCol) +: payload.map(col)
        :+ col(seqCol).cast("long").as("__seq") :+ col(opCol).as("__op"): _*)
    lake.unionByName(chg)
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(payload.map(col) :+ col("__op"): _*), col("__seq")).as("__w"),
        max(col("__seq")).as("__seq"))
      .select(col(keyCol) +: payload.map(p => col(s"__w.$p").as(p))
        :+ col("__seq") :+ col(s"__w.__op").as("__op"): _*)
  }

  /** Continuous CDC apply into a parquet lake at `lakePath`:
    * `foreachBatch` reads the current lake (empty on first trigger),
    * folds the micro-batch with [[foldChangelog]], cuts lineage with an
    * eager `localCheckpoint` (the read-path/overwrite-path cycle breaker
    * — the lake is both input and output of one trigger), and
    * overwrites. Micro-batches commit sequentially, so the fold's
    * associativity makes the lake equal the batch apply of the whole
    * feed after any prefix.
    */
  def applyToLake(
      changes: DataFrame,
      lakePath: String,
      checkpointPath: String,
      keyCol: String,
      seqCol: String,
      opCol: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val payload =
          batch.columns.filterNot(Set(keyCol, seqCol, opCol)).toSeq
        // existence check through the Hadoop FileSystem API so the sink
        // works on HDFS/S3 paths too, not just the local filesystem —
        // a java.io.File probe is always false there and would silently
        // fold every micro-batch against a fresh empty lake
        val lakeHPath = new org.apache.hadoop.fs.Path(lakePath)
        val fs = lakeHPath.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val lake =
          if (fs.exists(lakeHPath))
            spark.read.parquet(lakePath)
          else
            batch.sparkSession.emptyDataFrame.select(
              // empty lake with the changelog-lake schema
              lit(null).cast(batch.schema(keyCol).dataType).as(keyCol)
                +: payload.map(p =>
                  lit(null).cast(batch.schema(p).dataType).as(p))
                :+ lit(null).cast("long").as("__seq")
                :+ lit(null).cast("string").as("__op"): _*
            ).limit(0)
        val next = foldChangelog(lake, batch, keyCol, seqCol, opCol)
          .cutLineage()
        next.write.mode("overwrite").parquet(lakePath)
        ()
      }
      .start()

  /** The lake's current-state view: tombstones and bookkeeping columns
    * dropped — what [[graft.ops.LakeOps.applyChanges]] would have
    * returned for the same feed.
    */
  def readView(spark: SparkSession, lakePath: String): DataFrame =
    spark.read.parquet(lakePath)
      .filter(col("__op") =!= "D")
      .drop("__seq", "__op")
}
