package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.ops.ExperimentOps

/** Streaming twin of the calibration-bin aggregate
  * ([[graft.ops.ExperimentOps.calibrationBins]] — the shared pass under
  * `q_calibration_ece` / `q_isotonic_fit`): the IDENTICAL declarative
  * clamp → bin → (n, n_pos, Σscore) plan run as ONE stateful streaming
  * aggregation. State is the ≤11-row bin frame (constant-size no matter
  * the stream volume), so a scoring service can keep a live reliability
  * diagram over an unbounded prediction stream for the cost of eleven
  * counters.
  *
  * Because both run the same plan, streamed-final == batch by
  * construction on ANY arrival order or batch slicing —
  * CalibrationStreamSpec pins it on a shuffled multi-batch feed
  * (complete output mode: the sink always holds the current bins).
  */
object CalibrationStream {

  /** `(bin, n, n_pos, ssm)` over a streaming frame of
    * (label, ×10⁶ score) rows — attach to `writeStream` in complete (or
    * update) mode.
    */
  def bins(rows: DataFrame, label: Column, scoreMicro: Column): DataFrame =
    ExperimentOps.calibrationBins(rows, label, scoreMicro)
}
