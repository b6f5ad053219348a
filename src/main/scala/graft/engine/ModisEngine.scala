package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.GridAggregation.PixelCols
import graft.expr.GridExprs
import graft.model.JobConfig

/** Full reference-pipeline orchestration (SURVEY §3): one call from pixel
  * frame to the complete L3 grid frame, combining
  *
  *   - the day-definition correction (P4) on every measured variable and
  *     the cloud mask,
  *   - per-variable statistics (A1-A7) via [[GridAggregation.aggregate]],
  *   - the cloud-fraction two-level aggregation (A8/A9) when the config
  *     lists the reference's pseudo-variable `cloud_fraction_CM`,
  *
  * joined on the grid cell. The join is cell-keyed over <= grid-cell-count
  * rows — broadcast-size by construction, so combining the aggregates never
  * re-shuffles pixel-scale data.
  */
object ModisEngine {

  val CloudFractionVar = "cloud_fraction_CM"

  /** Apply the day-definition null-out to all measured variables and the
    * cloud-mask flag (reference applies it to every `data[key]` and CM,
    * `aggregate_functions.py:317-350`). Requires `day_of_year` and `hour`
    * columns (from the granule catalog / filename metadata).
    */
  def withDayDefinition(
      pixels: DataFrame,
      cfg: JobConfig,
      d0: Int,
      d1: Int,
      cols: PixelCols = PixelCols()): DataFrame = {
    // correct the cloud-mask flag only when present — a frame without it is
    // legal when no cloud-fraction statistic is configured
    val varNames = cfg.vars.map(_.name).filterNot(_ == CloudFractionVar) ++
      (if (pixels.columns.contains(cols.cmFlag)) Seq(cols.cmFlag) else Nil)
    varNames.foldLeft(pixels) { (df, v) =>
      df.withColumn(v, GridExprs.dayDefinitionNullOut(
        col(v), col("day_of_year"), col("hour"), col(cols.lon),
        d0, d1, cfg.shiftHour))
    }
  }

  /** Pixel frame -> complete L3 grid frame (cell + every configured
    * statistic). Pass `dayWindow = Some((d0, d1))` to apply the
    * day-definition correction first.
    */
  def dailyL3(
      pixels: DataFrame,
      cfg: JobConfig,
      dayWindow: Option[(Int, Int)] = None,
      cols: PixelCols = PixelCols()): DataFrame = {
    val corrected = dayWindow.fold(pixels) { case (d0, d1) =>
      withDayDefinition(pixels, cfg, d0, d1, cols)
    }
    val sampled =
      if (cfg.sampling > 1)
        corrected.filter(GridExprs.systematicSample(col("row"), col("col"), cfg.sampling))
      else corrected

    // A joint-histogram partner must be a real data column; the reference
    // would KeyError on a jhist spec pointing at the cloud_fraction_CM
    // pseudo-variable (its `data` dict never holds that key), so the engine
    // rejects the same configs by dropping the unusable joint spec.
    val dataVars = cfg.vars.filterNot(_.name == CloudFractionVar).map { v =>
      if (v.joint.exists(_.jointVar == CloudFractionVar)) v.copy(joint = None) else v
    }
    val wantCf = cfg.vars.exists(_.name == CloudFractionVar)

    val statsOpt =
      if (dataVars.nonEmpty)
        Some(GridAggregation.aggregate(sampled, cfg.copy(vars = dataVars), cols))
      else None
    val cfOpt =
      if (wantCf) Some(GridAggregation.cloudFraction(sampled, cfg, cols))
      else None

    (statsOpt, cfOpt) match {
      case (Some(s), Some(c)) => s.join(c, Seq("cell"), "full_outer")
      case (Some(s), None) => s
      case (None, Some(c)) => c
      case (None, None) =>
        throw new IllegalArgumentException("JobConfig.vars is empty")
    }
  }

  /** Multi-day (e.g. monthly) L3 aggregation in ONE distributed pass —
    * reference Example 2 (`examples/local_execution/
    * MODIS_Aggregation_Local_Commands.sh:31`). The reference's date loop
    * (`aggregate_functions.py:573-604`) expands every day of
    * `[dStart, dEnd]` at all 24 hours and, for the END day only, appends the
    * first `shiftHour` hours of day `dEnd + 1` (the orbit-gap spill); the
    * day-definition null-out then runs with `day_in_year = [dEnd, dEnd+1]`
    * — the LAST loop iteration's pair is what reaches `run_modis_aggre`
    * (`:595`, `:682`), so interior days are never nulled.
    *
    * One `filter` + one aggregation over the whole range: no per-day
    * driver loop, no repeated scans — at 100 TB the month is a single
    * scan-bound job whose only shuffle is the cell-keyed merge.
    */
  def rangeL3(
      pixels: DataFrame,
      cfg: JobConfig,
      dStart: Int,
      dEnd: Int,
      cols: PixelCols = PixelCols()): DataFrame = {
    val doy = col("day_of_year")
    val inRange =
      (doy >= dStart && doy <= dEnd) ||
        (doy === dEnd + 1 && col("hour") < cfg.shiftHour)
    dailyL3(pixels.filter(inRange), cfg, Some((dEnd, dEnd + 1)), cols)
  }
}
