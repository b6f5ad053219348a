package graft.io

import scala.io.Source
import scala.util.Using

import graft.model.{JointSpec, VarSpec}

/** Config-file scans (S6): the reference's whitespace-delimited CSVs that
  * form its "query language" (`aggregate_functions.py:488-515`; formats
  * `examples/data_path.csv:1-6`, `examples/input_file_5km.csv:1-6`,
  * `examples/input_Jhist_5km.csv:1-6`). Driver-side parsing into typed
  * config — these files are a handful of lines, never distributed data.
  */
object ConfigScans {

  /** data_path.csv: two whitespace-delimited sections with header rows at
    * line 1 and line 5 — (input dirs + file prefixes) then (output dir +
    * prefix). Returns ((dataDir, dataPrefix), (geoDir, geoPrefix),
    * (outDir, outPrefix)).
    */
  def parseDataPaths(lines: Seq[String]): ((String, String), (String, String), (String, String)) = {
    val rows = lines.map(_.trim).filter(_.nonEmpty).map(_.split("\\s+").toSeq)
    require(rows.length >= 5, s"data_path config needs 5 non-empty lines, got ${rows.length}")
    // rows: header, MYD06, MYD03, header, output
    def pair(r: Seq[String]) = (r.head, r.lift(1).getOrElse(""))
    (pair(rows(1)), pair(rows(2)), pair(rows(4)))
  }

  /** Variable CSV: `<name> <comma-joined 1-D bin edges>` per line after the
    * header. The pseudo-variable `cloud_fraction_CM` is allowed (and in the
    * reference mandatory, `aggregate_functions.py:645-649`) — it routes to
    * the cloud-fraction aggregation, not a scanned column.
    */
  def parseVariables(lines: Seq[String]): Seq[VarSpec] =
    lines.map(_.trim).filter(_.nonEmpty).drop(1).map { line =>
      val parts = line.split("\\s+")
      val edges =
        if (parts.length > 1) parts(1).split(",").toSeq.filter(_.nonEmpty).map(_.toDouble)
        else Nil
      VarSpec(parts(0), edges)
    }

  /** Joint-histogram CSV: `<name> <jointName> <varIdx> <jointEdges>` — the
    * 0-based `varIdx` points at the partner variable's slot in the variable
    * list (`aggregate_functions.py:496-502`). Resolves indexes to names and
    * attaches [[JointSpec]]s.
    */
  def parseJointSpecs(lines: Seq[String], vars: Seq[VarSpec]): Seq[VarSpec] = {
    val specs = lines.map(_.trim).filter(_.nonEmpty).drop(1).map { line =>
      val parts = line.split("\\s+")
      require(parts.length >= 4, s"bad joint-histogram line: $line")
      val varIdx = parts(2).toInt
      require(varIdx >= 0 && varIdx < vars.length,
        s"joint Variable_Index $varIdx out of range for ${vars.length} variables")
      val edges = parts(3).split(",").toSeq.filter(_.nonEmpty).map(_.toDouble)
      parts(0) -> JointSpec(vars(varIdx).name, edges)
    }.toMap
    vars.map(v => specs.get(v.name).fold(v)(j => v.copy(joint = Some(j))))
  }

  def readLines(path: String): Seq[String] =
    Using.resource(Source.fromFile(path))(_.getLines().toSeq)
}
