package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 granule source: the reference's granule scan (S2/S3 —
  * one file expands to N pixel rows, `aggregate_functions.py:99-223`) as a
  * native Spark source with the machinery a production HDF reader needs:
  *
  *   - **partition planning**: one `InputPartition` per granule, so task
  *     granularity is whole-file exactly like the reference's MPI/Dask
  *     split (`MODIS_Aggregation_MPI.py:51-63`) and tasks scale with the
  *     catalog, not with a fixed parallelism knob;
  *   - **column pruning**: `SupportsPushDownRequiredColumns` — a query
  *     touching 2 of 9 pixel columns decodes only those (the reference
  *     reads only user-listed variables, `:132-136`);
  *   - **schema**: the FIXTURES §1 pixel layout.
  *
  * The pixel CONTENT is synthesized deterministically from
  * (granule_id, pixel index) — the reference repo ships no HDF blobs
  * (`.MISSING_LARGE_BLOBS`), so the decode inner loop is a stand-in; every
  * planning/pruning/row-building code path is the real thing. Swapping in
  * an HDF4 decoder changes only [[GranulePixelReader.valueAt]].
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.GranuleSource")
  *   .option("granules", "A2008001.0005,A2008001.0100")
  *   .option("rows", "64").option("cols", "64")
  *   .load()
  * }}}
  */
class GranuleSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GranuleSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GranuleTable(new CaseInsensitiveStringMap(properties))
}

object GranuleSource {
  val schema: StructType = StructType(Seq(
    StructField("granule_id", StringType, nullable = false),
    StructField("day_of_year", IntegerType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("cm_byte", IntegerType, nullable = false),
    StructField("Cloud_Top_Pressure", DoubleType, nullable = true),
    StructField("Cloud_Top_Temperature", DoubleType, nullable = true)))
}

private class GranuleTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_granules"
  override def schema(): StructType = GranuleSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the merged properties; load-time options arrive here
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new GranuleScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class GranuleScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GranuleSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GranuleScan(options, required)
}

private class GranuleScan(options: CaseInsensitiveStringMap, required: StructType)
    extends Scan with Batch {
  private val granules: Array[String] =
    options.getOrDefault("granules", "").split(",").map(_.trim).filter(_.nonEmpty)
  private val rows = options.getOrDefault("rows", "64").toInt
  private val cols = options.getOrDefault("cols", "64").toInt

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GranuleScan[${granules.length} granules, ${rows}x$cols, " +
      s"pruned=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    granules.map(g => GranulePartition(g, rows, cols): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new GranuleReaderFactory(required)
}

/** One granule = one partition = one task (whole-file granularity). */
private case class GranulePartition(granuleId: String, rows: Int, cols: Int)
    extends InputPartition

private class GranuleReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GranulePixelReader(partition.asInstanceOf[GranulePartition], required)
}

/** Streams one granule's pixels as InternalRows, building ONLY the pruned
  * columns. Deterministic synthesis keyed by (granule_id, pixel index).
  */
private class GranulePixelReader(p: GranulePartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val n = p.rows * p.cols
  private var i = -1

  private val doy = p.granuleId.slice(5, 8).toIntOption.getOrElse(0)
  private val hour = p.granuleId.slice(9, 11).toIntOption.getOrElse(0)
  private val gidUtf8 = UTF8String.fromString(p.granuleId)
  private val seed = p.granuleId.hashCode.toLong & 0xffffffffL

  // cheap deterministic mix (splitmix64-style) — stands in for HDF decode
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unit(k: Long): Double = // in [0,1)
    (mix(seed * 1315423911L + k) >>> 11).toDouble / (1L << 53).toDouble

  private def valueAt(field: String): Any = field match {
    case "granule_id" => gidUtf8
    case "day_of_year" => doy
    case "hour" => hour
    case "row" => i / p.cols
    case "col" => i % p.cols
    case "lat" => unit(i * 4L) * 180.0 - 90.0
    case "lon" => unit(i * 4L + 1) * 360.0 - 180.0
    case "cm_byte" => (mix(seed + i) & 0x7).toInt
    case "Cloud_Top_Pressure" =>
      if (unit(i * 4L + 2) < 0.02) null else unit(i * 4L + 2) * 900.0 + 200.0
    case "Cloud_Top_Temperature" =>
      if (unit(i * 4L + 3) < 0.02) null else unit(i * 4L + 3) * 130.0 + 180.0
  }

  // pre-resolve the pruned fields once; reuse one row buffer per reader
  // (Spark copies rows it retains — standard PartitionReader contract)
  private val fieldNames: Array[String] = required.fields.map(_.name)
  private val rowBuf =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fieldNames.length)

  override def next(): Boolean = { i += 1; i < n }

  override def get(): InternalRow = {
    var j = 0
    while (j < fieldNames.length) {
      rowBuf.update(j, valueAt(fieldNames(j)))
      j += 1
    }
    rowBuf
  }

  override def close(): Unit = ()
}
