package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{FloatType, IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's native table format: a
  * `.det` catalog (schema) plus a tab-separated `.txt` data file
  * (reference src/RandomDB.java / ConvertTxtToTbl.java).
  *
  * {{{
  *   spark.read.format("graft.sources.DetDataSource")
  *     .load("/path/to/CUSTOMER")        // expects CUSTOMER.det + CUSTOMER.txt
  * }}}
  *
  * Implements column pruning (`SupportsPushDownRequiredColumns`): only the
  * projected fields are parsed out of each line. One input partition per
  * table — the reference's files are single small text files; a
  * scale-path implementation would split on byte ranges like the built-in
  * text source.
  */
class DetDataSource extends TableProvider {
  private def basePath(options: CaseInsensitiveStringMap): String = {
    val paths = options.get("paths")
    if (paths != null && paths.startsWith("[")) // JSON array from .load(path)
      paths.stripPrefix("[\"").stripSuffix("\"]")
    else Option(options.get("path")).getOrElse(sys.error("det source: no path given"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DetSource.parseDet(basePath(options) + ".det").structType

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DetTable(basePath(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = true
}

final class DetTable(path: String, tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = path
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DetScanBuilder(path, tableSchema)
}

final class DetScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new DetScan(path, full, required)
}

final class DetScan(path: String, full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(DetInputPartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new DetReaderFactory(full, required)
}

final case class DetInputPartition(path: String) extends InputPartition

final class DetReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[DetInputPartition].path
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(path + ".txt")
      private val it = lines.getLines()
      private var row: InternalRow = _
      // parse only the projected fields, by position in the full schema
      private val picks = required.fields.map(f => full.fieldIndex(f.name))

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val line = it.next()
        if (line.isEmpty) return next()
        val cells = line.split("\t")
        val vals = new Array[Any](picks.length)
        var i = 0
        while (i < picks.length) {
          val raw = cells(picks(i))
          vals(i) = required.fields(i).dataType match {
            case IntegerType => raw.toInt
            case FloatType   => raw.toFloat
            case StringType  => UTF8String.fromString(raw)
          }
          i += 1
        }
        row = new GenericInternalRow(vals)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}
