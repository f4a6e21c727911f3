package graft.sources.synth

import java.util
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native DataSource V2 connector (`format("graft-synth")`): a
  * deterministic synthetic-document generator as a PROPER Spark table —
  * the extension surface for sources Spark has no reader for (internal
  * formats, RPC-backed systems, generators). Demonstrated end-to-end:
  * `TableProvider` → `ScanBuilder` with COLUMN-PRUNING pushdown
  * (`SupportsPushDownRequiredColumns` — a projection of `id` never
  * materializes the text) → split planning (`parts` input partitions,
  * each an id range: embarrassingly parallel, no driver materialization)
  * → per-partition readers emitting `InternalRow`s.
  *
  * Rows are pure functions of the id (`text` = md5 of the decimal id
  * string), so the DuckDB oracle replays the whole table from
  * `range(n)` — a hash-match proves the connector's planning, pruning,
  * partitioning, and row encoding end-to-end.
  *
  * Options: `rows` (total row count), `parts` (input partitions).
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** The row function — shared by every reader; lowercase-hex md5 of the
    * decimal id renders identically to SQL `md5(CAST(i AS VARCHAR))`.
    */
  def textOf(id: Long): String =
    MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}

private class SynthTable(rows: Long, parts: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new SynthScanBuilder(rows, parts)
}

private class SynthScanBuilder(rows: Long, parts: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SynthScan(rows, parts, required)
}

private class SynthScan(rows: Long, parts: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per)
      .map(lo => SynthRange(lo, math.min(lo + per, rows)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

private case class SynthRange(lo: Long, hi: Long) extends InputPartition

private class SynthReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val r = p.asInstanceOf[SynthRange]
      private var cur = r.lo - 1
      override def next(): Boolean = { cur += 1; cur < r.hi }
      // Only the PRUNED columns are computed: a projection of `id`
      // never pays the md5.
      override def get(): InternalRow =
        new GenericInternalRow(required.fields.map(_.name).map {
          case "id" => cur: Any
          case "text" => UTF8String.fromString(SynthSource.textOf(cur))
        }.toArray[Any])
      override def close(): Unit = ()
    }
}
