package graft.sources

import java.security.MessageDigest
import java.util.{Map => JMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Custom DataSource V2: a deterministic synthetic document-id generator
  * (`spark.read.format("graft.sources.GraftGenSource").option("rows", n)`).
  *
  * Demonstrates the full batch-read connector surface a real source
  * (a proprietary log format, a feature store, an object-store manifest)
  * would implement: `TableProvider` → `Table` → `ScanBuilder` with
  * COLUMN PRUNING pushdown (`SupportsPushDownRequiredColumns` — a
  * projection of `bucket` never materializes the md5 payload; PlanSpec
  * asserts the pruned BatchScan output) → `planInputPartitions` splitting
  * the id range into independent splits (parallel, no driver
  * materialization; at 100 TB, splits = file/block ranges) → per-split
  * `PartitionReader`. Rows are a pure function of the id, so the whole
  * table is reproducible anywhere — DuckDB's range() serves as the
  * oracle.
  */
class GraftGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftGenTable(
      math.max(0L, Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)),
      math.max(1, Option(properties.get("partitions")).map(_.toInt).getOrElse(8)))
}

object GraftGenSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", IntegerType, nullable = false)
    .add("payload", StringType, nullable = false)
}

class GraftGenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GraftGenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftGenScanBuilder(rows, parts)
}

class GraftGenScanBuilder(rows: Long, parts: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftGenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftGenScan(rows, parts, required)
}

case class GraftGenPartition(start: Long, end: Long) extends InputPartition

class GraftGenScan(rows: Long, parts: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by step)
      .map(s => GraftGenPartition(s, math.min(s + step, rows)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftGenReaderFactory(required)
}

class GraftGenReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val GraftGenPartition(start, end) = partition
    // one digest per reader (getInstance is a JCA provider lookup — far
    // too expensive per row) and one generator per REQUIRED column, in
    // pruned-schema order: an un-requested payload costs zero md5 calls
    val digest = MessageDigest.getInstance("MD5")
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "id" => (i: Long) => i
      case "bucket" => (i: Long) => (i % 32).toInt
      case "payload" => (i: Long) =>
        UTF8String.fromString(
          GraftGenReaderFactory.md5Hex(digest, i.toString))
    })
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(i)))
      override def close(): Unit = ()
    }
  }
}

object GraftGenReaderFactory {
  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(digest: MessageDigest, s: String): String = {
    digest.reset()
    val bytes = digest.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexDigits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
