package graft.sources

import java.util.{Map => JMap}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Custom DataSource V2 batch SINK with a two-phase commit protocol —
  * the write-side twin of [[GraftGenSource]]
  * (`df.write.format("graft.sources.GraftCommitSink").option("path", dir)`).
  *
  * Demonstrates the full connector write surface a real sink (a feature
  * store, a proprietary export format, an object-store table) must get
  * right at 1000-executor scale, where task retries and speculative
  * duplicates are ROUTINE, not rare:
  *
  *  - each task's `DataWriter` streams rows to an ATTEMPT-UNIQUE temp
  *    file under `_temp/` (partitionId + taskId in the name — two
  *    attempts of the same partition can never collide);
  *  - task `commit()` only names the temp file in its
  *    `WriterCommitMessage` — nothing becomes visible;
  *  - the driver's `BatchWrite.commit()` is the single publish point:
  *    it renames exactly one temp per partition to its final
  *    `part-NNNNN.tsv` name and writes the `_GRAFT_COMMIT` manifest
  *    (file list + row counts) LAST, so a reader that requires the
  *    manifest never sees a torn write;
  *  - `abort()` (driver) and the writer's own `abort()` delete temps, so
  *    failed/speculative attempts leave no visible output.
  *
  * Rows serialize as TSV (long/int/double/string columns — doubles via
  * the same shortest-repr `toString` both engines print). Overwrite mode
  * maps to `SupportsTruncate`: the truncate flag makes the driver commit
  * clear previously-published parts before renaming the new generation
  * in. Uses the Hadoop FileSystem API throughout, so the same code
  * drives HDFS/S3A in production and the local FS here.
  */
class GraftCommitSink extends TableProvider {
  // write-only source: the schema always comes from the incoming frame
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("GraftCommitSink requires option 'path'"))
    new GraftCommitTable(path, schema)
  }
}

class GraftCommitTable(path: String, writeSchema: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_commit_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCommitWriteBuilder(path, info.schema())
}

class GraftCommitWriteBuilder(path: String, schema: StructType)
  extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new GraftCommitWrite(path, schema, truncateFirst)
}

/** Message a task commit sends the driver: the attempt's temp file plus
  * its identity — the driver publishes exactly one attempt per partition. */
case class GraftTempFile(tmp: String, partitionId: Int, taskId: Long,
  rows: Long) extends WriterCommitMessage

class GraftCommitWrite(path: String, schema: StructType, truncateFirst: Boolean)
  extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCommitWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    if (truncateFirst) {
      // clear the previous generation BEFORE publishing the new one —
      // overwrite is a driver-side swap, never a task-side delete
      val old = fs.globStatus(new Path(dir, "part-*"))
      if (old != null) old.foreach(s => fs.delete(s.getPath, false))
      fs.delete(new Path(dir, "_GRAFT_COMMIT"), false)
    }
    // one attempt per partition becomes visible (retries/speculation may
    // have produced several messages per partition — first wins, the
    // rest stay in _temp and are swept below)
    val chosen = messages.collect { case m: GraftTempFile => m }
      .groupBy(_.partitionId).toSeq.sortBy(_._1)
      .map { case (_, ms) => ms.minBy(_.taskId) }
    val published = chosen.map { m =>
      val fin = new Path(dir, f"part-${m.partitionId}%05d.tsv")
      if (!fs.rename(new Path(m.tmp), fin))
        throw new java.io.IOException(s"publish failed for ${m.tmp}")
      (fin.getName, m.rows)
    }
    // the manifest is written LAST: readers keyed on it never observe a
    // partially-published generation
    val out = fs.create(new Path(dir, "_GRAFT_COMMIT"), true)
    out.write(published.map { case (f, r) => s"$f\t$r" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
    fs.delete(new Path(dir, "_temp"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    fs.delete(new Path(path, "_temp"), true)
  }
}

class GraftCommitWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCommitDataWriter(path, schema, partitionId, taskId)
}

class GraftCommitDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val tmp =
    new Path(path, f"_temp/attempt-$partitionId%05d-$taskId.tsv")
  // default Hadoop conf resolves the local FS here; a cluster deployment
  // threads the serialized job conf through the factory instead
  private val fs = tmp.getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"))
  private var rows = 0L

  // one formatter per column, resolved once (never a per-row type match)
  private val fmt: Array[InternalRow => String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType => (r: InternalRow) => r.getLong(i).toString
        case IntegerType => (r: InternalRow) => r.getInt(i).toString
        case DoubleType => (r: InternalRow) => r.getDouble(i).toString
        case StringType => (r: InternalRow) => r.getUTF8String(i).toString
        case other => throw new IllegalArgumentException(
          s"GraftCommitSink supports long/int/double/string, got $other")
      }
    }

  override def write(record: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (i > 0) sb.append('\t')
      sb.append(fmt(i)(record))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftTempFile(tmp.toString, partitionId, taskId, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    fs.delete(tmp, false)
    ()
  }

  override def close(): Unit = ()
}
