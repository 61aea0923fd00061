package graft.sources

import java.util.{Map => JMap}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** The READ side of the [[GraftCommitSink]] commit protocol — a DSv2
  * source that reads a sink directory THROUGH its `_GRAFT_COMMIT`
  * manifest
  * (`spark.read.format("graft.sources.GraftManifestSource")
  *   .schema(s).option("path", dir)`).
  *
  * This is the contract the sink's manifest-last publish exists for: a
  * glob over `part-*` could observe a torn generation (a crashed
  * overwrite legitimately leaves BOTH generations' files on disk — the
  * sink's crash-safety design), while the manifest reader sees exactly
  * one committed generation or fails closed:
  *
  *  - the DRIVER reads the manifest once and plans ONE InputPartition
  *    per listed part file (at 1000-executor scale, splits = files;
  *    nothing else in the directory is ever opened);
  *  - a listed-but-missing file is a clear error, never a silent skip;
  *  - each reader asserts its file's row count against the manifest's
  *    per-file count — a truncated or appended-to part fails loudly;
  *  - rows parse with the sink's exact TSV conventions (long / int /
  *    double / string, `\N` = NULL, [[GraftTsv]] escaping for
  *    backslash/tab/newline/CR in strings), so sink→source round-trips
  *    are lossless including nulls and delimiter-bearing values;
  *  - column pruning pushes down (`SupportsPushDownRequiredColumns`):
  *    an un-requested column is never converted, only skipped past;
  *  - the job's Hadoop conf threads to executors via
  *    [[SerializableHadoopConf]] — the same single-filesystem rule the
  *    sink's writers follow.
  *
  * The schema is caller-supplied (the TSV carries no header — like any
  * schema-on-read export format, the contract travels out of band).
  *
  * TIME TRAVEL (round 12): `option("generation", g)` reads the table AS
  * OF generation g through the sink's immutable per-generation manifest
  * `_GRAFT_COMMIT.gGGGG` (the commit log the sink publishes alongside
  * the current pointer). Every historical generation of an append-mode
  * table is fully readable; a generation vacuumed by a later TRUNCATE
  * fails loudly on its missing parts (the fail-closed contract, never a
  * silently thinner result). No option = the current manifest. */
class GraftManifestSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "GraftManifestSource needs an explicit reader schema (.schema(...)): " +
        "the sink's TSV carries no header")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "GraftManifestSource requires option 'path'"))
    val gen = Option(properties.get("generation")).map { g =>
      val v = try g.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"option 'generation' must be a non-negative integer, got '$g'")
      }
      require(v >= 0L, s"option 'generation' must be >= 0, got $v")
      v
    }
    new GraftManifestTable(path, schema, gen)
  }
}

class GraftManifestTable(path: String, readSchema: StructType,
    generation: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"graft_manifest($path)"
  override def schema(): StructType = readSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftManifestScanBuilder(path, readSchema, generation)
}

class GraftManifestScanBuilder(path: String, full: StructType,
    generation: Option[Long])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new GraftManifestScan(path, full, required, generation)
}

/** One committed part file: its path, the manifest's row count, and the
  * column width it was committed at (-1 = legacy strict entry). */
case class GraftManifestPartition(file: String, rows: Long, ncols: Int)
  extends InputPartition

class GraftManifestScan(path: String, full: StructType,
    required: StructType, generation: Option[Long])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    // as-of read: resolve the immutable per-generation manifest instead
    // of the current pointer (a generation never published here is a
    // clear error — "which generations exist" is a directory listing of
    // _GRAFT_COMMIT.g*, not a guess)
    val man = generation match {
      case Some(g) => new Path(dir, f"_GRAFT_COMMIT.g$g%04d")
      case None => new Path(dir, "_GRAFT_COMMIT")
    }
    if (!fs.exists(man))
      throw new java.io.FileNotFoundException(generation match {
        case Some(g) =>
          s"no generation-$g manifest (${man.getName}) under $path — " +
            "that generation was never committed here, or was vacuumed " +
            "by a later truncate/retention sweep"
        case None =>
          s"no _GRAFT_COMMIT manifest under $path — nothing is committed here"
      })
    val (_, _, entries) = GraftCommitMeta.readManifestFile(fs, man)
    entries.map { e =>
      val fp = new Path(dir, e.file)
      // fail-closed: a listed file must exist BEFORE tasks launch
      if (!fs.exists(fp))
        throw new java.io.FileNotFoundException(
          s"manifest lists ${e.file} but it is missing under $path — torn commit")
      GraftManifestPartition(fp.toString, e.rows, e.ncols): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftManifestReaderFactory(full, required, new SerializableHadoopConf(
      org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration))
}

class GraftManifestReaderFactory(full: StructType, required: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val GraftManifestPartition(file, wantRows, ncols) = partition
    // (source field index, converter) per REQUIRED column, in required
    // order — an un-requested column is skipped, never converted
    val srcIdx = required.fields.map(f => full.fieldIndex(f.name))
    val convs: Array[String => Any] = required.fields.map { f =>
      f.dataType match {
        case LongType => (s: String) => java.lang.Long.valueOf(s)
        case IntegerType => (s: String) => java.lang.Integer.valueOf(s)
        case DoubleType => (s: String) => java.lang.Double.valueOf(s)
        // sink-symmetric decode: the writer escaped \ / tab / LF / CR in
        // string fields, so a literal "\N" value (escaped "\\N" on disk)
        // never collides with the NULL token checked below
        case StringType => (s: String) => UTF8String.fromString(GraftTsv.unescape(s))
        case other => throw new IllegalArgumentException(
          s"GraftManifestSource supports long/int/double/string, got $other")
      }
    }
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    new PartitionReader[InternalRow] {
      private var line: String = _
      private var seen = 0L
      override def next(): Boolean = {
        line = in.readLine()
        if (line == null) {
          // the manifest's count is the commit's truth: fewer rows =
          // a truncated part, and a longer file fails in get() below
          if (seen != wantRows) throw new java.io.IOException(
            s"$file has $seen rows, manifest committed $wantRows — torn part")
          false
        } else {
          seen += 1
          if (seen > wantRows) throw new java.io.IOException(
            s"$file exceeds the manifest's $wantRows rows — appended-to part")
          true
        }
      }
      override def get(): InternalRow = {
        val cells = line.split("\t", -1)
        // SCHEMA EVOLUTION (round 13): the manifest records each file's
        // committed width — a row must parse EXACTLY that width
        // (anything else is corruption, refused loudly: the TSV is
        // headerless, so a short/long row would otherwise shift columns
        // silently), and a column APPENDED after this file was written
        // (index ≥ its width) surfaces NULL — the mergeSchema contract
        // through the manifest path. Legacy entries (ncols = -1, written
        // before widths were recorded) keep their strict pre-evolution
        // semantics.
        if (ncols >= 0 && cells.length != ncols)
          throw new java.io.IOException(
            s"$file row has ${cells.length} fields, committed width is " +
              s"$ncols — corrupt row")
        val out = new Array[Any](srcIdx.length)
        var i = 0
        while (i < srcIdx.length) {
          val si = srcIdx(i)
          out(i) =
            if (si >= cells.length) {
              if (ncols >= 0) null
              else throw new java.io.IOException(
                s"$file row has ${cells.length} fields, reader needs " +
                  s"column ${si + 1} — corrupt row (legacy strict entry)")
            } else {
              val raw = cells(si)
              if (raw == "\\N") null else convs(i)(raw)
            }
          i += 1
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = in.close()
    }
  }
}
