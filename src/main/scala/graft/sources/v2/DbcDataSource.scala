package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Dbc, Dbf}

/** DataSource V2 connector for DATASUS `.dbc` / `.dbf` files:
  * `spark.read.format("dbc").load(glob)` (SURVEY §7 step 2's end state —
  * the decode scan S7 as a first-class source instead of a library call).
  *
  * Design for scale:
  *  - one InputPartition per file — a .dbc body is a single DCL stream
  *    (not splittable), but a 100 TB month is tens of thousands of files,
  *    which is exactly executor-grain parallelism;
  *  - schema from the first file's UNCOMPRESSED header prefix — schema
  *    inference never decompresses anything (parquet-footer-cheap);
  *  - column pruning pushed into the record parser: only requested fields
  *    are materialized from the fixed-width rows (SupportsPushDown
  *    RequiredColumns), the row-format analog of parquet ReadSchema;
  *  - `_file` metadata column (SupportsMetadataColumns) so P7 partition
  *    derivation (tipo/uf/competência from the name) needs no extra scan.
  */
class DbcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dbc"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val merged = Option(options.get("paths")).map(_.split(",").toSeq)
      .getOrElse(Seq.empty) ++ Option(options.get("path")).toSeq
    require(merged.nonEmpty, "dbc source: no path specified")
    merged
  }

  private def listFiles(globs: Seq[String]): Seq[String] = {
    val conf = new Configuration()
    globs.flatMap { g =>
      val p = new Path(g)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).toSeq.flatten.filter(_.isFile).map(_.getPath.toString)
    }.sorted
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = listFiles(paths(options))
    require(files.nonEmpty, s"dbc source: no files match ${paths(options)}")
    val conf = new Configuration()
    val p = new Path(files.head)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val head = try {
      val buf = new Array[Byte](65536)
      var n = 0
      var eof = false
      while (n < buf.length && !eof) {
        val r = in.read(buf, n, buf.length - n)
        if (r < 0) eof = true else n += r
      }
      buf
    } finally in.close()
    StructType(Dbf.parseHeader(head).fields.map(f =>
      StructField(f.name.toLowerCase, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new DbcTable(schema, listFiles(paths(opts)))
  }
}

/** Alias provider so `format("dbf")` also resolves (same reader — the
  * path extension decides whether a blast decompression runs). */
class DbfDataSource extends DbcDataSource {
  override def shortName(): String = "dbf"
}

object DbcTable {
  val FileColumn = "_file"
}

class DbcTable(schema: StructType, files: Seq[String])
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"dbc(${files.size} files)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = DbcTable.FileColumn
      override def dataType(): DataType = StringType
      override def comment(): String = "source file path"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DbcScanBuilder(schema, files,
      // per-read option, OR the fleet-wide knob every Spark file source
      // honors (spark.sql.files.ignoreCorruptFiles) — so an operator who
      // already runs parquet/orc permissively gets the same posture here
      // without learning a source-specific option. Captured at planning
      // time on the driver, like FileSourceScanExec does.
      permissive = "permissive".equalsIgnoreCase(options.getOrDefault("mode", "strict")) ||
        org.apache.spark.sql.internal.SQLConf.get.ignoreCorruptFiles)
}

class DbcScanBuilder(fullSchema: StructType, files: Seq[String], permissive: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new DbcScan(fullSchema, required, files, permissive)
}

class DbcScan(fullSchema: StructType, required: StructType, files: Seq[String],
              permissive: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"DbcScan[${required.fieldNames.mkString(",")}] (${files.size} files)"

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => DbcInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DbcReaderFactory(fullSchema.fieldNames, required.fieldNames, permissive)
}

case class DbcInputPartition(path: String) extends InputPartition

class DbcReaderFactory(allCols: Array[String], requiredCols: Array[String],
                       permissive: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DbcPartitionReader(partition.asInstanceOf[DbcInputPartition].path,
      allCols, requiredCols, permissive)
}

/** Reads one .dbc/.dbf file; materializes only the required fields.
  * `permissive = true` (option mode=permissive) skips undecodable files
  * with a warning instead of failing the task — the operational posture
  * for multi-decade public archives with occasional corrupt members. */
class DbcPartitionReader(path: String, allCols: Array[String], requiredCols: Array[String],
                         permissive: Boolean)
    extends PartitionReader[InternalRow] {

  // requested output position -> (-1 = _file metadata) or position within
  // the PRUNED record array — only required fields are ever decoded
  private val dataCols = requiredCols.filter(_ != DbcTable.FileColumn)
  private val outIdx: Array[Int] = {
    var p = -1
    requiredCols.map {
      case DbcTable.FileColumn => -1
      case _ => { p += 1; p }
    }
  }
  private val pathUtf8 = UTF8String.fromString(path)

  private lazy val rows: Iterator[Array[String]] =
    try {
      val p = new Path(path)
      val fs = p.getFileSystem(new Configuration())
      val len = fs.getFileStatus(p).getLen
      require(len <= Int.MaxValue - 16,
        s"dbc: file $path is $len bytes; single-stream compressed .dbc beyond 2 GB is unsupported")
      val in = fs.open(p)
      val bytes = try {
        val buf = new Array[Byte](len.toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
      // .dbc: stream the DECOMPRESSED side through the bounded Blast
      // window — the compressed input is the file's own size, but the
      // output (the side that can blow up) never materializes
      val (header, records) =
        if (path.toLowerCase.endsWith(".dbc")) {
          val (h, body) = Dbc.stream(bytes)
          (h, (idx: Array[Int]) => Dbf.recordsPrunedStream(h, body, idx))
        } else {
          val h = Dbf.parseHeader(bytes)
          (h, (idx: Array[Int]) => Dbf.recordsPruned(bytes, h, idx))
        }
      // resolve required names against THIS file's own header — under the
      // 87-vs-92-column monthly drift a positional mapping from the first
      // file would silently read wrong fixed-width offsets
      val fileCols = header.fields.map(_.name.toLowerCase)
      val idx = dataCols.map(c => fileCols.indexOf(c))
      if (idx.contains(-1)) {
        // columns absent in this file: decode the present ones, null the rest
        val present = idx.zipWithIndex.filter(_._1 >= 0)
        records(present.map(_._1)).map { arr =>
          val row = new Array[String](dataCols.length)
          present.map(_._2).zipWithIndex.foreach { case (outPos, i) => row(outPos) = arr(i) }
          row
        }
      } else records(idx)
    } catch {
      case e: Exception if permissive =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"dbc permissive mode: skipping undecodable file $path: ${e.getMessage}")
        Iterator.empty
    }

  /** Permissive mode must also absorb LAZY decode failures: the streaming
    * path surfaces mid-file corruption from the iterator, not at
    * construction. Rows decoded before the failure have already been
    * emitted (documented semantics: a corrupt tail truncates the file). */
  private def guarded(it: Iterator[Array[String]]): Iterator[Array[String]] =
    if (!permissive) it
    else new Iterator[Array[String]] {
      // The streaming decode (Dbf.recordsPrunedStream) does its work in the
      // underlying next() — hasNext alone throws nothing there. Prefetch in
      // hasNext so BOTH calls are guarded: mid-file corruption truncates the
      // iterator instead of failing the task.
      private var dead = false
      private var pending: Array[String] = _
      override def hasNext: Boolean = !dead && (pending != null || {
        try {
          if (it.hasNext) { pending = it.next(); true } else false
        } catch {
          case e: Exception =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"dbc permissive mode: truncating corrupt file $path: ${e.getMessage}")
            dead = true
            false
        }
      })
      override def next(): Array[String] = {
        if (!hasNext) throw new NoSuchElementException("next on exhausted dbc iterator")
        val r = pending; pending = null; r
      }
    }

  private lazy val safeRows = guarded(rows)

  private var current: Array[String] = _

  override def next(): Boolean = {
    if (safeRows.hasNext) { current = safeRows.next(); true } else false
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](outIdx.length)
    var i = 0
    while (i < outIdx.length) {
      vals(i) = outIdx(i) match {
        case -1 => pathUtf8
        case j => if (current(j) == null) null else UTF8String.fromString(current(j))
      }
      i += 1
    }
    InternalRow.fromSeq(vals.toSeq)
  }

  override def close(): Unit = ()
}
