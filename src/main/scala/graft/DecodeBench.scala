package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decode-throughput probe against the reference's headline number
  * (BASELINE.md: 1,647,861 records / ~150 MB .dbc in ~2 min ≈ 13.7k rec/s
  * on the converter; record shape ≈ 92 cols / ~98 bytes). Builds a
  * same-shaped .dbc corpus (coded-literal mode — the branch real PKWare
  * streams use) and times the full Spark pipeline (scan → blast → DBF
  * parse → aggregate). `measure` is reused by Bench for the per-round
  * JSON; the corpus is cached under /tmp across runs. */
object DecodeBench {

  // 32 files: the decode grain is the file, so the corpus must carry at
  // least as many files as the driver's local[32] has threads
  private val nFiles = 32
  private val nCols = 92

  /** Cache key version: bump whenever the generator changes (shape or
    * implode mode), or a stale /tmp corpus silently benchmarks the old
    * format. v2 = coded-literal implode; v3 = 32-file parallel grain. */
  private val CorpusVersion = "v3coded32"

  /** Build (or reuse) the 92-col corpus; returns its directory. */
  def ensureCorpus(nRecords: Int): java.io.File = synchronized {
    val dir = new java.io.File(s"/tmp/graft_decode_corpus_${CorpusVersion}_$nRecords")
    val marker = new java.io.File(dir, "_OK")
    if (marker.exists()) return dir
    dir.mkdirs()

    require(nRecords >= nFiles, s"decode corpus needs >= $nFiles records")
    val widths = Array.tabulate(nCols)(i => if (i % 6 == 0) 6 else 1)
    val recordSize = 1 + widths.sum
    val headerSize = 32 + 32 * nCols + 1
    // distribute the remainder so the corpus holds EXACTLY nRecords
    def fileRecords(f: Int): Int = nRecords / nFiles + (if (f < nRecords % nFiles) 1 else 0)

    def buildDbc(seed: Int): Array[Byte] = {
      val perFile = fileRecords(seed)
      val head = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
      head.put(0, 0x03.toByte)
      head.putInt(4, perFile)
      head.putShort(8, headerSize.toShort)
      head.putShort(10, recordSize.toShort)
      var off = 32
      (0 until nCols).foreach { i =>
        val nb = s"C$i".getBytes(ISO_8859_1)
        (0 until nb.length).foreach(k => head.put(off + k, nb(k)))
        head.put(off + 11, 'C'.toByte)
        head.put(off + 16, widths(i).toByte)
        off += 32
      }
      head.put(off, 0x0D.toByte)
      val body = new Array[Byte](perFile * recordSize)
      var r = 0
      var p = 0
      while (r < perFile) {
        body(p) = 0x20
        var c = 1
        var i = 0
        while (i < nCols) {
          var w = 0
          while (w < widths(i)) {
            body(p + c) = ('0' + ((r + i + w + seed) % 10)).toByte
            c += 1; w += 1
          }
          i += 1
        }
        r += 1; p += recordSize
      }
      // coded-literal mode (no match search: linear build, and the decode
      // cost it measures is the conservative all-literals worst case)
      val imploded = sources.Blast.implodeCodedLiterals(body)
      val out = new java.io.ByteArrayOutputStream()
      out.write(head.array())
      out.write(Array[Byte](0, 0, 0, 0))
      out.write(imploded)
      out.toByteArray
    }

    (0 until nFiles).foreach { f =>
      java.nio.file.Files.write(
        new java.io.File(dir, f"WIDE${f}%02dPE2501.dbc").toPath, buildDbc(f))
    }
    java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    dir
  }

  /** (prunedRecPerSec, full92ColRecPerSec) — warm-up pass then timed. */
  def measure(spark: SparkSession, nRecords: Int = 500000): (Double, Double) = {
    val dir = ensureCorpus(nRecords)

    var pruned = 0.0
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = spark.read.format("dbc").load(s"$dir/WIDE*.dbc")
        .agg(count(lit(1)), countDistinct(col("c3"))).collect()(0).getLong(0)
      if (pass == 2) pruned = n / ((System.nanoTime() - t0) / 1e9)
    }
    var full = 0.0
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val wide = spark.read.format("dbc").load(s"$dir/WIDE*.dbc")
      // force a genuine all-column decode: every field feeds the aggregate
      // (a bare select would be pruned back into the scan)
      val n = wide
        .agg(count(lit(1)),
          sum(length(concat_ws("|", wide.columns.map(col).toSeq: _*))))
        .collect()(0).getLong(0)
      if (pass == 2) full = n / ((System.nanoTime() - t0) / 1e9)
    }
    (pruned, full)
  }

  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (pruned, full) = measure(spark, nRecords)
    println(f"[decode-bench] $nRecords%d records, $nCols%d cols: pruned ${pruned / 1000}%.1f k rec/s, full ${full / 1000}%.1f k rec/s")
    spark.stop()
  }
}
