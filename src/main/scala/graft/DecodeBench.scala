package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

/** Decode-throughput probe against the reference's headline number
  * (BASELINE.md: 1,647,861 records / ~150 MB .dbc in ~2 min ≈ 13.7k rec/s
  * on the converter; record shape ≈ 92 cols / ~98 bytes). Builds a
  * same-shaped .dbc corpus and times the full Spark pipeline (scan →
  * blast → DBF parse → aggregate). Dev tool, not driver contract. */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(500000)
    val nFiles = 8
    val nCols = 92

    // build one wide DBF directly as bytes (92 single/double-char fields)
    val widths = Array.tabulate(nCols)(i => if (i % 6 == 0) 6 else 1)
    val recordSize = 1 + widths.sum
    val headerSize = 32 + 32 * nCols + 1
    val perFile = nRecords / nFiles

    def buildDbc(seed: Int): Array[Byte] = {
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
      val imploded = sources.Blast.implodeStored(body)
      val out = new java.io.ByteArrayOutputStream()
      out.write(head.array())
      out.write(Array[Byte](0, 0, 0, 0))
      out.write(imploded)
      out.toByteArray
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_decode").toFile
    (0 until nFiles).foreach { f =>
      java.nio.file.Files.write(new java.io.File(dir, f"WIDE${f}%02dPE2501.dbc").toPath, buildDbc(f))
    }
    val totalBytes = dir.listFiles().map(_.length).sum

    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up then timed
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = spark.read.format("dbc").load(s"$dir/WIDE*.dbc")
        .agg(count(lit(1)), countDistinct(col("c3"))).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      if (pass == 2)
        println(f"[decode-bench] $n%d records, 92 cols, ${totalBytes / 1e6}%.1f MB dbc in $secs%.2f s = ${n / secs / 1000}%.1f k rec/s (full projection pass below)")
    }
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val wide = spark.read.format("dbc").load(s"$dir/WIDE*.dbc")
      // force a genuine all-column decode: every field feeds the aggregate
      // (a bare select would be pruned back into the scan)
      val n = wide
        .agg(count(lit(1)),
          sum(length(concat_ws("|", wide.columns.map(col): _*))))
        .collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      if (pass == 2)
        println(f"[decode-bench] full 92-col materialization: $n%d records in $secs%.2f s = ${n / secs / 1000}%.1f k rec/s")
    }
    spark.stop()
  }
}
