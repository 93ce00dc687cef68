package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.{ByteBuffer, ByteOrder}

/** dBASE III/IV (.dbf) reader + writer.
  *
  * Mirrors the reference converter's semantics (dbfread with
  * encoding='latin1', /root/reference/OTIMIZACAO_API_PYTHON.md:197-204;
  * all values stringified per DIAGNOSTICO_TAMANHO_JSON.md:246-251): every
  * field is decoded latin1, trimmed, and surfaced as a nullable string —
  * typed projection is a downstream `cast`, exactly like the reference's
  * all-TEXT Postgres tables (ESTRUTURA_DADOS_PROCESSADOS.md:179-187).
  *
  * Layout (public dBASE spec): 32-byte header (record count at 4, header
  * size at 8, record size at 10, all LE), then 32-byte field descriptors
  * (name 11B NUL-padded, type 1B, length at 16, decimals at 17) until the
  * 0x0D terminator; records are fixed-width, each prefixed by a deletion
  * flag (0x20 live, 0x2A deleted).
  */
object Dbf {

  final case class Field(name: String, ftype: Char, length: Int, decimals: Int)
  final case class Header(nRecords: Int, headerSize: Int, recordSize: Int, fields: Seq[Field])

  def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= 32, "dbf: truncated header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xFFFF
    val recordSize = bb.getShort(10) & 0xFFFF
    val fields = Seq.newBuilder[Field]
    var off = 32
    while (off + 32 <= bytes.length && off < headerSize && (bytes(off) & 0xFF) != 0x0D) {
      val nameEnd = {
        var i = 0
        while (i < 11 && bytes(off + i) != 0) i += 1
        i
      }
      val name = new String(bytes, off, nameEnd, ISO_8859_1)
      val ftype = (bytes(off + 11) & 0xFF).toChar
      val len = bytes(off + 16) & 0xFF
      val dec = bytes(off + 17) & 0xFF
      fields += Field(name, ftype, len, dec)
      off += 32
    }
    val fs = fields.result()
    // header fields are attacker-controlled and independently encoded:
    // a recordSize smaller than the declared field layout would let the
    // per-field string reads run past the record (and, at the end of the
    // buffer, past the file); recordSize 0 would spin the record loop
    require(recordSize >= 1 + fs.iterator.map(_.length).sum,
      s"dbf: recordSize $recordSize < 1 + field widths ${fs.iterator.map(_.length).sum}")
    Header(nRecords, headerSize, recordSize, fs)
  }

  /** Trim-before-allocate field decode: find the content span at the
    * byte level (String.trim strips chars <= 0x20, which for latin1 is
    * exactly bytes <= 0x20 — multi-byte expansion cannot occur), then
    * allocate ONE String for the span, or none for a blank field. The
    * naive shape (new String(...).trim, null-if-empty) allocates twice
    * for every padded field and once for every blank field — on the
    * 92-column decode path that is the single hottest allocation site
    * in the engine. Semantics are identical by construction and pinned
    * by DbcSpec/DbcFuzzSpec. */
  @inline private def fieldString(buf: Array[Byte], from: Int, width: Int): String = {
    var a = from
    val end = from + width
    while (a < end && (buf(a) & 0xFF) <= 0x20) a += 1
    var b = end
    while (b > a && (buf(b - 1) & 0xFF) <= 0x20) b -= 1
    if (a >= b) null else new String(buf, a, b - a, ISO_8859_1)
  }

  /** Iterate live records as trimmed latin1 strings (null for blank). */
  def records(bytes: Array[Byte]): Iterator[Array[String]] = {
    val h = parseHeader(bytes)
    recordsPruned(bytes, h, h.fields.indices.toArray)
  }

  /** Pruned record iteration: materialize only `fieldIdx` (in that order).
    * Wide DATASUS files are ~92 columns (DIAGNOSTICO_TAMANHO_JSON.md:99-103);
    * a 3-column projection should decode 3 columns — this is the
    * row-format half of the DSv2 column pruning contract. */
  def recordsPruned(bytes: Array[Byte], h: Header, fieldIdx: Array[Int]): Iterator[Array[String]] = {
    val widths = h.fields.map(_.length).toArray
    val offsets = new Array[Int](widths.length)
    var acc = 1 // skip deletion flag
    var fi = 0
    while (fi < widths.length) { offsets(fi) = acc; acc += widths(fi); fi += 1 }
    new Iterator[Array[String]] {
      private var off = h.headerSize
      private var emitted = 0
      private var nextRow: Array[String] = null

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && emitted < h.nRecords && off + h.recordSize <= bytes.length) {
          val deleted = (bytes(off) & 0xFF) == 0x2A
          if (!deleted) {
            val row = new Array[String](fieldIdx.length)
            var i = 0
            while (i < fieldIdx.length) {
              val f = fieldIdx(i)
              row(i) = fieldString(bytes, off + offsets(f), widths(f))
              i += 1
            }
            nextRow = row
          }
          off += h.recordSize
          emitted += 1
        }
      }

      advance()
      def hasNext: Boolean = nextRow != null
      def next(): Array[String] = { val r = nextRow; advance(); r }
    }
  }

  /** Streaming variant of [[recordsPruned]]: records arrive from an
    * InputStream (e.g. Blast.ExplodeInputStream) in fixed-width frames —
    * O(recordSize) memory regardless of file size. Short trailing bytes
    * (padding / 0x1A EOF) are ignored like the array path. */
  def recordsPrunedStream(h: Header, body: java.io.InputStream,
                          fieldIdx: Array[Int]): Iterator[Array[String]] = {
    val widths = h.fields.map(_.length).toArray
    val offsets = new Array[Int](widths.length)
    var acc = 1 // skip deletion flag
    var fi = 0
    while (fi < widths.length) { offsets(fi) = acc; acc += widths(fi); fi += 1 }
    val frame = new Array[Byte](h.recordSize)
    new Iterator[Array[String]] {
      private var emitted = 0
      private var nextRow: Array[String] = null

      private def readFrame(): Boolean = {
        var got = 0
        while (got < frame.length) {
          val n = body.read(frame, got, frame.length - got)
          if (n < 0) return false // trailing padding / EOF marker
          got += n
        }
        true
      }

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && emitted < h.nRecords && readFrame()) {
          val deleted = (frame(0) & 0xFF) == 0x2A
          if (!deleted) {
            val row = new Array[String](fieldIdx.length)
            var i = 0
            while (i < fieldIdx.length) {
              val f = fieldIdx(i)
              row(i) = fieldString(frame, offsets(f), widths(f))
              i += 1
            }
            nextRow = row
          }
          emitted += 1
        }
      }

      advance()
      def hasNext: Boolean = nextRow != null
      def next(): Array[String] = { val r = nextRow; advance(); r }
    }
  }

  /** Write rows as a minimal dBASE III file (type C fields, latin1).
    * Test/fixture support — the engine's sink side is parquet/JDBC. */
  def write(fieldNames: Seq[String], rows: Seq[Seq[String]]): Array[Byte] = {
    val widths = fieldNames.zipWithIndex.map { case (_, i) =>
      math.max(1, rows.iterator.map(r => Option(r(i)).fold(0)(_.getBytes(ISO_8859_1).length)).maxOption.getOrElse(1))
    }
    require(widths.forall(_ <= 254), "dbf: field too wide")
    val headerSize = 32 + 32 * fieldNames.length + 1
    val recordSize = 1 + widths.sum
    val out = new ByteArrayOutputStream()
    val head = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    head.put(0, 0x03.toByte) // dBASE III, no memo
    head.put(1, 24.toByte); head.put(2, 1.toByte); head.put(3, 1.toByte) // YMD
    head.putInt(4, rows.length)
    head.putShort(8, headerSize.toShort)
    head.putShort(10, recordSize.toShort)
    out.write(head.array())
    fieldNames.zip(widths).foreach { case (name, w) =>
      val fd = new Array[Byte](32)
      val nb = name.getBytes(ISO_8859_1)
      require(nb.length <= 10, s"dbf: field name too long: $name")
      System.arraycopy(nb, 0, fd, 0, nb.length)
      fd(11) = 'C'.toByte
      fd(16) = w.toByte
      out.write(fd)
    }
    out.write(0x0D)
    rows.foreach { r =>
      out.write(0x20)
      r.zip(widths).foreach { case (v, w) =>
        val b = Option(v).getOrElse("").getBytes(ISO_8859_1)
        out.write(b, 0, math.min(b.length, w))
        var pad = w - math.min(b.length, w)
        while (pad > 0) { out.write(0x20); pad -= 1 }
      }
    }
    out.write(0x1A) // EOF
    out.toByteArray
  }
}

/** DATASUS .dbc = uncompressed DBF header + 4 unused bytes (CRC) + PKWare
  * DCL-imploded DBF body (schema per the public dbc2dbf tools the reference
  * converter wraps, /root/reference/FLUXO_DBC.md:93-95). */
object Dbc {

  /** Decode a .dbc byte array into the equivalent .dbf byte array. */
  def toDbf(dbc: Array[Byte]): Array[Byte] = {
    require(dbc.length >= 12, "dbc: truncated")
    val headerSize = ((dbc(8) & 0xFF) | ((dbc(9) & 0xFF) << 8))
    require(headerSize > 0 && headerSize + 4 <= dbc.length, s"dbc: bad header size $headerSize")
    val body = Blast.explode(dbc, headerSize + 4)
    val out = new Array[Byte](headerSize + body.length)
    System.arraycopy(dbc, 0, out, 0, headerSize)
    System.arraycopy(body, 0, out, headerSize, body.length)
    out
  }

  /** Streaming read path: the .dbc prefix IS the uncompressed DBF header
    * (field descriptors at identical offsets), so the header parses from
    * the raw .dbc bytes and only the body streams through the bounded
    * Blast window — O(window + record) memory for any output size. */
  def stream(dbc: Array[Byte]): (Dbf.Header, java.io.InputStream) = {
    require(dbc.length >= 12, "dbc: truncated")
    val headerSize = ((dbc(8) & 0xFF) | ((dbc(9) & 0xFF) << 8))
    require(headerSize > 0 && headerSize + 4 <= dbc.length, s"dbc: bad header size $headerSize")
    (Dbf.parseHeader(dbc), new Blast.ExplodeInputStream(dbc, headerSize + 4))
  }

  /** Encode a .dbf byte array as .dbc (test/fixture support). Default =
    * match-emitting + Huffman-coded literals, the mode real PKWare/DATASUS
    * streams use — so the oracle-gated fixtures drive the decoder's
    * production branch (copy machinery AND coded-literal decode);
    * `coded = false` keeps the raw-literal variant for branch coverage. */
  def fromDbf(dbf: Array[Byte], coded: Boolean = true): Array[Byte] = {
    val h = Dbf.parseHeader(dbf)
    require(h.headerSize <= dbf.length,
      s"dbf: headerSize ${h.headerSize} beyond file (${dbf.length})")
    val body = new Array[Byte](dbf.length - h.headerSize)
    System.arraycopy(dbf, h.headerSize, body, 0, body.length)
    val imploded = Blast.implode(body, codedLiterals = coded)
    val out = new ByteArrayOutputStream()
    out.write(dbf, 0, h.headerSize)
    out.write(Array[Byte](0, 0, 0, 0)) // CRC slot (unchecked, like the tools)
    out.write(imploded)
    out.toByteArray
  }
}
