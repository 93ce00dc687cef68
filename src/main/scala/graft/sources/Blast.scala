package graft.sources

import java.io.ByteArrayOutputStream

/** PKWare DCL "implode" stream decompressor (the compression used by
  * DATASUS `.dbc` bodies — reference behavior:
  * /root/reference/OTIMIZACAO_API_PYTHON.md:196-204 ships files to a
  * Python `dbc2dbf`; we decode in-engine instead).
  *
  * Scala implementation of the public-domain PKWare DCL format as
  * documented by Mark Adler's blast (zlib contrib, public domain): fixed
  * canonical Huffman tables, LSB-first bit stream with inverted code bits,
  * literal/length-distance items, end-of-stream at length symbol 519.
  *
  * Stream layout:
  *  - byte 0: literal mode (0 = raw 8-bit literals, 1 = Huffman-coded)
  *  - byte 1: log2(dictionary size) - 6, valid 4..6 (1K/2K/4K window)
  *  - then items, LSB-first bits:
  *      0 bit  -> literal (raw or coded per mode)
  *      1 bit  -> length/distance: coded length symbol (base+extra bits);
  *                length 519 terminates; distance = coded high bits ++
  *                raw low bits (2 low bits when length == 2, else dict log2),
  *                copy `length` bytes from `distance+1` back.
  */
object Blast {

  /** Huffman table in canonical compact form: each byte holds
    * (repeat-1) << 4 | code-length; symbols are assigned in order. */
  final class Huffman(rep: Array[Int], nsym: Int) {
    val count = new Array[Int](16) // number of codes of each length
    val symbol = new Array[Int](nsym) // canonically ordered symbols

    {
      val lengths = new Array[Int](nsym)
      var sym = 0
      rep.foreach { r =>
        val len = r & 15
        var n = (r >> 4) + 1
        while (n > 0) { lengths(sym) = len; sym += 1; n -= 1 }
      }
      require(sym == nsym, s"table covers $sym of $nsym symbols")
      lengths.foreach(l => count(l) += 1)
      // offsets into symbol table per length, then place symbols
      val offs = new Array[Int](16)
      var l = 1
      while (l < 15) { offs(l + 1) = offs(l) + count(l); l += 1 }
      var s = 0
      while (s < nsym) {
        if (lengths(s) != 0) { symbol(offs(lengths(s))) = s; offs(lengths(s)) += 1 }
        s += 1
      }
    }
  }

  // Canonical PKWare DCL tables (compact form per public blast spec).
  private val litcode = new Huffman(Array(
    11, 124, 8, 7, 28, 7, 188, 13, 76, 4, 10, 8, 12, 10, 12, 10, 8, 23, 8,
    9, 7, 6, 7, 8, 7, 6, 55, 8, 23, 24, 12, 11, 7, 9, 11, 12, 6, 7, 22, 5,
    7, 24, 6, 11, 9, 6, 7, 22, 7, 11, 38, 7, 9, 8, 25, 11, 8, 11, 9, 12,
    8, 12, 5, 38, 5, 38, 5, 11, 7, 5, 6, 21, 6, 10, 53, 8, 7, 24, 10, 27,
    44, 253, 253, 253, 252, 252, 252, 13, 12, 45, 12, 45, 12, 61, 12, 45,
    44, 173), 256)
  private val lencode = new Huffman(Array(2, 35, 36, 53, 38, 23), 16)
  private val distcode = new Huffman(Array(2, 20, 53, 230, 247, 151, 248), 64)

  private val lenBase = Array(3, 2, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24, 40, 72, 136, 264)
  private val lenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)

  /** Table-driven decoder for one Huffman table: index the next `maxLen`
    * raw stream bits (LSB-first, as read) into (symbol, codeLen) arrays —
    * one lookup per symbol instead of a bit-at-a-time canonical walk.
    * litcode maxLen = 13 → 8K entries, built once. */
  private final class DecodeTable(val h: Huffman, nsym: Int) {
    val maxLen: Int = (15 to 1 by -1).find(l => h.count(l) > 0).get
    private val size = 1 << maxLen
    val sym = new Array[Short](size)
    val bitsOf = new Array[Byte](size)

    {
      var code = 0
      var index = 0
      var len = 1
      while (len <= 15) {
        var i = 0
        while (i < h.count(len)) {
          val s = h.symbol(index + i)
          val c = code + i
          // raw (inverted-canonical) bits as the reader sees them, LSB-first
          var base = 0
          var j = 0
          while (j < len) { base |= (((c >> (len - 1 - j)) & 1) ^ 1) << j; j += 1 }
          var f = 0
          val fills = 1 << (maxLen - len)
          while (f < fills) {
            val idx = base | (f << len)
            sym(idx) = s.toShort
            bitsOf(idx) = len.toByte
            f += 1
          }
          i += 1
        }
        index += h.count(len)
        code = (code + h.count(len)) << 1
        len += 1
      }
    }
  }

  private lazy val litTable = new DecodeTable(litcode, 256)
  private lazy val lenTable = new DecodeTable(lencode, 16)
  private lazy val distTable = new DecodeTable(distcode, 64)

  private final class BitReader(in: Array[Byte], var pos: Int) {
    private var bitbuf = 0
    private var bitcnt = 0

    def bits(need: Int): Int = {
      var v = bitbuf
      while (bitcnt < need) {
        if (pos >= in.length) throw new IllegalArgumentException("blast: input exhausted")
        v |= (in(pos) & 0xFF) << bitcnt
        pos += 1
        bitcnt += 8
      }
      bitbuf = v >> need
      bitcnt -= need
      v & ((1 << need) - 1)
    }

    /** Next `n` bits without consuming; zero-padded past end of input. */
    private def peek(n: Int): Int = {
      while (bitcnt < n && pos < in.length) {
        bitbuf |= (in(pos) & 0xFF) << bitcnt
        pos += 1
        bitcnt += 8
      }
      bitbuf & ((1 << n) - 1)
    }

    /** One-lookup Huffman decode; falls back to the canonical walk only
      * in the zero-padded tail where fewer real bits remain than the
      * table width. */
    def decodeFast(t: DecodeTable): Int = {
      val idx = peek(t.maxLen)
      val l = t.bitsOf(idx)
      if (l == 0 || l > bitcnt) return decode(t.h)
      bitbuf >>>= l
      bitcnt -= l
      t.sym(idx) & 0xFFFF
    }

    /** Canonical Huffman decode; PKWare stores code bits inverted. */
    def decode(h: Huffman): Int = {
      var code = 0; var first = 0; var index = 0
      var len = 1
      while (len <= 15) {
        code |= bits(1) ^ 1
        val cnt = h.count(len)
        if (code - cnt < first) return h.symbol(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException("blast: invalid code")
    }
  }

  /** Growable raw byte buffer: the decode output is the sliding window,
    * and a generic ArrayBuffer[Byte] would box every byte on the hottest
    * loop in the engine. */
  private final class ByteBuf(initial: Int) {
    private var arr = new Array[Byte](initial)
    var len = 0
    private def ensure(extra: Int): Unit =
      if (len + extra > arr.length) {
        val needed = len.toLong + extra
        require(needed <= (Int.MaxValue - 16).toLong, "blast: output too large")
        var n = arr.length.toLong << 1
        while (n < needed) n <<= 1 // Long arithmetic: cannot overflow-spin
        arr = java.util.Arrays.copyOf(arr, math.min(n, (Int.MaxValue - 16).toLong).toInt)
      }
    def add(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    /** Copy `count` bytes starting `dist` back; byte-at-a-time preserves
      * the overlapping-copy (run-extension) semantics of the format. */
    def copyBack(dist: Int, count: Int): Unit = {
      ensure(count)
      val from = len - dist
      var i = 0
      while (i < count) { arr(len) = arr(from + i); len += 1; i += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** Decompress a DCL-imploded stream; `maxOut` guards runaway streams. */
  def explode(in: Array[Byte], offset: Int = 0, maxOut: Int = 1 << 30): Array[Byte] = {
    require(in.length - offset >= 2, "blast: truncated header")
    val coded = in(offset) & 0xFF
    val dictLog = in(offset + 1) & 0xFF
    require(coded <= 1, s"blast: bad literal mode $coded")
    require(dictLog >= 4 && dictLog <= 6, s"blast: bad dict size $dictLog")

    val br = new BitReader(in, offset + 2)
    // matches copy from earlier output, so the whole output doubles as the
    // sliding window (dict is at most 4K back — always in range)
    val buf = new ByteBuf(64 * 1024)

    while (true) {
      if (br.bits(1) == 1) { // length/distance pair
        val sym = br.decodeFast(lenTable)
        val len = lenBase(sym) + br.bits(lenExtra(sym))
        if (len == 519) { // end marker
          return buf.toArray
        }
        val nlow = if (len == 2) 2 else dictLog
        val dist = (br.decodeFast(distTable) << nlow) + br.bits(nlow) + 1
        if (dist > buf.len)
          throw new IllegalArgumentException(s"blast: distance $dist beyond output ${buf.len}")
        buf.copyBack(dist, len)
      } else { // literal
        val lit = if (coded == 1) br.decodeFast(litTable) else br.bits(8)
        buf.add(lit.toByte)
      }
      if (buf.len > maxOut) throw new IllegalArgumentException("blast: output too large")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Pull-based streaming decode: an InputStream over the decompressed
    * bytes that holds only a bounded buffer (64 KB; the format's copy
    * window is at most 4 KB), instead of materializing the whole output.
    * This is the 100 TB-robust path: a .dbc body with an adversarial
    * compression ratio decodes in O(window + record) memory. The
    * compressed input stays as the caller's byte array (DATASUS files are
    * 30-150 MB; the decompressed side is what blows up). */
  final class ExplodeInputStream(in: Array[Byte], offset: Int) extends java.io.InputStream {
    require(in.length - offset >= 2, "blast: truncated header")
    private val coded = in(offset) & 0xFF
    private val dictLog = in(offset + 1) & 0xFF
    require(coded <= 1, s"blast: bad literal mode $coded")
    require(dictLog >= 4 && dictLog <= 6, s"blast: bad dict size $dictLog")

    private val br = new BitReader(in, offset + 2)
    private val W = 64 * 1024
    private val window = 1 << (dictLog + 6) // at most 4096
    private val arr = new Array[Byte](W)
    private var len = 0      // write position
    private var cpos = 0     // consume position (cpos <= len)
    private var base = 0L    // bytes discarded by compaction
    private var eos = false

    /** Keep the copy window (and any unconsumed bytes) while making room. */
    private def compact(): Unit = {
      val keepFrom = math.min(cpos, math.max(0, len - window))
      if (keepFrom > 0) {
        System.arraycopy(arr, keepFrom, arr, 0, len - keepFrom)
        len -= keepFrom
        cpos -= keepFrom
        base += keepFrom
      }
    }

    /** Decode one item (literal or match), appending at most 518 bytes. */
    private def decodeOne(): Unit = {
      if (len + 518 > W) compact()
      if (len + 518 > W)
        throw new IllegalStateException("blast stream: consumer stalled") // unconsumed backlog
      if (br.bits(1) == 1) {
        val sym = br.decodeFast(lenTable)
        val l = lenBase(sym) + br.bits(lenExtra(sym))
        if (l == 519) { eos = true; return }
        val nlow = if (l == 2) 2 else dictLog
        val dist = (br.decodeFast(distTable) << nlow) + br.bits(nlow) + 1
        if (dist > base + len)
          throw new IllegalArgumentException(s"blast: distance $dist beyond output ${base + len}")
        val from = len - dist
        var i = 0
        while (i < l) { arr(len) = arr(from + i); len += 1; i += 1 }
      } else {
        val lit = if (coded == 1) br.decodeFast(litTable) else br.bits(8)
        arr(len) = lit.toByte
        len += 1
      }
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      if (read(one, 0, 1) < 0) -1 else one(0) & 0xFF
    }

    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0
      while (cpos == len && !eos) decodeOne()
      if (cpos == len && eos) return -1
      val m = math.min(n, len - cpos)
      System.arraycopy(arr, cpos, b, off, m)
      cpos += m
      m
    }
  }

  // --- minimal imploder (test support) -------------------------------------

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var bitbuf = 0
    private var bitcnt = 0
    def put(v: Int, n: Int): Unit = {
      bitbuf |= (v & ((1 << n) - 1)) << bitcnt
      bitcnt += n
      while (bitcnt >= 8) { out.write(bitbuf & 0xFF); bitbuf >>>= 8; bitcnt -= 8 }
    }
    def bytes(): Array[Byte] = {
      if (bitcnt > 0) { out.write(bitbuf & 0xFF); bitbuf = 0; bitcnt = 0 }
      out.toByteArray
    }
  }

  /** Huffman encoder side of a compact table: symbol -> (codeBits, len),
    * emitting inverted bits LSB-first like the format requires. */
  private def encoderFor(h: Huffman, nsym: Int): Array[(Int, Int)] = {
    val enc = new Array[(Int, Int)](nsym)
    var code = 0
    var index = 0
    var len = 1
    while (len <= 15) {
      var i = 0
      while (i < h.count(len)) {
        enc(h.symbol(index + i)) = (code + i, len)
        i += 1
      }
      index += h.count(len)
      code = (code + h.count(len)) << 1
      len += 1
    }
    enc
  }

  private lazy val lenEnc = encoderFor(lencode, 16)

  private def putCode(bw: BitWriter, codeLen: (Int, Int)): Unit = {
    val (code, len) = codeLen
    // emit MSB-first, inverted — mirrors the decoder's bit-at-a-time walk
    var i = len - 1
    while (i >= 0) { bw.put(((code >> i) & 1) ^ 1, 1); i -= 1 }
  }

  /** Minimal valid imploder: raw-literal mode, no matches — every byte a
    * literal, terminated by length symbol 15 + extra 255 (= 519). Used by
    * tests and the synthetic .dbc fixture writer; real compression ratio
    * is 9/8 (it exists to exercise the decode path, not to compress). */
  def implodeStored(data: Array[Byte], dictLog: Int = 4): Array[Byte] = {
    val bw = new BitWriter()
    data.foreach { b =>
      bw.put(0, 1) // literal flag
      bw.put(b & 0xFF, 8)
    }
    endAndWrap(bw, dictLog)
  }

  private def endAndWrap(bw: BitWriter, dictLog: Int, codedLiterals: Boolean = false): Array[Byte] = {
    bw.put(1, 1) // length/distance flag
    putCode(bw, lenEnc(15)) // symbol 15: base 264
    bw.put(255, 8) // extra 8 bits: 264 + 255 = 519 = end
    val body = bw.bytes()
    val out = new Array[Byte](2 + body.length)
    out(0) = if (codedLiterals) 1 else 0
    out(1) = dictLog.toByte
    System.arraycopy(body, 0, out, 2, body.length)
    out
  }

  private lazy val distEnc = encoderFor(distcode, 64)
  private lazy val litEnc = encoderFor(litcode, 256)

  /** Coded-literal-mode imploder: every byte as a Huffman-coded literal
    * (the decoder's `coded == 1` branch — the mode real PKWare streams
    * commonly use). Compresses English-ish text via the static literal
    * table; exists to round-trip-test the coded decode path. */
  def implodeCodedLiterals(data: Array[Byte], dictLog: Int = 4): Array[Byte] = {
    val bw = new BitWriter()
    data.foreach { b =>
      bw.put(0, 1)
      putCode(bw, litEnc(b & 0xFF))
    }
    bw.put(1, 1)
    putCode(bw, lenEnc(15))
    bw.put(255, 8)
    val body = bw.bytes()
    val out = new Array[Byte](2 + body.length)
    out(0) = 1 // coded literals
    out(1) = dictLog.toByte
    System.arraycopy(body, 0, out, 2, body.length)
    out
  }

  /** Greedy match-emitting imploder: hash-chained search over the sliding
    * dictionary, emitting length/distance pairs for matches of 3+ bytes
    * (2-byte matches only within the 256-byte near-window, per the
    * format's special 2-length coding). `codedLiterals = true` emits
    * literals through the static Huffman table — matches + coded
    * literals is the mode real PKWare/DATASUS streams use, so fixtures
    * built this way drive the decoder's production branch. Compresses
    * for real AND exercises the decoder's copy machinery on arbitrary
    * data — the property tests round-trip repetitive corpora through the
    * same code paths real DATASUS bodies use. */
  def implode(data: Array[Byte], dictLog: Int = 6,
              codedLiterals: Boolean = false): Array[Byte] = {
    val dictSize = 1 << (dictLog + 6)
    val bw = new BitWriter()
    val head = new java.util.HashMap[Int, java.util.ArrayDeque[Int]]()

    def key(i: Int): Int =
      ((data(i) & 0xFF) << 16) | ((data(i + 1) & 0xFF) << 8) | (data(i + 2) & 0xFF)

    def emitMatch(len: Int, dist: Int): Unit = {
      bw.put(1, 1)
      // length symbol: the unique sym with base(sym) <= len <= base+2^extra-1
      val sym = lenBase.indices.find { s =>
        len >= lenBase(s) && len <= lenBase(s) + (1 << lenExtra(s)) - 1
      }.getOrElse(throw new IllegalArgumentException(s"no length code for $len"))
      putCode(bw, lenEnc(sym))
      if (lenExtra(sym) > 0) bw.put(len - lenBase(sym), lenExtra(sym))
      val nlow = if (len == 2) 2 else dictLog
      val low = (dist - 1) & ((1 << nlow) - 1)
      val high = (dist - 1) >> nlow
      putCode(bw, distEnc(high))
      bw.put(low, nlow)
    }

    var i = 0
    while (i < data.length) {
      var bestLen = 0
      var bestDist = 0
      if (i + 2 < data.length) {
        val chain = head.get(key(i))
        if (chain != null) {
          val it = chain.iterator()
          var tried = 0
          while (it.hasNext && tried < 32) {
            val j = it.next()
            val dist = i - j
            if (dist <= dictSize) {
              var l = 0
              val maxL = math.min(data.length - i, 518)
              while (l < maxL && data(j + l) == data(i + l)) l += 1
              if (l > bestLen) { bestLen = l; bestDist = dist }
            }
            tried += 1
          }
        }
      }
      if (bestLen >= 3) {
        emitMatch(bestLen, bestDist)
        var k2 = i
        val end = math.min(i + bestLen, data.length - 2)
        while (k2 < end) {
          head.computeIfAbsent(key(k2), _ => new java.util.ArrayDeque[Int]()).addFirst(k2)
          k2 += 1
        }
        i += bestLen
      } else {
        bw.put(0, 1)
        if (codedLiterals) putCode(bw, litEnc(data(i) & 0xFF))
        else bw.put(data(i) & 0xFF, 8)
        if (i + 2 < data.length)
          head.computeIfAbsent(key(i), _ => new java.util.ArrayDeque[Int]()).addFirst(i)
        i += 1
      }
    }
    endAndWrap(bw, dictLog, codedLiterals)
  }
}
