package graft.functions

/** Baseline-DCT JPEG codec — the third real pixel codec in the media
  * decode seam (PPM: [[MediaFunctions.decodePpm]], PNG:
  * [[MediaFunctions.decodePng]]), round-10 VERDICT item 4 resolved as
  * BUILD. Zero dependencies; everything here is implemented from the
  * public ITU-T T.81 / ISO 10918-1 specification:
  *
  *  - marker walk (SOI, APPn/COM skip, DQT, DHT, SOF0/1, DRI, SOS, EOI)
  *    with checked failures for truncation and the unsupported frame
  *    types (progressive SOF2, arithmetic coding, 12-bit precision) —
  *    same fail-closed discipline as the PNG path: a decoder that
  *    returns garbage corrupts every feature downstream;
  *  - canonical Huffman table construction and entropy decode
  *    (T.81 F.2.2.3: mincode/maxcode/valptr per code length), byte
  *    unstuffing (0xFF00), restart-marker intervals (DRI/RSTn) with DC
  *    predictor reset;
  *  - per-block dequantization in zigzag order, separable double-
  *    precision IDCT (T.81 A.3.3), level shift + clamp;
  *  - single-scan interleaved MCU layout for 1- and 3-component frames
  *    with sampling factors 1–2 (4:4:4, 4:2:2, 4:2:0), centered
  *    bilinear (triangle-filter) chroma upsampling, and the JFIF
  *    YCbCr→RGB conversion.
  *
  * The gate query (q_mm_jpeg) rides the EXACT-DECODE subset: an image of
  * constant 8×8 tiles encodes to DC-only blocks under an all-ones
  * quantization table, and every conformant decoder recovers the tile
  * values bit-exactly (DC = 8·(v−128) survives quantize→dequantize→IDCT
  * with < 1e−13 float error, far inside the rounding step) — so the
  * DuckDB oracle can predict decoded pixels arithmetically without ever
  * seeing JPEG bytes. The general path (nonzero AC, chroma subsampling,
  * restart markers, standard Annex-K tables) is cross-validated against
  * the JDK's independent decoder/encoder (javax.imageio) in JpegSpec,
  * the same two-sided independent-oracle pattern the PNG codec carries.
  */
object Jpeg {

  /** A decoded JPEG: header-parsed dimensions + interleaved raster
    * (1 byte/px gray or 3 bytes/px RGB, row-major) — the same shape and
    * luma convention as [[MediaFunctions.PngImage]]. */
  final case class JpegImage(width: Int, height: Int, nComp: Int,
                             pixels: Array[Byte]) {
    def luma(i: Int): Int =
      if (nComp == 1) pixels(i) & 0xFF
      else ((pixels(3 * i) & 0xFF) + (pixels(3 * i + 1) & 0xFF) +
            (pixels(3 * i + 2) & 0xFF)) / 3
  }

  /** Zigzag index -> natural (row-major) index, T.81 Figure A.6. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** 0.5·c(u)·cos((2x+1)uπ/16) — the separable 1-D IDCT basis
    * (T.81 A.3.3); two passes of this over a block give the 2-D IDCT. */
  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman table (T.81 C.2): `bits(l-1)` = number of codes
    * of length l, `vals` = symbols in code order. Builds both the
    * decoder's mincode/maxcode/valptr arrays (F.2.2.3) and, lazily, the
    * encoder's symbol→(code,length) map. */
  private[functions] final class HuffTable(val bits: Array[Int], val vals: Array[Int]) {
    require(bits.length == 16, "DHT: need 16 code-length counts")
    require(bits.sum == vals.length && vals.nonEmpty && vals.length <= 256,
      s"DHT: ${bits.sum} codes vs ${vals.length} values")
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      require(code <= (1 << 17), "DHT: over-subscribed code space")
    }
    def valueAt(l: Int, code: Int): Int = vals(valptr(l) + code - mincode(l))
    lazy val encode: Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) { m += (vals(k) -> (code, l)); code += 1; k += 1; i += 1 }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with T.81
    * byte unstuffing: 0xFF00 is a literal 0xFF; any other marker inside
    * a block is malformed (restart markers are consumed BETWEEN MCUs by
    * [[decodeJpeg]], never here). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def readBit(): Int = {
      if (cnt == 0) {
        require(pos < data.length, "truncated entropy stream")
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < data.length, "truncated entropy stream after 0xFF")
          val m = data(pos) & 0xFF
          pos += 1
          require(m == 0x00,
            f"marker 0xFF$m%02X inside an entropy-coded block")
          b = 0xFF
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def align(): Unit = cnt = 0
  }

  /** Huffman decode one symbol (T.81 F.18). */
  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.readBit()
    var l = 1
    while (code > t.maxcode(l)) {
      require(l < 16, "invalid Huffman code (ran past 16 bits)")
      code = (code << 1) | br.readBit()
      l += 1
    }
    t.valueAt(l, code)
  }

  /** RECEIVE + EXTEND (T.81 F.12): an s-bit magnitude to a signed
    * coefficient value. */
  private def receiveExtend(br: BitReader, s: Int): Int = {
    if (s == 0) 0
    else {
      val v = br.readBits(s)
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  /** Full baseline decode with the codec seam's checked-failure
    * discipline: malformed or unsupported streams throw
    * IllegalArgumentException, never return garbage pixels. Truncations
    * that land inside a segment's fixed-layout header surface as array
    * bounds — normalized here so every malformed input takes the same
    * checked path. */
  def decodeJpeg(blob: Array[Byte]): JpegImage =
    try decode0(blob)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated or malformed JPEG stream", e)
    }

  private def decode0(blob: Array[Byte]): JpegImage = {
    require(blob.length >= 4 &&
      (blob(0) & 0xFF) == 0xFF && (blob(1) & 0xFF) == 0xD8,
      "not a JPEG: missing SOI")
    def u16(o: Int): Int = {
      require(o + 1 < blob.length, "truncated JPEG segment")
      ((blob(o) & 0xFF) << 8) | (blob(o + 1) & 0xFF)
    }
    var pos = 2
    val qtab = new Array[Array[Int]](4) // natural-order dequant tables
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0
    var height = 0
    var comps: Array[Component] = null

    var image: JpegImage = null
    while (image == null) {
      require(pos + 1 < blob.length, "truncated before marker")
      require((blob(pos) & 0xFF) == 0xFF,
        f"expected a marker, found 0x${blob(pos) & 0xFF}%02X")
      pos += 1
      var m = blob(pos) & 0xFF
      pos += 1
      while (m == 0xFF) { // fill bytes before a marker are legal
        require(pos < blob.length, "truncated in marker fill")
        m = blob(pos) & 0xFF
        pos += 1
      }
      m match {
        case 0xD8 => // repeated SOI: ignore
        case 0x01 => // TEM: standalone, no payload
        case 0xD9 =>
          require(false, "EOI before any scan — no image data")
        case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential (8-bit)
          val len = u16(pos)
          require(len >= 8, "SOF: short segment")
          val precision = blob(pos + 2) & 0xFF
          require(precision == 8, s"sample precision $precision unsupported (8-bit only)")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          val nf = blob(pos + 7) & 0xFF
          require(nf == 1 || nf == 3,
            s"$nf components unsupported (grayscale or YCbCr only)")
          require(len == 8 + 3 * nf, "SOF: length mismatch")
          comps = Array.tabulate(nf) { i =>
            val o = pos + 8 + 3 * i
            val hv = blob(o + 1) & 0xFF
            val c = Component(blob(o) & 0xFF, hv >> 4, hv & 0x0F, blob(o + 2) & 0x0F)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling factor ${c.h}x${c.v} unsupported (1-2 only)")
            c
          }
          // Long-arithmetic size guard, same rationale as decodePng:
          // header dims are attacker-controlled
          require(width.toLong * height * math.max(comps.length, 3) <= Int.MaxValue,
            s"raster too large: ${width}x$height")
          // allocation-proportionality guard: every coded block costs at
          // least 2 bits (a 1-bit-minimum DC code + a 1-bit-minimum EOB),
          // so a tiny file whose header claims a near-gigabyte raster is
          // rejected BEFORE the plane allocations it would have caused
          val blocksMin = ((width + 7L) / 8) * ((height + 7L) / 8)
          require(blob.length.toLong * 8 >= blocksMin * 2,
            s"entropy stream too short for a ${width}x$height frame")
          pos += len
        case 0xC2 =>
          require(false, "progressive JPEG (SOF2) unsupported — baseline only")
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          require(false, f"frame type 0xFF$m%02X unsupported (baseline Huffman only)")
        case 0xC4 => // DHT, possibly several tables in one segment
          val len = u16(pos)
          val end = pos + len
          require(end <= blob.length, "DHT: truncated")
          var o = pos + 2
          while (o < end) {
            val tcth = blob(o) & 0xFF
            val tc = tcth >> 4
            val th = tcth & 0x0F
            require(tc <= 1 && th <= 3, s"DHT: bad table class/id $tcth")
            require(o + 17 <= end, "DHT: truncated counts")
            val bits = Array.tabulate(16)(i => blob(o + 1 + i) & 0xFF)
            val n = bits.sum
            require(o + 17 + n <= end, "DHT: truncated values")
            val vals = Array.tabulate(n)(i => blob(o + 17 + i) & 0xFF)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            o += 17 + n
          }
          pos = end
        case 0xDB => // DQT, possibly several tables
          val len = u16(pos)
          val end = pos + len
          require(end <= blob.length, "DQT: truncated")
          var o = pos + 2
          while (o < end) {
            val pqtq = blob(o) & 0xFF
            val pq = pqtq >> 4
            val tq = pqtq & 0x0F
            require(pq == 0, "16-bit quantization tables unsupported (baseline is 8-bit)")
            require(tq <= 3, s"DQT: bad table id $tq")
            require(o + 65 <= end, "DQT: truncated table")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(ZigZag(i)) = blob(o + 1 + i) & 0xFF; i += 1 }
            qtab(tq) = t
            o += 65
          }
          pos = end
        case 0xDD =>
          require(u16(pos) == 4, "DRI: bad length")
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xDA =>
          require(comps != null, "SOS before SOF")
          val len = u16(pos)
          val ns = blob(pos + 2) & 0xFF
          require(ns == comps.length,
            s"$ns-component scan over ${comps.length}-component frame " +
              "unsupported (single interleaved scan only)")
          require(len == 6 + 2 * ns, "SOS: length mismatch")
          val scanTabs = Array.tabulate(ns) { i =>
            val o = pos + 3 + 2 * i
            val cs = blob(o) & 0xFF
            val ci = comps.indexWhere(_.id == cs)
            require(ci >= 0, s"SOS: unknown component id $cs")
            val tdta = blob(o + 1) & 0xFF
            (ci, tdta >> 4, tdta & 0x0F)
          }
          val ss = blob(pos + 3 + 2 * ns) & 0xFF
          val se = blob(pos + 4 + 2 * ns) & 0xFF
          val ahal = blob(pos + 5 + 2 * ns) & 0xFF
          require(ss == 0 && se == 63 && ahal == 0,
            "spectral selection / successive approximation unsupported (baseline)")
          pos += len
          image = decodeScan(blob, pos, width, height, comps, scanTabs,
            qtab, dcTabs, acTabs, restartInterval)
        case _ => // APPn, COM, DNL, anything else with a length: skip
          val len = u16(pos)
          require(len >= 2 && pos + len <= blob.length, f"truncated 0xFF$m%02X segment")
          pos += len
      }
    }
    image
  }

  private def decodeScan(blob: Array[Byte], scanStart: Int,
      width: Int, height: Int, comps: Array[Component],
      scanTabs: Array[(Int, Int, Int)], qtab: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int): JpegImage = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per component: block-padded sample plane covering the MCU grid
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    comps.indices.foreach { i =>
      val (_, td, ta) = scanTabs(i)
      require(dcTabs(td) != null, s"SOS references missing DC table $td")
      require(acTabs(ta) != null, s"SOS references missing AC table $ta")
      require(qtab(comps(i).tq) != null,
        s"SOF references missing quantization table ${comps(i).tq}")
    }

    val br = new BitReader(blob, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var expectedRst = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.align()
        require(br.pos + 1 < blob.length, "truncated at restart boundary")
        require((blob(br.pos) & 0xFF) == 0xFF &&
          (blob(br.pos + 1) & 0xFF) == 0xD0 + expectedRst,
          f"expected RST$expectedRst at MCU $mcu, found " +
            f"0x${blob(br.pos) & 0xFF}%02X${blob(br.pos + 1) & 0xFF}%02X")
        br.pos += 2
        expectedRst = (expectedRst + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val (_, td, ta) = scanTabs(ci)
        val dq = qtab(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // --- entropy-decode one block (T.81 F.2.2) ---
            java.util.Arrays.fill(coef, 0.0)
            val s0 = decodeHuff(br, dcTabs(td))
            require(s0 <= 11, s"DC category $s0 out of range")
            pred(ci) += receiveExtend(br, s0)
            coef(0) = pred(ci).toDouble * dq(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = decodeHuff(br, acTabs(ta))
              val r = rs >> 4
              val s = rs & 0x0F
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else open = false // EOB
              } else {
                k += r
                require(k < 64, "AC run past end of block")
                coef(ZigZag(k)) = receiveExtend(br, s).toDouble * dq(ZigZag(k))
                k += 1
              }
            }
            // --- separable IDCT: columns of CosT over rows then cols ---
            var v = 0
            while (v < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += CosT(u * 8 + x) * coef(v * 8 + u); u += 1 }
                tmp(v * 8 + x) = acc
                x += 1
              }
              v += 1
            }
            val plane = planes(ci)
            val pw = planeW(ci)
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += CosT(u * 8 + y) * tmp(u * 8 + x); u += 1 }
                val s = math.round(acc).toInt + 128
                plane((py0 + y) * pw + px0 + x) =
                  (if (s < 0) 0 else if (s > 255) 255 else s).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // --- assemble output raster ---
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
      JpegImage(width, height, 1, out)
    } else {
      // centered BILINEAR chroma upsampling (the triangle filter —
      // JPEG samples are cosited at (i+0.5)/factor centers, so nearest
      // replication shifts chroma half a sample; bilinear matches the
      // common fancy-upsampling decoders within rounding) + JFIF
      // YCbCr -> RGB
      val compW = comps.map(c => (width * c.h + hmax - 1) / hmax)
      val compH = comps.map(c => (height * c.v + vmax - 1) / vmax)
      def sampleAt(ci: Int, x: Int, y: Int): Double = {
        val c = comps(ci)
        if (c.h == hmax && c.v == vmax)
          (planes(ci)(y * planeW(ci) + x) & 0xFF).toDouble
        else {
          val fx = (x + 0.5) * c.h / hmax.toDouble - 0.5
          val fy = (y + 0.5) * c.v / vmax.toDouble - 0.5
          val x0 = math.floor(fx).toInt
          val y0 = math.floor(fy).toInt
          val dx = fx - x0
          val dy = fy - y0
          def s(xx: Int, yy: Int): Int = {
            val cx = if (xx < 0) 0 else if (xx >= compW(ci)) compW(ci) - 1 else xx
            val cy = if (yy < 0) 0 else if (yy >= compH(ci)) compH(ci) - 1 else yy
            planes(ci)(cy * planeW(ci) + cx) & 0xFF
          }
          (1 - dx) * (1 - dy) * s(x0, y0) + dx * (1 - dy) * s(x0 + 1, y0) +
            (1 - dx) * dy * s(x0, y0 + 1) + dx * dy * s(x0 + 1, y0 + 1)
        }
      }
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = sampleAt(0, x, y)
          val cb = sampleAt(1, x, y) - 128.0
          val cr = sampleAt(2, x, y) - 128.0
          def clamp(d: Double): Byte = {
            val r = math.round(d).toInt
            (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, 3, out)
    }
  }

  // ---- Minimal encoder for the exact-decode gate subset ----

  /** Annex K.3.3.1 luminance DC table: 12 categories, the one table
    * every JPEG encoder ships. */
  private val StdDcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** MSB-first bit writer with T.81 byte stuffing (0xFF -> 0xFF00). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(bitsValue: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((bitsValue >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00)
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) { write((1 << (8 - cnt)) - 1, 8 - cnt) }
  }

  /** Encode a grayscale baseline JPEG of `bw`x`bh` CONSTANT 8x8 tiles
    * (tile (r,c) filled with `tiles(r*bw+c)`), quantization all-ones —
    * the exact-decode subset: constant tiles produce DC-only blocks, and
    * DC = 8·(v−128) survives the whole pipeline bit-exactly in ANY
    * conformant decoder (the IDCT of a DC-only block is a constant
    * within 1e−13 of the original value). The entropy stream is real:
    * Annex-K DC Huffman codes, category+magnitude coding with DC
    * prediction across blocks, EOB per block from a minimal 1-code AC
    * table, byte stuffing, and (with `restartInterval` > 0) DRI/RSTn
    * restart intervals with predictor reset and byte alignment — so the
    * decoder's restart path sits on a testable stream too. Verified
    * against ImageIO's decoder in JpegSpec. */
  def encodeJpegGrayTiled(bw: Int, bh: Int, tiles: Array[Byte],
                          restartInterval: Int = 0): Array[Byte] = {
    require(bw > 0 && bh > 0 && bw * 8 <= 65535 && bh * 8 <= 65535,
      s"bad tile grid ${bw}x$bh")
    require(tiles.length == bw * bh, s"${tiles.length} tiles != $bw x $bh")
    val width = bw * 8
    val height = bh * 8
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64); out.write(0x00) // DQT id 0, 8-bit
    (0 until 64).foreach(_ => out.write(1)) // all-ones: dequant is identity
    marker(0xC0); u16(8 + 3) // SOF0, 1 component
    out.write(8); u16(height); u16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1 sampling, qtab 0
    marker(0xC4); u16(2 + 1 + 16 + StdDcVals.length); out.write(0x00) // DC table 0
    StdDcBits.foreach(out.write); StdDcVals.foreach(out.write)
    marker(0xC4); u16(2 + 1 + 16 + 1); out.write(0x10) // AC table 0: only EOB
    out.write(1); (2 to 16).foreach(_ => out.write(0)); out.write(0x00)
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA); u16(6 + 2) // SOS
    out.write(1); out.write(1); out.write(0x00) // comp 1, DC 0 / AC 0
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val dcCodes = new HuffTable(StdDcBits, StdDcVals).encode
    var bwr = new BitWriter(out)
    var predDc = 0
    var rst = 0
    tiles.zipWithIndex.foreach { case (t, i) =>
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bwr.flush() // byte-align, then the restart marker resets prediction
        marker(0xD0 + rst)
        rst = (rst + 1) % 8
        predDc = 0
        bwr = new BitWriter(out)
      }
      val dc = 8 * ((t & 0xFF) - 128)
      val diff = dc - predDc
      predDc = dc
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(s)
      bwr.write(code, len)
      if (s > 0) bwr.write(if (diff > 0) diff else diff + (1 << s) - 1, s)
      bwr.write(0, 1) // EOB: the minimal AC table's single 1-bit code
    }
    bwr.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }
}
