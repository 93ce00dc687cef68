package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Jpeg

/** Baseline-JPEG codec: exact-decode tiled subset, independent-oracle
  * cross-validation against the JDK's decoder/encoder (javax.imageio —
  * a separately-authored implementation, the same two-sided pattern the
  * PNG codec carries), restart-marker handling, and checked-failure
  * discipline for malformed/unsupported streams. */
class JpegSpec extends AnyFunSuite {

  private def tiles(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  test("tiled gray encode/decode round-trip is bit-exact (DC-only blocks, all-ones quant)") {
    val t = tiles(8 * 8, 11)
    val img = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayTiled(8, 8, t))
    assert(img.width == 64 && img.height == 64 && img.nComp == 1)
    // every pixel of tile (r,c) equals tiles(r*8+c) exactly — the
    // constant-block DC path is exact in any conformant decoder
    for (r <- 0 until 8; c <- 0 until 8; y <- 0 until 8; x <- 0 until 8) {
      val px = img.pixels((r * 8 + y) * 64 + c * 8 + x) & 0xFF
      assert(px == (t(r * 8 + c) & 0xFF), s"tile ($r,$c) pixel ($x,$y)")
    }
    // non-square grids parse dims from SOF, not assumption
    val wide = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayTiled(5, 2, tiles(10, 7)))
    assert(wide.width == 40 && wide.height == 16)
  }

  test("restart markers: DRI/RSTn stream decodes identically, predictor reset included") {
    val t = tiles(6 * 4, 23)
    val plain = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayTiled(6, 4, t))
    for (interval <- Seq(1, 3, 7)) {
      val rst = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayTiled(6, 4, t, restartInterval = interval))
      assert(rst.pixels.sameElements(plain.pixels), s"interval $interval diverged")
    }
    // enough tiles to wrap the RST0..RST7 modulo sequence
    val many = tiles(10 * 10, 31)
    val wrapped = Jpeg.decodeJpeg(Jpeg.encodeJpegGrayTiled(10, 10, many, restartInterval = 1))
    assert(wrapped.pixels.sameElements(
      Jpeg.decodeJpeg(Jpeg.encodeJpegGrayTiled(10, 10, many)).pixels))
  }

  test("cross-validation: encodeJpegGrayTiled output decodes bit-exact through javax.imageio") {
    (1 to 10).foreach { i =>
      val bw = 1 + i % 5
      val bh = 1 + (i * 3) % 4
      val t = tiles(bw * bh, 100 + i)
      val bytes = Jpeg.encodeJpegGrayTiled(bw, bh, t,
        restartInterval = if (i % 3 == 0) 2 else 0)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"iter $i: ImageIO rejected the stream")
      assert(img.getWidth == bw * 8 && img.getHeight == bh * 8, s"iter $i dims")
      val r = img.getRaster
      for (by <- 0 until bh; bx <- 0 until bw; y <- 0 until 8; x <- 0 until 8) {
        assert(r.getSample(bx * 8 + x, by * 8 + y, 0) == (t(by * bw + bx) & 0xFF),
          s"iter $i tile ($bx,$by) pixel ($x,$y)")
      }
    }
  }

  /** ImageIO-encode a BufferedImage as JPEG at the given quality. */
  private def imageIoJpeg(bi: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    } finally { ios.close(); w.dispose() }
    baos.toByteArray
  }

  test("cross-validation: ImageIO-encoded GRAY JPEGs (full AC/DQT/Annex-K path) decode within IDCT tolerance") {
    // both decoders consume the SAME compressed stream; differences can
    // come only from IDCT rounding (spec-permitted implementation
    // latitude), so per-pixel agreement must be tight
    val rnd = new scala.util.Random(55)
    var worst = 0
    (1 to 8).foreach { i =>
      val w = 8 + rnd.nextInt(41)
      val h = 8 + rnd.nextInt(41)
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // mix of smooth gradient + noise: exercises both DC-dominated and
      // AC-rich blocks
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255 / w + rnd.nextInt(64)) % 256
        bi.getRaster.setSample(x, y, 0, v)
      }
      val bytes = imageIoJpeg(bi, 0.7f + 0.05f * (i % 5))
      val mine = Jpeg.decodeJpeg(bytes)
      assert(mine.width == w && mine.height == h && mine.nComp == 1, s"iter $i header")
      val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((mine.pixels(y * w + x) & 0xFF) - theirs.getRaster.getSample(x, y, 0))
        worst = math.max(worst, d)
        assert(d <= 2, s"iter $i ($x,$y): differ by $d")
      }
    }
    info(s"worst gray per-pixel delta vs ImageIO: $worst")
  }

  test("cross-validation: ImageIO-encoded COLOR JPEGs (YCbCr + subsampling) decode within upsampling tolerance") {
    // high quality keeps 4:4:4 in the JDK writer; lower quality switches
    // to subsampled chroma where our centered-bilinear vs the JDK's
    // triangle-filter upsampling differ only in integer rounding
    // (measured: worst 2, mean ~0.33 across both regimes) — bounds carry
    // margin but a channel swap, a YCbCr sign error, or a half-sample
    // plane misalignment fails them by an order of magnitude
    val rnd = new scala.util.Random(77)
    (1 to 6).foreach { i =>
      val w = 16 + rnd.nextInt(33)
      val h = 16 + rnd.nextInt(33)
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) // smooth color gradients
        bi.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | ((x + y) * 127 / (w + h)))
      val quality = if (i % 2 == 0) 0.95f else 0.75f
      val bytes = imageIoJpeg(bi, quality)
      val mine = Jpeg.decodeJpeg(bytes)
      assert(mine.width == w && mine.height == h && mine.nComp == 3, s"iter $i header")
      val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sum = 0L
      var worst = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val m = mine.pixels((y * w + x) * 3 + c) & 0xFF
        val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
        val d = math.abs(m - t)
        worst = math.max(worst, d)
        sum += d
      }
      val mean = sum.toDouble / (w * h * 3)
      info(f"iter $i q=$quality: worst=$worst mean=$mean%.3f")
      assert(worst <= 4 && mean <= 0.6,
        s"iter $i q=$quality: worst=$worst mean=$mean — decode diverges beyond upsampling latitude")
    }
  }

  test("malformed/unsupported streams fail closed with named errors") {
    val ok = Jpeg.encodeJpegGrayTiled(2, 2, tiles(4, 3))
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Jpeg.decodeJpeg(b)).getMessage
    // bad signature
    assert(err("nope".getBytes ++ ok.drop(4)).contains("SOI"))
    // truncated mid-stream
    assert(err(ok.take(ok.length / 2)).contains("truncated"))
    // progressive frame marker
    val sof2 = ok.clone()
    val sofAt = (0 until sof2.length - 1).find(i =>
      (sof2(i) & 0xFF) == 0xFF && (sof2(i + 1) & 0xFF) == 0xC0).get
    sof2(sofAt + 1) = 0xC2.toByte
    assert(err(sof2).toLowerCase.contains("progressive"))
    // 12-bit precision
    val p12 = ok.clone()
    p12(sofAt + 4) = 12.toByte
    assert(err(p12).contains("precision"))
    // SOS before SOF
    val noSof = ok.take(sofAt) ++ ok.drop(sofAt + 2 + (((ok(sofAt + 2) & 0xFF) << 8) | (ok(sofAt + 3) & 0xFF)))
    assert(err(noSof).contains("SOS before SOF"))
    // adversarial dims: Long-arithmetic guard, no wrapped allocation
    val big = ok.clone()
    big(sofAt + 5) = 0xFF.toByte; big(sofAt + 6) = 0xFF.toByte // height 65535
    big(sofAt + 7) = 0xFF.toByte; big(sofAt + 8) = 0xFF.toByte // width 65535
    assert(err(big).contains("raster too large"))
  }

  test("ancillary segments (APPn/COM) are walked over, not tripped on") {
    val ok = Jpeg.encodeJpegGrayTiled(2, 2, tiles(4, 9))
    // splice APP1 + COM right after SOI
    val app1 = Array(0xFF, 0xE1, 0x00, 0x08, 1, 2, 3, 4, 5, 6).map(_.toByte)
    val com = Array[Byte](0xFF.toByte, 0xFE.toByte, 0x00, 0x06) ++ "hi! ".getBytes("US-ASCII")
    val spliced = ok.take(2) ++ app1 ++ com ++ ok.drop(2)
    assert(Jpeg.decodeJpeg(spliced).pixels.sameElements(Jpeg.decodeJpeg(ok).pixels))
  }
}
