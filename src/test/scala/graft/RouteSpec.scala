package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaFunctions, Jpeg, Mp4}

/** Modality-router invariants: every codec in the decode seam is
  * recognized from its magic bytes alone, near-miss magics are NOT
  * (RIFF that isn't WAVE, PNG with damaged canary bytes), and anything
  * unrecognized fails closed by name — an unroutable blob must never
  * reach a decoder that would misparse it. */
class RouteSpec extends AnyFunSuite {

  private val luma = Array.tabulate(64)(i => (i * 37 % 251).toByte)

  test("all five encoders are sniffed to their own modality") {
    assert(MediaFunctions.sniffModality(
      MediaFunctions.encodePpmGray(8, 8, luma)) == "ppm")
    assert(MediaFunctions.sniffModality(
      MediaFunctions.encodePng(8, 8, 0, luma)) == "png")
    assert(MediaFunctions.sniffModality(
      Jpeg.encodeJpegGrayTiled(8, 8, luma)) == "jpeg")
    assert(MediaFunctions.sniffModality(
      MediaFunctions.encodeWavPcm16(16000, 1,
        luma.map(b => ((b & 0xFF) * 257 - 32768).toShort))) == "wav")
    assert(MediaFunctions.sniffModality(
      Mp4.encodeMp4(16, 9, 1000L, 40L, Array(luma.take(8)))) == "mp4")
  }

  test("RIFF container that is not WAVE is unroutable, not 'wav'") {
    val wav = MediaFunctions.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    val avi = wav.clone()
    "AVI ".getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) => avi(8 + k) = b }
    val e = intercept[IllegalArgumentException](MediaFunctions.sniffModality(avi))
    assert(e.getMessage.contains("unroutable"))
  }

  test("PNG with a damaged signature canary byte is unroutable") {
    val png = MediaFunctions.encodePng(8, 8, 0, luma)
    val damaged = png.clone()
    damaged(4) = 0x0A // the \r of \r\n stripped — exactly what the
    // 8-byte signature exists to catch (text-mode transmission damage)
    val e = intercept[IllegalArgumentException](MediaFunctions.sniffModality(damaged))
    assert(e.getMessage.contains("unroutable"))
  }

  test("short and unknown blobs fail closed by name") {
    assert(intercept[IllegalArgumentException](
      MediaFunctions.sniffModality(Array[Byte](1, 2, 3)))
      .getMessage.contains("too short"))
    assert(intercept[IllegalArgumentException](
      MediaFunctions.sniffModality(Array.fill[Byte](32)(0x42)))
      .getMessage.contains("unroutable"))
  }

  test("routed decode features match a direct decode of the same blob") {
    // the router's dispatch must be a no-op vs calling the right codec:
    // same luma sum through sniff+decode as through the codec directly
    val png = MediaFunctions.encodePng(8, 8, 0, luma, rowFilter = y => y % 5)
    assert(MediaFunctions.sniffModality(png) == "png")
    val im = MediaFunctions.decodePng(png)
    val direct = (0 until 64).map(im.luma).sum
    assert(direct == luma.map(_ & 0xFF).sum)
  }
}
