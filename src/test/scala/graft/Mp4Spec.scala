package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp4

/** ISO BMFF container codec invariants: round-trips across the box-walk
  * edge forms (largesize, to-EOF, skippable boxes), and the checked
  * failure modes a container parser must have — every table read is
  * bounds-checked against its box, every sample extent against mdat. */
class Mp4Spec extends AnyFunSuite {

  private def mkFrames(sizes: Int*): Array[Array[Byte]] = {
    var b = 0
    sizes.map { n =>
      Array.tabulate(n) { _ => b += 1; (b * 37 % 251).toByte }
    }.toArray
  }

  test("round-trip recovers dims, timing, frame boundaries, and exact payloads") {
    val rnd = new scala.util.Random(2468)
    (1 to 25).foreach { i =>
      val nFrames = rnd.nextInt(6) + 1
      val sizes = Array.fill(nFrames)(rnd.nextInt(40) + 1)
      val frames = mkFrames(sizes.toIndexedSeq: _*)
      val w = rnd.nextInt(1920) + 1
      val h = rnd.nextInt(1080) + 1
      val ts = rnd.nextInt(90000) + 1
      val delta = rnd.nextInt(3000) + 1
      val bytes = Mp4.encodeMp4(w, h, ts.toLong, delta.toLong, frames,
        withFree = i % 3 == 0, largesizeMdat = i % 5 == 0)
      val v = Mp4.decodeMp4(bytes)
      assert(v.width == w && v.height == h, s"iter $i dims")
      assert(v.timescale == ts, s"iter $i timescale")
      assert(v.durationTicks == delta.toLong * nFrames, s"iter $i duration")
      assert(v.nFrames == nFrames, s"iter $i frame count")
      frames.indices.foreach { f =>
        assert(v.frames(f).sameElements(frames(f)), s"iter $i frame $f")
      }
    }
  }

  test("a duration field equal to the old stco sentinel bytes round-trips") {
    // regression: the encoder once back-patched stco by SEARCHING for a
    // 0xDEADBEEF placeholder; a duration legitimately holding those
    // bytes (written into mvhd, BEFORE stco) would have been patched
    // instead, corrupting the timing and leaving stco pointing nowhere
    val frames = mkFrames(8)
    val v = Mp4.decodeMp4(Mp4.encodeMp4(64, 36, 90000L, 0xDEADBEEFL, frames))
    assert(v.durationTicks == 0xDEADBEEFL)
    assert(v.frames(0).sameElements(frames(0)))
  }

  test("timescale or duration overflowing the 32-bit v0 fields fails closed") {
    val frames = mkFrames(8)
    assert(intercept[IllegalArgumentException](
      Mp4.encodeMp4(64, 36, 0x1_0000_0000L, 40L, frames))
      .getMessage.contains("exceeds 32-bit"))
    assert(intercept[IllegalArgumentException](
      Mp4.encodeMp4(64, 36, 90000L, 0x1_0000_0000L, frames))
      .getMessage.contains("exceeds 32-bit"))
  }

  test("size==0 (box to end of file) parses: mdat as the unsized last box") {
    val frames = mkFrames(8, 16)
    val bytes = Mp4.encodeMp4(64, 36, 1000L, 40L, frames)
    // find the mdat header and zero its 32-bit size: the spec's
    // box-extends-to-EOF form, which real muxers emit while recording
    val at = (0 until bytes.length - 4).find(i =>
      bytes(i) == 'm' && bytes(i + 1) == 'd' && bytes(i + 2) == 'a' &&
      bytes(i + 3) == 't').get - 4
    (0 until 4).foreach(k => bytes(at + k) = 0)
    val v = Mp4.decodeMp4(bytes)
    assert(v.nFrames == 2 && v.frames(1).sameElements(frames(1)))
  }

  test("malformed containers fail closed with named errors") {
    val frames = mkFrames(8, 16, 24)
    val good = Mp4.encodeMp4(128, 72, 1000L, 40L, frames)
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Mp4.decodeMp4(b)).getMessage
    def find(tag: String): Int =
      (0 until good.length - 4).find(i =>
        (0 until 4).forall(k => good(i + k) == tag.charAt(k))).get

    // truncated mid-box
    assert(err(good.take(good.length - 5)).contains("overruns container"))
    assert(err(good.take(5)).contains("truncated box header"))
    // box size smaller than its header
    val small = good.clone()
    val ftypAt = find("ftyp") - 4
    small(ftypAt + 3) = 4 // size 4 < 8
    assert(err(small).contains("size 4 < header"))
    // non-v0 full box version rejected by name
    val v1 = good.clone(); v1(find("mdhd") + 4) = 1
    assert(err(v1).contains("mdhd version 1 unsupported"))
    // stsz entry count beyond its box: named truncation, not an
    // ArrayIndexOutOfBounds read into the neighbor box
    val fatStsz = good.clone()
    val stszCountAt = find("stsz") + 4 + 4 + 4 // header + verflags + sample_size
    fatStsz(stszCountAt + 2) = 0x7F.toByte
    assert(err(fatStsz).contains("stsz table truncated"))
    // sample extent escaping mdat: bump the last stsz size
    val fatSample = good.clone()
    val lastSizeAt = stszCountAt + 4 + 4 * 2 // third entry
    fatSample(lastSizeAt + 2) = 1 // 24 -> 24 + 256
    assert(err(fatSample).contains("escapes mdat"))
    // chunk offset pointing outside mdat
    val badStco = good.clone()
    val stcoOffAt = find("stco") + 4 + 4 + 4
    badStco(stcoOffAt) = 0x7F.toByte
    assert(err(badStco).contains("escapes mdat"))
    // stco claiming more chunks than its table holds: named truncation,
    // not a read into the neighbor box
    val multi = good.clone()
    multi(find("stco") + 4 + 4 + 3) = 2
    assert(err(multi).contains("stco table truncated"))
    // missing moov: cut everything except ftyp + mdat
    val ftypLen = 24
    val mdatAt = find("mdat") - 4
    val noMoov = good.take(ftypLen) ++ good.drop(mdatAt)
    assert(err(noMoov).contains("missing or empty tkhd"))
  }

  test("multi-chunk: stsc runs + per-chunk stco offsets recover sample order") {
    // the encoder lays chunks in REVERSE file order, so a decoder that
    // ignores stco and reads mdat sequentially returns wrong payloads —
    // passing this test proves per-chunk offsets are actually honored
    val rnd = new scala.util.Random(97531)
    (1 to 25).foreach { i =>
      val nChunks = rnd.nextInt(4) + 2 // 2..5 chunks
      val spc = Array.fill(nChunks)(rnd.nextInt(3) + 1) // varying samples/chunk
      val frames = mkFrames(Array.fill(spc.sum)(rnd.nextInt(30) + 1).toIndexedSeq: _*)
      val bytes = Mp4.encodeMp4(320, 180, 1000L, 40L, frames,
        withFree = i % 3 == 0, largesizeMdat = i % 4 == 0, samplesPerChunk = spc)
      val v = Mp4.decodeMp4(bytes)
      assert(v.nFrames == frames.length, s"iter $i frame count")
      frames.indices.foreach { f =>
        assert(v.frames(f).sameElements(frames(f)),
          s"iter $i frame $f (chunks ${spc.mkString(",")})")
      }
    }
  }

  test("multi-chunk: equal samples-per-chunk compresses to one stsc run") {
    val frames = mkFrames(5, 6, 7, 8)
    val bytes = Mp4.encodeMp4(64, 36, 1000L, 40L, frames,
      samplesPerChunk = Array(2, 2))
    // stsc payload: verflags + entry_count(1) + one (first, spc, sdidx) run
    val at = (0 until bytes.length - 4).find(i =>
      (0 until 4).forall(k => bytes(i + k) == "stsc".charAt(k))).get
    val entryCount = ((bytes(at + 8) & 0xFF) << 24) | ((bytes(at + 9) & 0xFF) << 16) |
      ((bytes(at + 10) & 0xFF) << 8) | (bytes(at + 11) & 0xFF)
    assert(entryCount == 1, "two chunks of equal spc must share one stsc run")
    val v = Mp4.decodeMp4(bytes)
    assert(v.nFrames == 4)
    frames.indices.foreach(f => assert(v.frames(f).sameElements(frames(f))))
  }

  test("inconsistent sample tables fail closed with named errors") {
    val frames = mkFrames(8, 16, 24, 10)
    val good = Mp4.encodeMp4(64, 36, 1000L, 40L, frames,
      samplesPerChunk = Array(3, 1))
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Mp4.decodeMp4(b)).getMessage
    def find(tag: String): Int =
      (0 until good.length - 4).find(i =>
        (0 until 4).forall(k => good(i + k) == tag.charAt(k))).get

    // stsc mapping more samples than stsz holds
    val over = good.clone()
    // first run's samples_per_chunk: stsc + 4(verflags) + 4(count) + 4(first)
    over(find("stsc") + 4 + 4 + 4 + 4 + 3) = 9
    assert(err(over).contains("stsc maps"))
    // stsc run starting past the stco chunk count
    val past = good.clone()
    past(find("stsc") + 4 + 4 + 4 + 12 + 3) = 7 // second run first_chunk 2 -> 7
    assert(err(past).contains("but stco has"))
    // stsc first run not starting at chunk 1
    val notOne = good.clone()
    notOne(find("stsc") + 4 + 4 + 4 + 3) = 3
    assert(err(notOne).contains("not 1"))
    // a full box holding ONLY verflags (size 12): the entry-count word
    // sits past the box, and before round 12 the count read escaped as a
    // raw ArrayIndexOutOfBoundsException when the box ended the blob —
    // it must fail by name instead
    val emptyStts = good.clone()
    emptyStts(find("stts") - 4 + 3) = 12
    assert(err(emptyStts).contains("stts entry count truncated"))
    val emptyStco = good.clone()
    emptyStco(find("stco") - 4 + 3) = 12
    assert(err(emptyStco).contains("stco entry count truncated"))
  }

  test("unknown boxes are skipped at every level (forward compatibility)") {
    val frames = mkFrames(8, 16)
    val good = Mp4.encodeMp4(64, 36, 1000L, 40L, frames)
    // splice an unknown top-level box between ftyp and moov
    val unknown = {
      val payload = "future-format-data".getBytes("US-ASCII")
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put("wat!".getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val spliced = good.take(24) ++ unknown ++ good.drop(24)
    // stco offsets shifted by the splice; frames land elsewhere — but the
    // PARSE must still walk cleanly, so only assert structural fields
    val v = Mp4.decodeMp4(Mp4.encodeMp4(64, 36, 1000L, 40L, frames, withFree = true))
    assert(v.nFrames == 2)
    // and the spliced file still walks to a decode attempt that fails only
    // on the (now stale) sample extents, not on the unknown box
    val e = intercept[IllegalArgumentException](Mp4.decodeMp4(spliced))
    assert(e.getMessage.contains("escapes mdat"))
  }
}
