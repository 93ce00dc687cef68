package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaFunctions, Jpeg, Mp4}

/** Mutation-fuzz contract for the codec tier: on 100 TB of untrusted
  * bytes a decoder has exactly two acceptable outcomes — decode, or
  * throw a named IllegalArgumentException. Anything else
  * (ArrayIndexOutOfBounds, NumberFormat, NegativeArraySize, zip
  * DataFormatException, a hang, a multi-gigabyte allocation from a
  * 200-byte file) is a task-killer an adversarial corpus WILL find.
  * Deterministic seed, so a failure reproduces exactly.
  *
  * Three attack classes per codec: random byte mutations of a valid
  * blob (corrupt fields on every parse path), prefix truncations
  * (every partial-read path), and pure garbage (the sniff/magic path).
  */
class CodecFuzzSpec extends AnyFunSuite {

  // Unified fuzz budget (round-12, VERDICT-r11 #6): every target in the
  // tier runs the same committed budget (900 cases), scalable to the
  // validation tier with GRAFT_FUZZ_SCALE=8 (7200/target) — one knob,
  // one tier, no per-target budget drift. NOTES_r{N} records each
  // validation run.
  // The knob is validated, not trusted: 0/negative would zero every
  // case count and let the whole tier pass vacuously; non-numeric must
  // fail by name, not NumberFormatException.
  private val Scale = FuzzBudget.scale
  private val Mutations = 600 * Scale
  private val Truncations = 150 * Scale
  private val Garbage = 150 * Scale

  private def fuzz(name: String, valid: Array[Byte], decode: Array[Byte] => Any): Unit = {
    decode(valid) // sanity: the unmutated blob must decode
    val rnd = new scala.util.Random(0xC0DEC + name.hashCode)
    var ok = 0L
    var rejected = 0L
    def one(b: Array[Byte], what: => String): Unit =
      try { decode(b); ok += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
        case t: Throwable =>
          fail(s"$name/$what escaped the checked-failure contract: " +
            s"${t.getClass.getName}: ${t.getMessage}")
      }
    (1 to Mutations).foreach { i =>
      val b = valid.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      one(b, s"mutate#$i")
    }
    (1 to Truncations).foreach { i =>
      one(valid.take(rnd.nextInt(valid.length)), s"trunc#$i")
    }
    (1 to Garbage).foreach { i =>
      val b = new Array[Byte](1 + rnd.nextInt(256))
      rnd.nextBytes(b)
      one(b, s"garbage#$i")
    }
    info(s"$name: $ok decoded, $rejected rejected by name, 0 escapes")
  }

  private val luma = Array.tabulate(64)(i => (i * 37 % 251).toByte)

  test("PPM: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("ppm", MediaFunctions.encodePpmGray(8, 8, luma),
      b => MediaFunctions.decodePpm(b))
  }

  test("PNG: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("png", MediaFunctions.encodePng(8, 8, 0, luma, rowFilter = _ % 5),
      b => MediaFunctions.decodePng(b))
  }

  test("JPEG: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("jpeg", Jpeg.encodeJpegGrayTiled(8, 8, luma, restartInterval = 4),
      b => Jpeg.decodeJpeg(b))
  }

  test("WAV: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("wav", MediaFunctions.encodeWavPcm16(16000, 2,
      luma.map(v => ((v & 0xFF) * 257 - 32768).toShort), ancillary = true),
      b => MediaFunctions.decodeWavPcm16(b))
  }

  test("WAV fingerprint compound: decode+fingerprint-or-IAE under fire") {
    // the audio near-dup tier's full per-row path (round-13): whatever
    // decodeWav accepts, audioFingerprint must fingerprint without
    // throwing — a clip shape the decoder tolerates (zero samples, odd
    // frame counts, extreme amplitudes) must not crash the envelope
    // arithmetic downstream in a 100 TB dedup job
    fuzz("wav-fingerprint", MediaFunctions.encodeWavPcm16(16000, 2,
      luma.map(v => ((v & 0xFF) * 257 - 32768).toShort), ancillary = true),
      b => MediaFunctions.audioFingerprint(MediaFunctions.decodeWav(b).samples))
  }

  test("MP4: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("mp4", Mp4.encodeMp4(64, 36, 1000L, 40L,
      Array(luma.take(8), luma.slice(8, 24), luma.slice(24, 48), luma.drop(48)),
      withFree = true),
      b => Mp4.decodeMp4(b))
  }

  test("MP4 fingerprint: whatever decodeMp4 accepts, the frame-hash fold must not throw") {
    // the decode+fingerprint COMPOUND (the wav-fingerprint convention):
    // a mutated sample table that still parses may deliver zero-length
    // or short frames — the per-frame aHash must be total on them
    fuzz("mp4-fingerprint", Mp4.encodeMp4(64, 36, 1000L, 40L,
      Array(luma.take(8), luma.slice(8, 24), luma.slice(24, 48), luma.drop(48)),
      withFree = true),
      b => graft.queries.Multimodal.mp4ClipFingerprint(Mp4.decodeMp4(b)))
  }

  test("MJPEG fingerprint: demux + per-frame JPEG decode-or-IAE under fire") {
    // the decoded-domain video compound (round 14): a mutated container
    // that still parses hands arbitrary frame slices to the JPEG
    // decoder, whose own named-IAE contract must hold through the
    // composition (zero-length or garbage frames reject by name, never
    // escape as AIOOBE/NegativeArraySize)
    val frames = Array.tabulate(4)(f =>
      Jpeg.encodeJpegGrayTiled(4, 4, luma.slice(16 * f, 16 * (f + 1)),
        restartInterval = 2))
    fuzz("mjpeg-fingerprint", Mp4.encodeMp4(32, 32, 1000L, 40L, frames,
      withFree = true),
      b => graft.queries.Multimodal.mjpegClipFingerprint(Mp4.decodeMp4(b)))
  }

  test("MP4 multi-chunk: decode-or-IAE with stsc/stco tables under fire") {
    fuzz("mp4-chunks", Mp4.encodeMp4(64, 36, 1000L, 40L,
      Array(luma.take(8), luma.slice(8, 24), luma.slice(24, 48), luma.drop(48)),
      samplesPerChunk = Array(1, 2, 1)),
      b => Mp4.decodeMp4(b))
  }

  test("WAV float32: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("wav-float32", MediaFunctions.encodeWavFloat32(16000, 2,
      luma.map(v => ((v & 0xFF) * 257 - 32768).toShort), ancillary = true),
      b => MediaFunctions.decodeWav(b))
  }

  test("WAV extensible: decode-or-IAE with the GUID unwrap under fire") {
    fuzz("wav-extensible", MediaFunctions.encodeWavExtensible(16000, 2,
      luma.map(v => ((v & 0xFF) * 257 - 32768).toShort),
      subFloat = true, ancillary = true),
      b => MediaFunctions.decodeWav(b))
  }

  test("router compound: sniff+dispatch+decode-or-IAE under magic grafts and mutation") {
    // The compound the quarantine catch relies on (round-11 VERDICT #6):
    // sniffModality picks a decoder, the decoder runs on the blob, and
    // qMmRouteQuarantine's per-row catch sees only IllegalArgumentException.
    // Fuzzing each decoder separately never produces the adversarial case
    // routing invites — a blob whose MAGIC says one format while its BODY
    // is another's — so this target drives Multimodal.routeDecode with
    // exactly those: every format's magic grafted onto every other
    // format's body, plus mutations concentrated in the sniff region,
    // plus whole-blob mutations through the route.
    val pcm = luma.map(v => ((v & 0xFF) * 257 - 32768).toShort)
    val bodies: Seq[(String, Array[Byte])] = Seq(
      "ppm" -> MediaFunctions.encodePpmGray(8, 8, luma),
      "png" -> MediaFunctions.encodePng(8, 8, 0, luma, rowFilter = _ % 5),
      "jpeg" -> Jpeg.encodeJpegGrayTiled(8, 8, luma, restartInterval = 4),
      "wav" -> MediaFunctions.encodeWavPcm16(16000, 2, pcm, ancillary = true),
      "mp4" -> Mp4.encodeMp4(64, 36, 1000L, 40L,
        Array(luma.take(8), luma.slice(8, 24), luma.slice(24, 48), luma.drop(48)),
        samplesPerChunk = Array(1, 2, 1)))
    bodies.foreach { case (name, b) =>
      val (m, _, _) = graft.queries.Multimodal.routeDecode(b)
      assert(m == name, s"sanity: $name routes to itself")
    }
    val rnd = new scala.util.Random(0x407E12)
    var ok = 0L
    var rejected = 0L
    def one(b: Array[Byte], what: => String): Unit =
      try { graft.queries.Multimodal.routeDecode(b); ok += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
        case t: Throwable =>
          fail(s"router/$what escaped the checked-failure contract " +
            s"(a crafted blob would kill the task instead of quarantining): " +
            s"${t.getClass.getName}: ${t.getMessage}")
      }
    // 1. cross-format grafts: each format's 12-byte magic onto each
    // other's body — the sniff commits to the wrong decoder, which must
    // reject the foreign body BY NAME, never raw-crash
    for ((bn, body) <- bodies; (mn, magicSrc) <- bodies if bn != mn) {
      val b = body.clone()
      System.arraycopy(magicSrc, 0, b, 0, math.min(12, b.length))
      one(b, s"graft $mn-magic onto $bn-body")
    }
    // 2. sniff-region mutations: corrupt only the first 16 bytes, where
    // dispatch decisions live (partial magics, off-by-one signatures)
    (1 to Mutations).foreach { i =>
      val (_, body) = bodies(rnd.nextInt(bodies.size))
      val b = body.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(math.min(16, b.length))) = rnd.nextInt(256).toByte
      }
      one(b, s"sniff-mutate#$i")
    }
    // 3. whole-blob mutations through the route (the decoder fuzz, but
    // behind the dispatch)
    (1 to Mutations).foreach { i =>
      val (_, body) = bodies(rnd.nextInt(bodies.size))
      val b = body.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      one(b, s"route-mutate#$i")
    }
    info(s"router compound: $ok decoded, $rejected rejected by name, 0 escapes")
  }

  test("router: sniff-or-IAE on garbage (no blob reaches the wrong decoder)") {
    val rnd = new scala.util.Random(0x5EED)
    (1 to 300).foreach { _ =>
      val b = new Array[Byte](1 + rnd.nextInt(64))
      rnd.nextBytes(b)
      try MediaFunctions.sniffModality(b)
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("crafted PNG with a huge valid-CRC header cannot force the allocation") {
    // the IHDR CRC is not a secret: build a structurally-valid PNG whose
    // header claims ~0.5 GB and whose IDAT is 30 bytes — the
    // allocation-proportionality guard must reject it by name
    val big = MediaFunctions.encodePng(8, 8, 0, luma)
    // rewrite IHDR dims (offsets 16/20 in a well-formed PNG) and re-CRC
    val b = big.clone()
    def putBe32(at: Int, v: Long): Unit = (0 until 4).foreach { k =>
      b(at + k) = ((v >> (24 - 8 * k)) & 0xFF).toByte
    }
    putBe32(16, 23000L) // width
    putBe32(20, 23000L) // height: 23000^2 = 529 MB raster claim
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17) // chunk type + 13-byte IHDR payload
    putBe32(29, crc.getValue)
    val e = intercept[IllegalArgumentException](MediaFunctions.decodePng(b))
    assert(e.getMessage.contains("IDAT too short"))
  }

  test("tiny JPEG claiming a huge frame is rejected before allocation") {
    val b = Jpeg.encodeJpegGrayTiled(8, 8, luma)
    // SOF0 height/width live right after the marker+len+precision bytes;
    // find SOF0 and claim 65528x65528 from a ~500-byte file
    val at = (0 until b.length - 1).find(i =>
      (b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xC0).get
    def put16(o: Int, v: Int): Unit = { b(o) = (v >> 8).toByte; b(o + 1) = v.toByte }
    put16(at + 5, 65528); put16(at + 7, 65528)
    val e = intercept[IllegalArgumentException](Jpeg.decodeJpeg(b))
    assert(e.getMessage.contains("entropy stream too short") ||
      e.getMessage.contains("raster too large"))
  }
}
