package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaFunctions
import graft.functions.MediaFunctions.MediaBlob

/** Batch-decode plumbing + byte-feature invariants for the multimodal layer. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def blob(n: Int) = Array.tabulate(n)(i => (i * 37 % 256).toByte)

  test("decodeBatches preserves order, count, and row identity across batch boundaries") {
    val rows = (0 until 200).map(i => MediaBlob(i.toLong, "img", blob(16)))
    val out = MediaFunctions.decodeBatches(rows.iterator, batchSize = 7).toSeq
    assert(out.map(_.docId) == rows.map(_.docId))
    assert(out.forall(_.nBytes == 16))
    assert(out.forall(_.pixels.length == 16))
  }

  test("PPM codec: encode/decode round-trip recovers dims, maxval, and exact pixels") {
    val luma = blob(64)
    val img = MediaFunctions.decodePpm(MediaFunctions.encodePpmGray(8, 8, luma))
    assert(img.width == 8 && img.height == 8 && img.maxVal == 255)
    assert((0 until 64).forall(i => img.luma(i) == (luma(i) & 0xFF)))
    // non-square dims parse from the header, not assumption
    val wide = MediaFunctions.decodePpm(MediaFunctions.encodePpmGray(16, 4, luma))
    assert(wide.width == 16 && wide.height == 4)
  }

  test("PPM parser: comments/whitespace tolerated, malformed input rejected") {
    // comments and arbitrary whitespace anywhere in the header
    val raster = Array.fill(2 * 1 * 3)(42.toByte)
    val weird = ("P6 # magic comment\n#another\n  2\t1 # dims\n 255\n")
      .getBytes("US-ASCII") ++ raster
    val img = MediaFunctions.decodePpm(weird)
    assert(img.width == 2 && img.height == 1 && img.luma(0) == 42)
    // wrong magic (P5 = grayscale PGM, not handled here)
    intercept[IllegalArgumentException] {
      MediaFunctions.decodePpm("P5\n2 1\n255\n".getBytes("US-ASCII") ++ raster)
    }
    // 16-bit raster unsupported
    intercept[IllegalArgumentException] {
      MediaFunctions.decodePpm("P6\n2 1\n65535\n".getBytes("US-ASCII") ++ raster)
    }
    // truncated raster
    intercept[IllegalArgumentException] {
      MediaFunctions.decodePpm("P6\n2 1\n255\n".getBytes("US-ASCII") ++ raster.take(3))
    }
    // non-numeric dimension
    intercept[IllegalArgumentException] {
      MediaFunctions.decodePpm("P6\nx 1\n255\n".getBytes("US-ASCII") ++ raster)
    }
  }

  test("intensity signal is deterministic and bounded [0,1]") {
    val px = MediaFunctions.byteIntensities(blob(64))
    assert(px.forall(p => p >= 0.0 && p <= 1.0))
    assert(px.sameElements(MediaFunctions.byteIntensities(blob(64))))
  }

  test("byte features are true functions of known blobs") {
    // 16 distinct bytes: entropy exactly 4 bits, 16 runs of length 1,
    // collision = 16 * 1², mode count 1
    val distinct = MediaFunctions.decode(MediaBlob(1, "img", blob(16)))
    assert(distinct.entropyMilli == 4000)
    assert(distinct.nDistinct == 16 && distinct.modeCount == 1)
    assert(distinct.collisionX == 16)
    assert(distinct.nRuns == 16 && distinct.maxRun == 1)
    // constant blob: zero entropy, one run spanning everything
    val const = MediaFunctions.decode(MediaBlob(2, "img", Array.fill(16)(7.toByte)))
    assert(const.entropyMilli == 0)
    assert(const.nDistinct == 1 && const.modeCount == 16)
    assert(const.collisionX == 256)
    assert(const.nRuns == 1 && const.maxRun == 16)
    // half-and-half: 1 bit of entropy, 2 runs
    val half = MediaFunctions.decode(MediaBlob(3, "img",
      Array.fill(8)(1.toByte) ++ Array.fill(8)(2.toByte)))
    assert(half.entropyMilli == 1000)
    assert(half.nRuns == 2 && half.maxRun == 8)
  }

  test("resize block-means; downsampleSums is its exact-integer sibling; frame sampling") {
    val d = MediaFunctions.decodeBatches(Iterator(MediaBlob(1, "img", blob(16)))).next()
    val r = MediaFunctions.resize(d, 4)
    assert(r.pixels.length == 4)
    // block mean of intensities == block sum of bytes / (block * 255)
    val sums = MediaFunctions.downsampleSums(blob(16), 4)
    assert(sums.length == 4)
    (0 until 4).foreach { i =>
      assert(math.abs(r.pixels(i) - sums(i) / (4.0 * 255.0)) < 1e-12)
    }
    val frames = MediaFunctions.sampleFrames(blob(16), 4)
    assert(frames.length == 4 && frames(1) == blob(16)(4))
  }

  test("phash near-dup: threshold respected, hamming is the true bit distance") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("q_mm_phash")(spark, sf)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 <= 3))
    // recompute each doc's aHash independently (through the md5 hex path,
    // not the operator's byte path) and check the reported hamming
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), unhex(md5(col("text"))).as("blob")).collect()
      .map { r =>
        val bs = r.getAs[Array[Byte]]("blob").map(_ & 0xff)
        val mean = bs.sum / bs.length
        var h = 0L
        bs.zipWithIndex.foreach { case (b, i) => if (b >= mean) h |= 1L << i }
        r.getLong(0) -> h
      }.toMap
    rows.foreach { case (a, b, ham) =>
      assert(java.lang.Long.bitCount(docs(a) ^ docs(b)) == ham,
        s"pair ($a,$b) reported $ham")
    }
    // pigeonhole completeness: brute-force over the recomputed hashes
    // finds exactly the operator's pair set
    val ids = docs.keys.toArray.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if java.lang.Long.bitCount(docs(ids(i)) ^ docs(ids(j))) <= 3
    } yield (ids(i), ids(j))).toSet
    assert(rows.map(p => (p._1, p._2)).toSet == brute)
  }

  test("PNG codec: round-trip recovers dims, color type, and exact pixels under every filter") {
    val gray = Array.tabulate(8 * 8)(i => ((i * 37 + 11) % 256).toByte)
    val rgb = Array.tabulate(4 * 4 * 3)(i => ((i * 91 + 5) % 256).toByte)
    // each filter type alone, plus the all-five mix the gate query uses
    val filterPlans: Seq[Int => Int] =
      (0 to 4).map(f => (_: Int) => f) :+ ((y: Int) => y % 5)
    filterPlans.foreach { plan =>
      val g = MediaFunctions.decodePng(MediaFunctions.encodePng(8, 8, 0, gray, plan))
      assert((g.width, g.height, g.colorType) == (8, 8, 0))
      assert(g.pixels.sameElements(gray))
      val c = MediaFunctions.decodePng(MediaFunctions.encodePng(4, 4, 2, rgb, plan))
      assert((c.width, c.height, c.colorType) == (4, 4, 2))
      assert(c.pixels.sameElements(rgb))
    }
    // luma: gray = the byte; RGB = (r+g+b) DIV 3
    val c = MediaFunctions.decodePng(MediaFunctions.encodePng(4, 4, 2, rgb))
    assert(c.luma(0) == ((rgb(0) & 0xFF) + (rgb(1) & 0xFF) + (rgb(2) & 0xFF)) / 3)
  }

  test("PNG codec: randomized round-trip over arbitrary dims, color types, filter plans") {
    // seeded-random shapes the gate fixtures never produce: 1-pixel rows
    // and columns (left/up predictors degenerate), odd strides, random
    // per-row filter mixes — any predictor bug cascades through the row
    // and breaks exact pixel equality
    val rnd = new scala.util.Random(1234)
    (1 to 60).foreach { i =>
      val w = rnd.nextInt(24) + 1
      val h = rnd.nextInt(24) + 1
      val ct = if (rnd.nextBoolean()) 0 else 2
      val ch = if (ct == 0) 1 else 3
      val raster = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val filters = Array.fill(h)(rnd.nextInt(5))
      val img = MediaFunctions.decodePng(
        MediaFunctions.encodePng(w, h, ct, raster, y => filters(y)))
      assert((img.width, img.height, img.colorType) == (w, h, ct), s"iter $i dims")
      assert(img.pixels.sameElements(raster),
        s"iter $i pixels (w=$w h=$h ct=$ct filters=${filters.toSeq})")
    }
  }

  test("PNG parser: malformed input rejected, ancillary chunks tolerated") {
    val gray = Array.tabulate(4)(i => (i * 50).toByte)
    val ok = MediaFunctions.encodePng(2, 2, 0, gray)
    // bad signature
    assertThrows[IllegalArgumentException](
      MediaFunctions.decodePng("JFIF0000".getBytes ++ ok.drop(8)))
    // corrupt one IDAT payload byte -> CRC mismatch must throw, not decode
    val corrupt = ok.clone()
    corrupt(ok.length - 13) = (corrupt(ok.length - 13) ^ 0x55).toByte
    assertThrows[IllegalArgumentException](MediaFunctions.decodePng(corrupt))
    // truncated mid-chunk
    assertThrows[IllegalArgumentException](
      MediaFunctions.decodePng(ok.take(ok.length - 6)))
    // unsupported shapes rejected at encode AND at decode (hand-build a
    // 16-bit-depth IHDR to hit the decoder's check)
    assertThrows[IllegalArgumentException](MediaFunctions.encodePng(2, 2, 6, gray))
    val depth16 = ok.clone()
    depth16(8 + 8 + 8) = 16.toByte // IHDR bit-depth byte
    // fix the IHDR CRC so the depth check (not the CRC check) fires
    val crc = new java.util.zip.CRC32()
    crc.update(depth16, 12, 4 + 13)
    val fixed = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    System.arraycopy(fixed, 0, depth16, 12 + 4 + 13, 4)
    val e = intercept[IllegalArgumentException](MediaFunctions.decodePng(depth16))
    assert(e.getMessage.contains("bit depth"))
    // an ancillary chunk (tEXt) between IDAT and IEND is walked over
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("US-ASCII")
      val c2 = new java.util.zip.CRC32(); c2.update(tb); c2.update(data)
      java.nio.ByteBuffer.allocate(4).putInt(data.length).array() ++ tb ++ data ++
        java.nio.ByteBuffer.allocate(4).putInt(c2.getValue.toInt).array()
    }
    val withText = ok.take(ok.length - 12) ++
      chunk("tEXt", "graft test".getBytes("US-ASCII")) ++ ok.drop(ok.length - 12)
    assert(MediaFunctions.decodePng(withText).pixels.sameElements(gray))
  }

  // hand-build a chunk (length + type + data + CRC32 over type+data)
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val c = new java.util.zip.CRC32(); c.update(tb); c.update(data)
    java.nio.ByteBuffer.allocate(4).putInt(data.length).array() ++ tb ++ data ++
      java.nio.ByteBuffer.allocate(4).putInt(c.getValue.toInt).array()
  }
  private val pngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private def ihdr(w: Int, h: Int, ct: Int): Array[Byte] =
    pngChunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(ct.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())

  test("PNG parser: FDICT zlib stream rejected, not spun on (round-10 ADVICE)") {
    // zlib header with the FDICT bit set: CMF=0x78, FLG=0x20 satisfies the
    // %31 check ((0x7820 % 31) == 0) and PNG forbids preset dictionaries
    // (spec 10.1). Inflater.inflate returns 0 with needsDictionary set,
    // which used to spin the inflate loop forever; now it must throw.
    val fdict = Array(0x78, 0x20, 0, 0, 0, 1, 0xDE, 0xAD).map(_.toByte)
    val blob = pngSig ++ ihdr(2, 2, 0) ++ pngChunk("IDAT", fdict) ++
      pngChunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](MediaFunctions.decodePng(blob))
    assert(e.getMessage.contains("FDICT"))
  }

  test("PNG parser: adversarial IHDR dims fail the Long-arithmetic guard, no overflow") {
    // width 2^30 RGB: stride*height wraps Int (would have been a negative
    // or wrapped-small allocation); must throw the checked failure instead
    val blob = pngSig ++ ihdr(1 << 30, 4, 2) ++
      pngChunk("IDAT", Array(0x78, 0x9C).map(_.toByte)) ++
      pngChunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](MediaFunctions.decodePng(blob))
    assert(e.getMessage.contains("raster too large"))
    // encode side refuses the same shapes before touching the raster math
    assertThrows[IllegalArgumentException](
      MediaFunctions.encodePng(1 << 30, 4, 2, Array.emptyByteArray))
  }

  // ---- Independent-oracle cross-validation (round-10 VERDICT #2): the
  // JDK ships a second, independently-authored PNG implementation
  // (javax.imageio). Round-trips through OUR encoder+decoder can't catch
  // a self-consistent spec misread (e.g. a filter subtlety both sides
  // implement identically wrong); pixel-exact agreement with ImageIO in
  // BOTH directions can. Zero new dependencies (java.desktop).

  test("PNG cross-validation: encodePng output decodes pixel-exact through javax.imageio") {
    val rnd = new scala.util.Random(4321)
    (1 to 20).foreach { i =>
      val w = rnd.nextInt(24) + 1
      val h = rnd.nextInt(24) + 1
      val ct = if (i % 2 == 0) 0 else 2
      val ch = if (ct == 0) 1 else 3
      val raster = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      // filter-diverse: every row a random filter, so agreement covers
      // Sub/Up/Average/Paeth, not just None
      val filters = Array.fill(h)(rnd.nextInt(5))
      val bytes = MediaFunctions.encodePng(w, h, ct, raster, y => filters(y))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"iter $i: ImageIO rejected encodePng output")
      assert(img.getWidth == w && img.getHeight == h, s"iter $i dims")
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (ct == 0) {
            assert(r.getSample(x, y, 0) == (raster(y * w + x) & 0xFF),
              s"iter $i gray ($x,$y) filters=${filters.toSeq}")
          } else {
            val base = (y * w + x) * 3
            assert(r.getSample(x, y, 0) == (raster(base) & 0xFF) &&
                   r.getSample(x, y, 1) == (raster(base + 1) & 0xFF) &&
                   r.getSample(x, y, 2) == (raster(base + 2) & 0xFF),
              s"iter $i rgb ($x,$y) filters=${filters.toSeq}")
          }
          x += 1
        }
        y += 1
      }
    }
  }

  test("PNG cross-validation: javax.imageio-encoded PNGs decode pixel-exact through decodePng") {
    val rnd = new scala.util.Random(9876)
    (1 to 20).foreach { i =>
      val w = rnd.nextInt(24) + 1
      val h = rnd.nextInt(24) + 1
      val ct = if (i % 2 == 0) 0 else 2
      // build the image through AWT types so the PNG writer (its own
      // adaptive per-row filter choice) produces the compressed stream
      val (bi, expected) =
        if (ct == 0) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val px = Array.fill(w * h)(rnd.nextInt(256))
          px.zipWithIndex.foreach { case (v, k) =>
            img.getRaster.setSample(k % w, k / w, 0, v)
          }
          (img, px.map(_.toByte))
        } else {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val px = Array.fill(w * h * 3)(rnd.nextInt(256))
          (0 until w * h).foreach { k =>
            img.setRGB(k % w, k / w,
              (px(3 * k) << 16) | (px(3 * k + 1) << 8) | px(3 * k + 2))
          }
          (img, px.map(_.toByte))
        }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", baos), s"iter $i: no PNG writer")
      val dec = MediaFunctions.decodePng(baos.toByteArray)
      assert(dec.width == w && dec.height == h, s"iter $i dims")
      assert(dec.colorType == ct, s"iter $i color type " + dec.colorType)
      assert(dec.pixels.sameElements(expected), s"iter $i pixels (w=$w h=$h ct=$ct)")
    }
  }

  // ---- WAV (RIFF PCM) codec: the audio modality in the decode seam ----

  test("WAV round-trip: format + samples survive encode/decode, ancillary chunk skipped") {
    val rnd = new scala.util.Random(1357)
    (1 to 20).foreach { i =>
      val ch = rnd.nextInt(3) + 1
      val frames = rnd.nextInt(200) + 1
      val rate = Seq(8000, 16000, 22050, 44100)(rnd.nextInt(4))
      val samples = Array.fill(frames * ch)((rnd.nextInt(65536) - 32768).toShort)
      val bytes = MediaFunctions.encodeWavPcm16(rate, ch, samples,
        ancillary = i % 2 == 0)
      val clip = MediaFunctions.decodeWavPcm16(bytes)
      assert(clip.sampleRate == rate && clip.channels == ch, s"iter $i format")
      assert(clip.nFrames == frames, s"iter $i frames")
      assert(clip.samples.sameElements(samples), s"iter $i samples")
    }
  }

  test("WAV malformed inputs fail closed with named errors") {
    val good = MediaFunctions.encodeWavPcm16(16000, 2, Array[Short](1, -2, 3, -4))
    def mutated(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(off) = v.toByte; b
    }
    def err(blob: Array[Byte]): String =
      intercept[IllegalArgumentException](
        MediaFunctions.decodeWavPcm16(blob)).getMessage
    assert(err(mutated(0, 'X')).contains("not a RIFF"))
    assert(err(mutated(8, 'X')).contains("not a WAVE"))
    // format tag 3 on a 16-bit layout: float requires 32-bit containers
    assert(err(mutated(20, 3)).contains("32-bit float only"))
    assert(err(mutated(34, 8)).contains("bit depth 8"))         // bits 16 -> 8
    assert(err(mutated(32, 5)).contains("blockAlign"))          // 4 -> 5
    assert(err(mutated(29, 0)).contains("byteRate"))            // 0xFA byte of 64000
    assert(err(good.take(good.length - 2)).contains("truncated chunk 'data'"))
    assert(err(good.take(30)).contains("truncated chunk"))      // inside fmt
    // extensible format tag (0xFFFE little-endian at offset 20)
    val ext = good.clone(); ext(20) = 0xFE.toByte; ext(21) = 0xFF.toByte
    assert(err(ext).contains("EXTENSIBLE"))
    // a data length that is a partial frame (7 bytes with blockAlign 4)
    val partial = good.clone(); partial(40) = 7
    assert(err(partial).contains("partial frame"))
    // no data chunk at all: cut right after fmt
    assert(err(good.take(36)).contains("missing data"))
  }

  // ---- Independent-oracle cross-validation, audio edition: the JDK
  // ships a second, independently-authored RIFF/WAVE implementation
  // (javax.sound.sampled). Same reasoning as the ImageIO tests: a
  // self-consistent spec misread in our encoder+decoder pair survives
  // round-trips, but not agreement with a different author's parser.
  // Zero new dependencies (java.desktop).

  test("WAV cross-validation: encodeWavPcm16 output parses through javax.sound.sampled") {
    import javax.sound.sampled.{AudioSystem, AudioFormat}
    val rnd = new scala.util.Random(8642)
    (1 to 20).foreach { i =>
      val ch = rnd.nextInt(2) + 1
      val frames = rnd.nextInt(100) + 1
      val rate = Seq(8000, 16000, 32000, 48000)(rnd.nextInt(4))
      val samples = Array.fill(frames * ch)((rnd.nextInt(65536) - 32768).toShort)
      val bytes = MediaFunctions.encodeWavPcm16(rate, ch, samples,
        ancillary = i % 2 == 0)
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      assert(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED, s"iter $i encoding")
      assert(f.getSampleRate == rate.toFloat, s"iter $i rate")
      assert(f.getChannels == ch, s"iter $i channels")
      assert(f.getSampleSizeInBits == 16 && !f.isBigEndian, s"iter $i depth/endian")
      assert(ais.getFrameLength == frames, s"iter $i frame count")
      val pcm = ais.readAllBytes()
      val expected = new Array[Byte](samples.length * 2)
      samples.indices.foreach { k =>
        expected(2 * k) = (samples(k) & 0xFF).toByte
        expected(2 * k + 1) = ((samples(k) >> 8) & 0xFF).toByte
      }
      assert(pcm.sameElements(expected), s"iter $i pcm bytes (anc=${i % 2 == 0})")
    }
  }

  test("WAV cross-validation: javax.sound.sampled-written WAVs decode sample-exact") {
    import javax.sound.sampled.{AudioSystem, AudioFormat, AudioInputStream, AudioFileFormat}
    val rnd = new scala.util.Random(7531)
    (1 to 20).foreach { i =>
      val ch = rnd.nextInt(2) + 1
      val frames = rnd.nextInt(100) + 1
      val rate = Seq(8000, 16000, 32000, 48000)(rnd.nextInt(4))
      val samples = Array.fill(frames * ch)((rnd.nextInt(65536) - 32768).toShort)
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { k =>
        pcm(2 * k) = (samples(k) & 0xFF).toByte
        pcm(2 * k + 1) = ((samples(k) >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, baos)
      val clip = MediaFunctions.decodeWavPcm16(baos.toByteArray)
      assert(clip.sampleRate == rate && clip.channels == ch, s"iter $i format")
      assert(clip.nFrames == frames, s"iter $i frames")
      assert(clip.samples.sameElements(samples), s"iter $i samples")
    }
  }

  test("WAV forms: float32 and EXTENSIBLE round-trip the same integers as PCM16") {
    val rnd = new scala.util.Random(24680)
    (1 to 20).foreach { i =>
      val ch = rnd.nextInt(2) + 1
      val frames = rnd.nextInt(150) + 1
      val rate = Seq(8000, 16000, 44100, 48000)(rnd.nextInt(4))
      val samples = Array.fill(frames * ch)((rnd.nextInt(65536) - 32768).toShort)
      val anc = i % 2 == 0
      val forms = Seq(
        ("pcm16", 1, false,
          MediaFunctions.encodeWavPcm16(rate, ch, samples, ancillary = anc)),
        ("float32", 3, false,
          MediaFunctions.encodeWavFloat32(rate, ch, samples, ancillary = anc)),
        ("ext-pcm16", 1, true,
          MediaFunctions.encodeWavExtensible(rate, ch, samples, subFloat = false, ancillary = anc)),
        ("ext-float32", 3, true,
          MediaFunctions.encodeWavExtensible(rate, ch, samples, subFloat = true, ancillary = anc)))
      forms.foreach { case (name, tag, ext, bytes) =>
        val clip = MediaFunctions.decodeWav(bytes)
        assert(clip.formTag == tag && clip.extensible == ext, s"iter $i $name evidence")
        assert(clip.sampleRate == rate && clip.channels == ch, s"iter $i $name format")
        assert(clip.nFrames == frames, s"iter $i $name frames")
        // s/32768f is exact in float32 and round-half-even recovers it:
        // the SAME integers out of every container form, bit-for-bit
        assert(clip.samples.sameElements(samples), s"iter $i $name samples")
      }
    }
  }

  test("WAV forms: malformed float/extensible inputs fail closed with named errors") {
    val samples = Array[Short](1000, -2000, 3000, -4000)
    def err(blob: Array[Byte]): String =
      intercept[IllegalArgumentException](MediaFunctions.decodeWav(blob)).getMessage
    // non-finite float sample: overwrite the first data float with NaN
    val f32 = MediaFunctions.encodeWavFloat32(16000, 2, samples)
    def find(b: Array[Byte], tag: String): Int =
      (0 until b.length - 4).find(i =>
        (0 until 4).forall(k => b(i + k) == tag.charAt(k))).get
    val nan = f32.clone()
    val dataAt = find(nan, "data") + 8
    // IEEE-754 NaN, little-endian: 00 00 C0 7F
    nan(dataAt) = 0; nan(dataAt + 1) = 0
    nan(dataAt + 2) = 0xC0.toByte; nan(dataAt + 3) = 0x7F.toByte
    assert(err(nan).contains("non-finite float sample"))
    // EXTENSIBLE with a corrupted SubFormat GUID tail
    val ext = MediaFunctions.encodeWavExtensible(16000, 2, samples, subFloat = true)
    val fmtAt = find(ext, "fmt ")
    val badGuid = ext.clone()
    badGuid(fmtAt + 8 + 26 + 4) = 0x42 // a KSDATAFORMAT tail byte
    assert(err(badGuid).contains("KSDATAFORMAT"))
    // EXTENSIBLE claiming cbSize < 22
    val smallCb = ext.clone()
    smallCb(fmtAt + 8 + 16) = 8
    assert(err(smallCb).contains("cbSize"))
    // EXTENSIBLE wrapping an unsupported (compressed) subtype
    val badSub = ext.clone()
    badSub(fmtAt + 8 + 24) = 2 // SubFormat tag 3 -> 2 (ADPCM)
    assert(err(badSub).contains("format tag 2"))
    // wValidBitsPerSample above the container size
    val badValid = ext.clone()
    badValid(fmtAt + 8 + 18) = 33
    assert(err(badValid).contains("wValidBitsPerSample"))
  }

  test("WAV cross-validation: float32 output parses through javax.sound.sampled") {
    import javax.sound.sampled.{AudioSystem, AudioFormat}
    val rnd = new scala.util.Random(11223)
    var validated = 0
    (1 to 10).foreach { i =>
      val ch = rnd.nextInt(2) + 1
      val frames = rnd.nextInt(100) + 1
      val rate = Seq(16000, 44100, 48000)(rnd.nextInt(3))
      val samples = Array.fill(frames * ch)((rnd.nextInt(65536) - 32768).toShort)
      val bytes = MediaFunctions.encodeWavFloat32(rate, ch, samples,
        ancillary = i % 2 == 0)
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val f = ais.getFormat
        assert(f.getEncoding == AudioFormat.Encoding.PCM_FLOAT, s"iter $i encoding")
        assert(f.getSampleRate == rate.toFloat, s"iter $i rate")
        assert(f.getChannels == ch, s"iter $i channels")
        assert(f.getSampleSizeInBits == 32 && !f.isBigEndian, s"iter $i depth/endian")
        val raw = ais.readAllBytes()
        assert(raw.length == samples.length * 4, s"iter $i payload length")
        samples.indices.foreach { k =>
          val bits = (raw(4 * k) & 0xFF) | ((raw(4 * k + 1) & 0xFF) << 8) |
            ((raw(4 * k + 2) & 0xFF) << 16) | ((raw(4 * k + 3) & 0xFF) << 24)
          val back = math.rint(java.lang.Float.intBitsToFloat(bits).toDouble * 32768.0)
          assert(back == samples(k).toDouble, s"iter $i sample $k")
        }
        validated += 1
      } catch {
        // a JDK without float-WAV read support: cross-validation is
        // best-effort per the round-11 convention (our own round-trip
        // and fuzz contracts still cover the path)
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    info(s"float32 cross-validated on $validated/10 cases (JDK support permitting)")
  }

  test("audio fingerprint: true sign-of-delta envelope, container-invariant, total") {
    import MediaFunctions.audioFingerprint
    // hand-computed case: energies 1,9,4,4 (cyclic next 9,4,4,1) ->
    // bits (9>1)=1, (4>9)=0, (4>4)=0, (1<... 1>... wrap: 1>4)=0 -> lo=1
    assert(audioFingerprint(Array[Short](1, 3, -2, 2)) == (1L, 0L))
    // bit 32 boundary: 33 samples with a rise at index 32 sets hi bit 0
    val b33 = Array.tabulate[Short](34)(i => if (i <= 32) 0 else 100)
    val (_, hi33) = audioFingerprint(b33)
    assert((hi33 & 1L) == 1L, "delta at frame 32 must land in hi bit 0")
    // total on degenerate shapes the decoder can emit
    assert(audioFingerprint(Array.empty[Short]) == (0L, 0L))
    assert(audioFingerprint(Array[Short](5)) == (0L, 0L))
    // container-invariance via the real codec: identical PCM encoded
    // with different rate/channels/JUNK layouts fingerprints identically
    val samples = Array.tabulate[Short](64)(i => ((i * 37 % 256) * 257 - 32768).toShort)
    val fps = Seq(
      MediaFunctions.encodeWavPcm16(8000, 1, samples, ancillary = false),
      MediaFunctions.encodeWavPcm16(32000, 2, samples, ancillary = true),
      MediaFunctions.encodeWavExtensible(16000, 2, samples)
    ).map(b => audioFingerprint(MediaFunctions.decodeWav(b).samples))
    assert(fps.distinct.size == 1,
      s"fingerprint must see through container variation: $fps")
    // amplitude-sign invariance of the energy envelope: negated PCM has
    // identical s^2 envelope
    assert(audioFingerprint(samples.map(s => (-s).toShort)) ==
      audioFingerprint(samples))
  }

  test("mp4 frame fingerprint: hand-computed bits, container-invariant through the parse") {
    import graft.functions.Mp4
    // per-frame 16-bit aHash from the PARSED frames: bit b of frame f
    // set iff byte[b*len/16] >= frame integer mean — recompute one
    // clip by hand through the public core (mp4Fingerprints runs the
    // same arithmetic per row)
    def fpOf(frames: Array[Array[Byte]], width: Int = 16, timescale: Long = 1000L,
             delta: Long = 40L, free: Boolean = false, large: Boolean = false): (Long, Long) = {
      val v = Mp4.decodeMp4(Mp4.encodeMp4(width, 9, timescale, delta, frames,
        withFree = free, largesizeMdat = large))
      var lo = 0L; var hi = 0L
      (0 until math.min(v.nFrames, 4)).foreach { f =>
        val fr = v.frames(f)
        val mean = fr.map(_ & 0xFF).map(_.toLong).sum / fr.length
        (0 until 16).foreach { b =>
          if ((fr((b * fr.length) / 16) & 0xFF) >= mean) {
            val bit = f * 16 + b
            if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
          }
        }
      }
      (lo, hi)
    }
    // frame 0: bytes 0,255 -> mean 127 -> sampled (b*2/16): bytes 0(x8),255(x8)
    // -> bits 8..15 set -> lo low half = 0xFF00
    val f0 = Array[Byte](0, -1)
    val rest = Array.tabulate(3)(f => Array.tabulate[Byte](16)(i => (i * (f + 3)).toByte))
    val (lo, _) = fpOf(Array(f0) ++ rest)
    assert((lo & 0xFFFFL) == 0xFF00L, f"frame-0 signature 0x${lo & 0xFFFFL}%x != 0xff00")
    // container invariance: identical frame bytes under every encoder
    // knob (dims, timescale, frame rate, free box, largesize mdat)
    // fingerprint identically — the property the +4000001 clone shift
    // exercises at the gate
    val frames = Array.tabulate(4)(f => Array.tabulate[Byte](Seq(8, 16, 24, 16)(f))(i =>
      ((i * 41 + f * 17) % 256).toByte))
    val fps = Seq(
      fpOf(frames),
      fpOf(frames, width = 64, timescale = 2000L, delta = 120L),
      fpOf(frames, free = true),
      fpOf(frames, large = true))
    assert(fps.distinct.size == 1,
      s"mp4 fingerprint must see through container variation: $fps")
  }

  test("mjpeg clip fingerprint: decoded-pixel bits, codec+container invariant") {
    import graft.functions.{Jpeg, Mp4}
    // the decoded-domain video tier (round 14): tile bytes travel
    // text -> JPEG (DC-only exact subset) -> MP4 -> demux -> full T.81
    // decode -> per-frame aHash over decoded lumas; the DC-only subset
    // makes decoded tile == input byte, so bits are hand-computable
    def fpOf(bytes: Array[Byte], rst: Int, width: Int = 16,
             timescale: Long = 1000L, delta: Long = 40L,
             free: Boolean = false, large: Boolean = false): (Long, Long) = {
      val frames = Array.tabulate(4)(f =>
        Jpeg.encodeJpegGrayTiled(4, 4, bytes.slice(16 * f, 16 * (f + 1)),
          restartInterval = rst))
      graft.queries.Multimodal.mjpegClipFingerprint(
        Mp4.decodeMp4(Mp4.encodeMp4(width, 9, timescale, delta, frames,
          withFree = free, largesizeMdat = large)))
    }
    // frame 0: tiles 0..7 = 0, tiles 8..15 = 255 -> integer pixel mean
    // 127 -> exactly bits 8..15 of the frame-0 signature set
    val bytes = Array.tabulate[Byte](64) { i =>
      if (i < 8) 0 else if (i < 16) -1 else ((i * 41) % 256).toByte }
    val (lo, _) = fpOf(bytes, rst = 0)
    assert((lo & 0xFFFFL) == 0xFF00L,
      f"mjpeg frame-0 signature 0x${lo & 0xFFFFL}%x != 0xff00")
    // invariance across the JPEG restart-interval knob AND every
    // container knob — the property the gate's +4000001 clone shift
    // exercises (all of %2/%3/%4/%5 and the codec layout change)
    val fps = Seq(
      fpOf(bytes, 0),
      fpOf(bytes, 3, width = 64, timescale = 2000L, delta = 120L),
      fpOf(bytes, 1, free = true),
      fpOf(bytes, 4, large = true))
    assert(fps.distinct.size == 1,
      s"mjpeg fingerprint must see through codec+container variation: $fps")
  }
}
