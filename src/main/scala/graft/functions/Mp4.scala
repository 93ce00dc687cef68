package graft.functions

/** VIDEO-container support for the decode seam: a real ISO Base Media
  * File Format parser (ISO/IEC 14496-12, the public MP4 container
  * spec), zero dependencies. The brief's "video as an opaque binary
  * column with typed metadata" becomes literal here: the payload stays
  * opaque (we do not decode H.264 — that is the clearly-marked stub
  * tier), but the CONTAINER is parsed for real, the way a 100 TB video
  * curation pipeline actually touches most of its bytes — box walk,
  * track metadata, and frame extraction through the sample tables:
  *
  *  - box walk: 32-bit size + fourcc, `size == 1` → 64-bit largesize,
  *    `size == 0` → box extends to end of file (both classic MP4
  *    parser trip-ups), unknown boxes skipped, truncation fails closed;
  *  - moov/trak/mdia/minf/stbl recursion; mvhd + mdhd timescales, tkhd
  *    track dimensions (16.16 fixed point), stts total duration,
  *    stsz per-sample sizes, stsc sample-to-chunk runs, stco chunk
  *    offsets (multiple chunks: real muxers interleave audio/video so
  *    a track's samples land in MANY chunks at arbitrary offsets);
  *  - frame extraction: sample payloads sliced out of mdat at
  *    stco[chunk] + intra-chunk Σ stsz offsets, every extent
  *    bounds-checked against mdat — a wrong size table cannot read
  *    another box's bytes. Sizes and offsets stay Long end-to-end: a
  *    32-bit table value never wraps through Int before its check.
  *
  * The encoder writes the same subset (single video track, 1..n
  * chunks), so gate queries can round-trip documents through a genuine
  * container: dims/timescale/duration/frame boundaries reach the
  * output only via the PARSED sample tables. Multi-chunk encodes lay
  * chunks in REVERSE order inside mdat, so a decoder that ignores
  * stco and just reads sequentially produces wrong frames.
  */
object Mp4 {

  /** Parsed video metadata + extracted (still-encoded) frame payloads.
    * `chunkCount` is the stco entry count — surfaced so gates can put
    * the PARSED chunk structure on the hash path, not just the
    * reassembled samples. */
  final case class Mp4Video(width: Int, height: Int,
                            timescale: Long, durationTicks: Long,
                            frames: Array[Array[Byte]],
                            chunkCount: Int) {
    def nFrames: Int = frames.length
  }

  // ---- encoder ----

  /** Minimal ISO BMFF writer for the decoder's subset: ftyp + moov
    * (mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl) + mdat, one video track,
    * 1..n chunks, per-frame sizes in stsz, uniform frame duration in
    * stts. `withFree` inserts a skippable `free` box before mdat;
    * `largesizeMdat` writes mdat with the size==1 + 64-bit largesize
    * form — both put the box walk's edge paths under gates, not just
    * the happy path. `samplesPerChunk` (null → one chunk) splits the
    * samples into that many chunks; runs of equal counts are compressed
    * into stsc entries the way real muxers write them, and the chunks
    * are laid in REVERSE order inside mdat so per-chunk stco offsets
    * are load-bearing, not decorative. */
  def encodeMp4(width: Int, height: Int, timescale: Long, frameDelta: Long,
                frames: Array[Array[Byte]], withFree: Boolean = false,
                largesizeMdat: Boolean = false,
                samplesPerChunk: Array[Int] = null): Array[Byte] = {
    require(width > 0 && height > 0 && width < (1 << 16) && height < (1 << 16),
      s"bad dimensions ${width}x$height")
    require(timescale > 0 && frameDelta > 0, "bad timing")
    require(frames.nonEmpty, "no frames")
    val spc: Array[Int] =
      if (samplesPerChunk == null) Array(frames.length) else samplesPerChunk
    require(spc.forall(_ > 0) && spc.sum == frames.length,
      s"samplesPerChunk ${spc.mkString(",")} must be positive and sum to ${frames.length}")
    val nChunks = spc.length
    // stsc runs: consecutive chunks with the same samples-per-chunk
    // collapse into one (first_chunk, samples_per_chunk) entry
    val stscRuns = {
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var c = 0
      while (c < nChunks) {
        if (runs.isEmpty || runs.last._2 != spc(c)) runs += ((c + 1, spc(c)))
        c += 1
      }
      runs.toArray
    }
    // chunk sample bases and payload lengths (frames stay in sample order
    // WITHIN a chunk; chunks themselves are laid in reverse file order)
    val chunkBase = spc.scanLeft(0)(_ + _)
    val chunkLen = Array.tabulate(nChunks) { c =>
      (chunkBase(c) until chunkBase(c + 1)).iterator.map(frames(_).length.toLong).sum
    }
    // mvhd/mdhd/tkhd v0 carry 32-bit timescale/duration fields; a value
    // that silently truncated through be32 would decode as a different
    // (wrong) timing instead of failing here
    require(timescale <= 0xFFFFFFFFL, s"timescale $timescale exceeds 32-bit v0 field")
    require(frameDelta * frames.length <= 0xFFFFFFFFL,
      s"duration ${frameDelta * frames.length} exceeds 32-bit v0 field")
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def be32(v: Long): Unit = { be16(((v >> 16) & 0xFFFF).toInt); be16((v & 0xFFFF).toInt) }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xFFFFFFFFL) }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    /** A box whose payload is built by `body`; size back-patched. */
    def box(typ: String)(body: => Unit): Unit = {
      val sizeAt = out.size()
      be32(0); fourcc(typ)
      body
      val bytes = out.toByteArray // back-patch: rebuild prefix is wasteful but
      val size = bytes.length - sizeAt // files here are tiny and test-grade
      bytes(sizeAt) = ((size >> 24) & 0xFF).toByte
      bytes(sizeAt + 1) = ((size >> 16) & 0xFF).toByte
      bytes(sizeAt + 2) = ((size >> 8) & 0xFF).toByte
      bytes(sizeAt + 3) = (size & 0xFF).toByte
      out.reset(); out.write(bytes, 0, bytes.length)
    }
    val duration = frameDelta * frames.length
    var stcoAt = -1
    box("ftyp") { fourcc("isom"); be32(0x200); fourcc("isom"); fourcc("mp41") }
    box("moov") {
      box("mvhd") {
        be32(0) // version 0 + flags
        be32(0); be32(0) // creation / modification time
        be32(timescale); be32(duration)
        be32(0x00010000L); be16(0x0100); be16(0) // rate, volume, reserved
        be32(0); be32(0) // reserved
        Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(be32)
        (0 until 6).foreach(_ => be32(0)) // pre_defined
        be32(2) // next_track_ID
      }
      box("trak") {
        box("tkhd") {
          be32(7) // version 0, flags: enabled | in-movie | in-preview
          be32(0); be32(0); be32(1); be32(0) // times, track_ID, reserved
          be32(duration)
          be32(0); be32(0) // reserved
          be16(0); be16(0); be16(0); be16(0) // layer, alt_group, volume, reserved
          Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(be32)
          be32(width.toLong << 16); be32(height.toLong << 16) // 16.16 fixed
        }
        box("mdia") {
          box("mdhd") {
            be32(0); be32(0); be32(0)
            be32(timescale); be32(duration)
            be16(0x55C4); be16(0) // language "und", pre_defined
          }
          box("hdlr") {
            be32(0); be32(0); fourcc("vide")
            be32(0); be32(0); be32(0)
            out.write("graft".getBytes("US-ASCII")); out.write(0)
          }
          box("minf") {
            box("stbl") {
              box("stsd") {
                be32(0); be32(1) // one sample entry: an opaque payload format
                box("gfrm") { (0 until 2).foreach(_ => be32(0)) } // reserved(6)+index(2)
              }
              box("stts") { be32(0); be32(1); be32(frames.length.toLong); be32(frameDelta) }
              box("stsc") {
                be32(0); be32(stscRuns.length.toLong)
                stscRuns.foreach { case (first, n) =>
                  be32(first.toLong); be32(n.toLong); be32(1)
                }
              }
              box("stsz") {
                be32(0); be32(0) // sample_size 0 => per-sample table
                be32(frames.length.toLong)
                frames.foreach(f => be32(f.length.toLong))
              }
              box("stco") {
                be32(0); be32(nChunks.toLong)
                // chunk offsets into mdat; patched below once the moov
                // size is final. The POSITION is recorded rather than
                // searched for — a sentinel search could collide with a
                // duration or timescale field that legitimately holds
                // the same bytes. (box() back-patches sizes in place
                // without shifting content, so the offset recorded here
                // stays valid.)
                stcoAt = out.size()
                (0 until nChunks).foreach(_ => be32(0))
              }
            }
          }
        }
      }
    }
    if (withFree) box("free") { fourcc("pad!"); out.write(0) } // odd payload
    val mdatHeader = if (largesizeMdat) 16 else 8
    val mdatPayloadAt = out.size() + mdatHeader
    // lay chunks in REVERSE order inside mdat (chunk n-1 first): the
    // decoder must honor stco per-chunk offsets to recover sample order
    val layOrder = (nChunks - 1) to 0 by -1
    val chunkOffsets = new Array[Long](nChunks)
    var at = mdatPayloadAt.toLong
    layOrder.foreach { c => chunkOffsets(c) = at; at += chunkLen(c) }
    // patch the stco chunk offset placeholders now that they are known
    val assembled = out.toByteArray
    require(stcoAt >= 0, "stco placeholder position lost")
    (0 until nChunks).foreach { c =>
      val off = chunkOffsets(c)
      val p = stcoAt + 4 * c
      assembled(p) = ((off >> 24) & 0xFF).toByte
      assembled(p + 1) = ((off >> 16) & 0xFF).toByte
      assembled(p + 2) = ((off >> 8) & 0xFF).toByte
      assembled(p + 3) = (off & 0xFF).toByte
    }
    out.reset(); out.write(assembled, 0, assembled.length)
    val payloadLen = frames.iterator.map(_.length).sum
    if (largesizeMdat) {
      be32(1); fourcc("mdat"); be64(mdatHeader.toLong + payloadLen)
    } else {
      be32((mdatHeader + payloadLen).toLong); fourcc("mdat")
    }
    layOrder.foreach { c =>
      (chunkBase(c) until chunkBase(c + 1)).foreach(f =>
        out.write(frames(f), 0, frames(f).length))
    }
    out.toByteArray
  }

  // ---- decoder ----

  /** Full container parse for the supported subset, with the codec
    * family's checked-failure discipline: truncated boxes, size < 8
    * without the largesize/to-EOF forms, 64-bit sizes past the buffer,
    * missing required boxes, non-v0 full boxes, inconsistent
    * sample-to-chunk tables, and sample extents escaping the mdat box
    * all throw IllegalArgumentException by name. Unknown boxes at any
    * level are skipped (that is what makes a box format
    * forward-compatible). A residual out-of-bounds read — table
    * layouts are attacker-controlled, so belt and braces — is
    * normalized onto the same contract rather than escaping as a raw
    * ArrayIndexOutOfBoundsException that would kill the task instead
    * of landing the row in quarantine. */
  def decodeMp4(blob: Array[Byte]): Mp4Video =
    try decodeMp40(blob)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(s"mp4 read out of bounds: ${e.getMessage}", e)
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(s"mp4 negative allocation: ${e.getMessage}", e)
    }

  private def decodeMp40(blob: Array[Byte]): Mp4Video = {
    def be16(o: Int): Int = ((blob(o) & 0xFF) << 8) | (blob(o + 1) & 0xFF)
    def be32(o: Int): Long = (be16(o).toLong << 16) | be16(o + 2)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def fourcc(o: Int): String = new String(blob, o, 4, "US-ASCII")

    /** Walk boxes in [from, to); call visit(type, payloadFrom, payloadTo). */
    def walk(from: Int, to: Int)(visit: (String, Int, Int) => Unit): Unit = {
      var pos = from
      while (pos < to) {
        require(to - pos >= 8, s"truncated box header at $pos")
        val size32 = be32(pos)
        val typ = fourcc(pos + 4)
        var header = 8
        val size: Long =
          if (size32 == 1) { // 64-bit largesize
            require(to - pos >= 16, s"truncated largesize box '$typ'")
            header = 16
            be64(pos + 8)
          } else if (size32 == 0) (to - pos).toLong // box runs to end
          else size32
        require(size >= header, s"box '$typ' size $size < header")
        require(size <= to - pos, s"box '$typ' size $size overruns container")
        visit(typ, pos + header, pos + size.toInt)
        pos += size.toInt
      }
    }
    def fullBoxV0(typ: String, from: Int, to: Int): Int = {
      // bounds BEFORE the version read: an empty full box (size == header)
      // must fail by name, not read the neighbor box's first byte
      require(to - from >= 4, s"$typ full-box header truncated")
      require((blob(from) & 0xFF) == 0, s"$typ version ${blob(from) & 0xFF} unsupported")
      from + 4 // skip version + flags
    }

    var width = -1; var height = -1
    var timescale = -1L; var durationTicks = -1L
    var sttsTotal = -1L
    var sizes: Array[Long] = null // 32-bit table values: Long, never wrapped through Int
    var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
    var chunkOffsets: Array[Long] = null
    var mdatFrom = -1; var mdatTo = -1

    walk(0, blob.length) {
      case ("moov", mFrom, mTo) =>
        walk(mFrom, mTo) {
          case ("trak", tFrom, tTo) =>
            walk(tFrom, tTo) {
              case ("tkhd", from, to) =>
                val p = fullBoxV0("tkhd", from, to)
                // v0 layout: times(8) id(4) res(4) dur(4) res(8)
                // layer/alt/vol/res(8) matrix(36) then width/height 16.16
                require(to - p >= 80, "tkhd box truncated")
                val dimAt = p + 8 + 4 + 4 + 4 + 8 + 8 + 36
                width = (be32(dimAt) >> 16).toInt
                height = (be32(dimAt + 4) >> 16).toInt
              case ("mdia", dFrom, dTo) =>
                walk(dFrom, dTo) {
                  case ("mdhd", from, to) =>
                    val p = fullBoxV0("mdhd", from, to)
                    require(to - p >= 16, "mdhd box truncated")
                    timescale = be32(p + 8)
                    durationTicks = be32(p + 12)
                  case ("minf", fFrom, fTo) =>
                    walk(fFrom, fTo) {
                      case ("stbl", sFrom, sTo) =>
                        walk(sFrom, sTo) {
                          case ("stts", from, to) =>
                            val p = fullBoxV0("stts", from, to)
                            // entry counts are attacker-controlled: first
                            // the COUNT WORD must fit the box, then the
                            // claimed table must fit it, before any read
                            require(to - p >= 4, "stts entry count truncated")
                            val n = be32(p)
                            require(to - p - 4 >= 8L * n, s"stts table truncated ($n entries)")
                            var total = 0L
                            var i = 0
                            while (i < n) {
                              total += be32(p + 4 + 8 * i) * be32(p + 8 + 8 * i)
                              i += 1
                            }
                            sttsTotal = total
                          case ("stsz", from, to) =>
                            val p = fullBoxV0("stsz", from, to)
                            require(to - p >= 8, "stsz header truncated")
                            require(be32(p) == 0,
                              "constant sample_size outside subset (per-sample table only)")
                            val n = be32(p + 4)
                            require(to - p - 8 >= 4L * n, s"stsz table truncated ($n entries)")
                            sizes = Array.tabulate(n.toInt) { i =>
                              be32(p + 8 + 4 * i)
                            }
                          case ("stsc", from, to) =>
                            val p = fullBoxV0("stsc", from, to)
                            require(to - p >= 4, "stsc entry count truncated")
                            val n = be32(p)
                            require(n >= 1, "stsc empty (no sample-to-chunk runs)")
                            require(to - p - 4 >= 12L * n, s"stsc table truncated ($n entries)")
                            stscRuns = Array.tabulate(n.toInt) { i =>
                              (be32(p + 4 + 12 * i), be32(p + 8 + 12 * i))
                            }
                            require(stscRuns.head._1 == 1L,
                              s"stsc first run starts at chunk ${stscRuns.head._1}, not 1")
                            stscRuns.foreach { case (_, k) =>
                              require(k >= 1, "stsc run with zero samples per chunk")
                            }
                            stscRuns.sliding(2).foreach {
                              case Array((a, _), (b, _)) =>
                                require(b > a, s"stsc first_chunk not increasing ($a -> $b)")
                              case _ => ()
                            }
                          case ("stco", from, to) =>
                            val p = fullBoxV0("stco", from, to)
                            require(to - p >= 4, "stco entry count truncated")
                            val n = be32(p)
                            require(n >= 1, "stco empty (no chunks)")
                            require(to - p - 4 >= 4L * n, s"stco table truncated ($n entries)")
                            chunkOffsets = Array.tabulate(n.toInt) { i =>
                              be32(p + 4 + 4 * i)
                            }
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case ("mdat", from, to) =>
        require(mdatFrom < 0, "duplicate mdat outside subset")
        mdatFrom = from; mdatTo = to
      case _ => () // ftyp, free, and any unknown top-level box: skipped
    }

    require(width > 0 && height > 0, "missing or empty tkhd")
    require(timescale > 0, "missing mdhd")
    require(sttsTotal >= 0, "missing stts")
    require(sizes != null, "missing stsz")
    require(stscRuns != null, "missing stsc")
    require(chunkOffsets != null, "missing stco")
    require(mdatFrom >= 0, "missing mdat")
    // expand stsc runs over the stco chunk list: run i covers chunks
    // [first_i, first_{i+1}) with a fixed samples-per-chunk; the mapped
    // sample total must equal the stsz count — an inconsistent pair of
    // tables fails by name instead of mis-slicing
    val nChunks = chunkOffsets.length
    require(stscRuns.last._1 <= nChunks,
      s"stsc run starts at chunk ${stscRuns.last._1} but stco has $nChunks chunks")
    val perChunk = new Array[Long](nChunks)
    var r = 0
    var c = 0
    while (c < nChunks) {
      while (r + 1 < stscRuns.length && stscRuns(r + 1)._1 <= c + 1) r += 1
      perChunk(c) = stscRuns(r)._2
      c += 1
    }
    val mapped = perChunk.sum
    require(mapped == sizes.length,
      s"stsc maps $mapped samples but stsz has ${sizes.length}")
    // slice frames out of mdat chunk by chunk; samples are consecutive
    // WITHIN a chunk starting at that chunk's stco offset, and every
    // extent is bounds-checked against the mdat box, so a corrupt size
    // or offset table cannot read another box's bytes
    val frames = new Array[Array[Byte]](sizes.length)
    var s = 0
    c = 0
    while (c < nChunks) {
      var off = chunkOffsets(c)
      var k = perChunk(c)
      while (k > 0) {
        val sz = sizes(s)
        require(off >= mdatFrom && off + sz <= mdatTo,
          s"sample extent [$off, ${off + sz}) escapes mdat [$mdatFrom, $mdatTo)")
        frames(s) = java.util.Arrays.copyOfRange(blob, off.toInt, (off + sz).toInt)
        off += sz
        s += 1
        k -= 1
      }
      c += 1
    }
    Mp4Video(width, height, timescale, durationTicks, frames, nChunks)
  }
}
