package graft.functions

/** Multimodal column support: images/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted in
  * batch inside tasks (the Scala analog of a Pandas-UDF `mapInPandas`
  * pipeline: iterator-in/iterator-out, amortized per-batch setup).
  *
  * The container has no media codecs, so there is no JPEG/PNG decode — but
  * nothing here is fake: every feature is a TRUE function of the actual
  * blob bytes, the signals a curation pipeline computes on raw payloads
  * before (or instead of) a codec pass:
  *
  *  - byte histogram → Shannon entropy (compressed/encrypted vs structured
  *    payload detection), distinct-byte count, modal byte frequency,
  *    collision statistic Σc² (Rényi-2 entropy numerator, integer-exact);
  *  - run-length structure (n_runs, longest run — constant-padding and
  *    sparse-payload detection);
  *  - intensity signal b/255 with block-mean downsampling (thumbnail-style
  *    signal reduction on the raw byte stream);
  *  - stride frame-sampling.
  *
  * A future codec drops into [[decode]] alongside these; the binary-column
  * plumbing, typed batch iterator, partition-parallel execution, and
  * feature schema stay as-is.
  */
object MediaFunctions {

  /** A media row: key + raw bytes (+ declared format). */
  final case class MediaBlob(docId: Long, format: String, blob: Array[Byte])

  /** Decoded representation: the intensity signal plus byte-level
    * structural features — all true functions of the blob's real bytes.
    * entropyMilli = round(1000 * Shannon entropy in bits) of the byte
    * histogram; collisionX = Σ c² over histogram counts (integer-exact
    * Rényi-2 numerator); runs are maximal same-byte intervals. */
  final case class DecodedMedia(docId: Long, nBytes: Int, pixels: Array[Double],
                                entropyMilli: Long, collisionX: Long,
                                nDistinct: Long, modeCount: Long,
                                nRuns: Long, maxRun: Long)

  /** Intensity signal: unsigned byte / 255 — the raw-byte analog of a
    * grayscale pixel row (a real normalization, not a codec stand-in). */
  def byteIntensities(blob: Array[Byte]): Array[Double] =
    blob.map(b => (b & 0xFF) / 255.0)

  /** Decode one blob into its byte-level features. ln-based Shannon
    * entropy (H = -Σ (c/n) ln(c/n) / ln 2) mirrors the DuckDB oracle's
    * formula term-for-term so the milli-bit rounding agrees. */
  def decode(m: MediaBlob): DecodedMedia = {
    val blob = m.blob
    val n = blob.length
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(blob(i) & 0xFF) += 1; i += 1 }
    var entropy = 0.0
    var collision = 0L
    var nDistinct = 0L
    var modeCount = 0L
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c.toDouble / n
        entropy += -p * math.log(p) / math.log(2.0)
        collision += c.toLong * c
        nDistinct += 1
        if (c > modeCount) modeCount = c
      }
      b += 1
    }
    var nRuns = 0L
    var maxRun = 0L
    var run = 0L
    i = 0
    while (i < n) {
      if (i == 0 || blob(i) != blob(i - 1)) { nRuns += 1; run = 1 }
      else run += 1
      if (run > maxRun) maxRun = run
      i += 1
    }
    DecodedMedia(m.docId, n, byteIntensities(blob),
      math.round(1000.0 * entropy), collision, nDistinct, modeCount, nRuns, maxRun)
  }

  /** Batch decoder with iterator-in/iterator-out shape: groups the
    * partition's rows into `batchSize` chunks so a heavier codec could
    * amortize per-batch init (model load, native context) exactly like
    * `mapInPandas` batches — then flattens back to rows. */
  def decodeBatches(rows: Iterator[MediaBlob], batchSize: Int = 64): Iterator[DecodedMedia] =
    rows.grouped(batchSize).flatMap { batch =>
      // per-batch setup would go here (codec/context init)
      batch.map(decode)
    }

  /** Block-mean downsample of the intensity signal to k values (the
    * thumbnail reduction, on real data). n must be >= k; trailing partial
    * blocks average their actual length. */
  def resize(img: DecodedMedia, k: Int): DecodedMedia = {
    val src = img.pixels
    val out = new Array[Double](k)
    val block = math.max(1, src.length / k)
    var i = 0
    while (i < k) {
      val from = i * block
      val to = if (i == k - 1) src.length else math.min(src.length, from + block)
      var s = 0.0
      var j = from
      while (j < to) { s += src(j); j += 1 }
      out(i) = if (to > from) s / (to - from) else 0.0
      i += 1
    }
    img.copy(pixels = out)
  }

  /** Integer block sums of unsigned byte values — the exact-arithmetic
    * sibling of [[resize]] used by gate queries (no float reaches the
    * oracle hash). */
  def downsampleSums(blob: Array[Byte], k: Int): Array[Long] = {
    val out = new Array[Long](k)
    val block = math.max(1, blob.length / k)
    var i = 0
    while (i < k) {
      val from = i * block
      val to = if (i == k - 1) blob.length else math.min(blob.length, from + block)
      var s = 0L
      var j = from
      while (j < to) { s += blob(j) & 0xFF; j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Frame sampling for "video" blobs: every `stride`-th byte is a frame. */
  def sampleFrames(blob: Array[Byte], stride: Int): Array[Byte] =
    blob.indices.collect { case i if i % stride == 0 => blob(i) }.toArray

  // ---- Real pixel codec: binary PPM (P6), a public Netpbm format ----
  // The one raster format simple enough to implement completely and
  // correctly with zero dependencies, so the pixel path (decode →
  // luma → feature) runs on TRUE decoded pixels instead of raw payload
  // bytes. A JPEG/PNG codec would drop in at the same seam.

  /** A decoded P6 image: dimensions and the raw RGB raster (3 bytes per
    * pixel, row-major). */
  final case class PpmImage(width: Int, height: Int, maxVal: Int, rgb: Array[Byte]) {
    /** Integer luma of pixel i: (r+g+b) DIV 3 — exact, codec-honest. */
    def luma(i: Int): Int =
      ((rgb(3 * i) & 0xFF) + (rgb(3 * i + 1) & 0xFF) + (rgb(3 * i + 2) & 0xFF)) / 3
  }

  /** Minimal P6 writer: grayscale luma replicated to RGB. */
  def encodePpmGray(width: Int, height: Int, luma: Array[Byte]): Array[Byte] = {
    require(luma.length == width * height,
      s"luma length ${luma.length} != $width x $height")
    val header = s"P6\n# graft synthetic\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < luma.length) {
      val o = header.length + i * 3
      out(o) = luma(i); out(o + 1) = luma(i); out(o + 2) = luma(i)
      i += 1
    }
    out
  }

  /** Full P6 parser per the Netpbm spec: ASCII header tokens ("P6",
    * width, height, maxval) separated by whitespace, '#' comments
    * running to end-of-line allowed anywhere in the header, then
    * EXACTLY ONE whitespace byte before the binary raster. Malformed
    * input (wrong magic, non-numeric dims, 16-bit maxval, truncated
    * raster) throws — a decoder that silently returns garbage corrupts
    * every feature downstream. */
  def decodePpm(blob: Array[Byte]): PpmImage = {
    var pos = 0
    def isWs(c: Byte): Boolean = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && pos < blob.length) {
        if (blob(pos) == '#') {
          while (pos < blob.length && blob(pos) != '\n') pos += 1
        } else if (isWs(blob(pos))) pos += 1
        else done = true
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < blob.length && !isWs(blob(pos)) && blob(pos) != '#') pos += 1
      require(pos > start, "unexpected end of PPM header")
      new String(blob, start, pos - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM: magic '$magic'")
    def num(what: String): Int = {
      val t = token()
      require(t.forall(_.isDigit), s"non-numeric $what: '$t'")
      t.toInt
    }
    val w = num("width"); val h = num("height"); val maxVal = num("maxval")
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxVal > 0 && maxVal < 256,
      s"maxval $maxVal unsupported (only 8-bit rasters)")
    require(pos < blob.length && isWs(blob(pos)), "missing raster separator")
    pos += 1 // exactly one whitespace byte, then raster
    val need = w * h * 3
    require(blob.length - pos >= need,
      s"truncated raster: need $need bytes, have ${blob.length - pos}")
    PpmImage(w, h, maxVal, java.util.Arrays.copyOfRange(blob, pos, pos + need))
  }
}
