package graft.functions

/** Multimodal column support: images/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted in
  * batch inside tasks (the Scala analog of a Pandas-UDF `mapInPandas`
  * pipeline: iterator-in/iterator-out, amortized per-batch setup).
  *
  * The container has no media codecs, so `decodePixels` is a STUB — a
  * deterministic fake (byte value / 255) standing in for a real JPEG/PNG
  * decode. Everything around it — the binary column plumbing, the typed
  * batch iterator shape, partition-parallel execution, the feature schema —
  * is real and tested; swapping in an actual codec changes only the stub
  * body.
  */
object MediaFunctions {

  /** A media row: key + raw bytes (+ declared format). */
  final case class MediaBlob(docId: Long, format: String, blob: Array[Byte])

  /** Decoded representation: fixed-shape "pixel" features. */
  final case class DecodedMedia(docId: Long, nBytes: Int, pixels: Array[Double])

  /** STUB decode: pixel j = unsigned byte j / 255.0. A real implementation
    * would hand `blob` to a codec; the signature and batching stay as-is. */
  def decodePixels(blob: Array[Byte]): Array[Double] =
    blob.map(b => (b & 0xFF) / 255.0)

  /** Batch decoder with iterator-in/iterator-out shape: groups the
    * partition's rows into `batchSize` chunks so a real codec could
    * amortize per-batch init (model load, native context) exactly like
    * `mapInPandas` batches — then flattens back to rows. */
  def decodeBatches(rows: Iterator[MediaBlob], batchSize: Int = 64): Iterator[DecodedMedia] =
    rows.grouped(batchSize).flatMap { batch =>
      // per-batch setup would go here (codec/context init)
      batch.map(m => DecodedMedia(m.docId, m.blob.length, decodePixels(m.blob)))
    }

  /** STUB resize: keep the first k features (a real impl would interpolate). */
  def resize(img: DecodedMedia, k: Int): DecodedMedia =
    img.copy(pixels = img.pixels.take(k))

  /** Frame sampling for "video" blobs: every `stride`-th byte is a frame. */
  def sampleFrames(blob: Array[Byte], stride: Int): Array[Byte] =
    blob.indices.collect { case i if i % stride == 0 => blob(i) }.toArray
}
