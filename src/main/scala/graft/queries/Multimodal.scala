package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MediaFunctions
import graft.functions.MediaFunctions.{DecodedMedia, MediaBlob}

/** Multimodal-column queries: binary blobs + typed batch decode
  * (SURVEY §7 north-star extensions). The "media" is synthesized
  * deterministically from `documents` (blob = md5 bytes of the text), so
  * the DuckDB oracle can recompute the same features through the md5 hex
  * string — the Spark side runs the genuine binary path:
  * binary column → Dataset[MediaBlob] → mapPartitions batch decode →
  * feature aggregation.
  */
object Multimodal {

  /** doc_id + 16-byte blob from md5(text) — the deterministic stand-in for
    * an image payload column. */
  private def media(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".as("docId"), lit("img").as("format"), unhex(md5($"text")).as("blob"))
      .as[MediaBlob]
  }

  /** Decode blobs in batches (stub codec), aggregate per-doc pixel stats.
    * Stats are ppm fixed-point computed in exact integer byte space (the
    * gate convention — no raw doubles): mean = 1e6*sum(b) DIV (n*255). */
  def qMmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir)
      .mapPartitions(rows => MediaFunctions.decodeBatches(rows))
      .map { d =>
        // invert the stub decode (p = b/255.0) back to exact byte values
        val bytes = d.pixels.map(p => math.round(p * 255).toLong)
        (d.docId, d.nBytes.toLong,
          bytes.sum * 1000000L / (bytes.length * 255L),
          bytes.max * 1000000L / 255L,
          bytes.min * 1000000L / 255L)
      }
      .toDF("doc_id", "n_bytes", "mean_px_ppm", "max_px_ppm", "min_px_ppm")
  }

  val qMmDecodeSql: String =
    """WITH px AS (
      |  SELECT doc_id, i,
      |    ('0x' || substr(md5(text), 2 * i + 1, 2))::INT AS b
      |  FROM documents, range(0, 16) r(i))
      |SELECT doc_id, 16::BIGINT AS n_bytes,
      |  (CAST(sum(b) AS BIGINT) * 1000000) // (16 * 255) AS mean_px_ppm,
      |  (CAST(max(b) AS BIGINT) * 1000000) // 255 AS max_px_ppm,
      |  (CAST(min(b) AS BIGINT) * 1000000) // 255 AS min_px_ppm
      |FROM px GROUP BY doc_id""".stripMargin

  /** Frame-sample the blob (every 4th byte), emit hex of the sampled
    * frames — exercises binary slicing through the typed API. */
  def qMmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir)
      .map(m => (m.docId, MediaFunctions.sampleFrames(m.blob, 4)))
      .toDF("doc_id", "frames")
      .select($"doc_id",
        lower(hex($"frames")).as("frames_hex"),
        octet_length($"frames").cast("long").as("n_frames"))
  }

  val qMmFramesSql: String =
    """SELECT doc_id,
      |  substr(md5(text), 1, 2) || substr(md5(text), 9, 2) ||
      |  substr(md5(text), 17, 2) || substr(md5(text), 25, 2) AS frames_hex,
      |  4::BIGINT AS n_frames
      |FROM documents""".stripMargin

  /** Resize (stub) to 4 features and bucket mean brightness — the
    * downstream-aggregation shape of a feature-extraction pipeline. */
  def qMmResizeAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir)
      .mapPartitions(rows => MediaFunctions.decodeBatches(rows))
      .map(d => MediaFunctions.resize(d, 4))
      .map(d => (d.docId, d.pixels.sum / d.pixels.length))
      .toDF("doc_id", "mean4")
      .select($"doc_id", floor($"mean4" * 10).cast("long").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
  }

  val qMmResizeAggSql: String =
    """WITH px AS (
      |  SELECT doc_id, ('0x' || substr(md5(text), 2 * i + 1, 2))::INT / 255.0 AS p
      |  FROM documents, range(0, 4) r(i)),
      |m AS (SELECT doc_id, sum(p) / 4 AS mean4 FROM px GROUP BY doc_id)
      |SELECT CAST(floor(mean4 * 10) AS BIGINT) AS bucket, count(*) AS n
      |FROM m GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_decode"     -> (qMmDecode _),
    "q_mm_frames"     -> (qMmFrames _),
    "q_mm_resize_agg" -> (qMmResizeAgg _),
  )

  def oracles: Map[String, String] = Map(
    "q_mm_decode"     -> qMmDecodeSql,
    "q_mm_frames"     -> qMmFramesSql,
    "q_mm_resize_agg" -> qMmResizeAggSql,
  )
}
