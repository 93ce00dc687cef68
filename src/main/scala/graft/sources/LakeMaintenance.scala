package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake maintenance — the operations a partitioned parquet lake needs at
  * 100 TB that no query expresses:
  *
  *  - [[fileStats]]: per-partition file-count / byte-size inventory. The
  *    small-file problem (monthly incremental appends × thousands of
  *    partitions × tiny task outputs) degrades scan planning (one task
  *    per file) and metastore listing long before it shows in any single
  *    query; the inventory is how an operator sees it coming.
  *  - [[compact]]: rewrite the partitions whose file count exceeds a
  *    threshold, coalescing to a target file count, with dynamic
  *    partition overwrite so untouched partitions keep their files
  *    byte-identical. Rewrites ONLY the flagged partitions (filter
  *    pushdown prunes the scan to them) — at scale compaction is an
  *    incremental, per-partition operation, never a full-lake rewrite.
  *
  * Listing uses the driver-side Hadoop FS API — bounded by partition
  * count (the ~50k-partition lake of SCALING.md lists in seconds), never
  * by row count.
  */
object LakeMaintenance {

  final case class PartitionFiles(partition: String, nFiles: Long, bytes: Long)

  /** Per-leaf-partition (or table root, if unpartitioned) parquet file
    * inventory. */
  def fileStats(spark: SparkSession, dir: String): Seq[PartitionFiles] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new Path(dir)) // scheme-qualified, matches listStatus paths
    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).toSeq
      val subdirs = entries.filter(e => e.isDirectory &&
        !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
      if (subdirs.isEmpty) Seq(p) else subdirs.flatMap(d => leaves(d.getPath))
    }
    leaves(root).map { leaf =>
      val files = fs.listStatus(leaf).filter(f => f.isFile &&
        f.getPath.getName.endsWith(".parquet"))
      val rel = leaf.toString.stripPrefix(root.toString).stripPrefix("/")
      PartitionFiles(if (rel.isEmpty) "." else rel,
        files.length.toLong, files.map(_.getLen).sum)
    }.filter(_.nFiles > 0).sortBy(_.partition)
  }

  /** Compact every hive-layout partition whose file count exceeds
    * `maxFilesPerPart` down to ONE file each (repartitioning BY the
    * partition columns routes each partition value to a single task —
    * that is the only file count this shape can produce, so the API
    * promises exactly that), leaving other partitions untouched (dynamic
    * overwrite). Returns the partitions rewritten. Leaf path values are
    * hive-unescaped before building predicates; the null partition
    * (__HIVE_DEFAULT_PARTITION__) matches via isNull; non-hive leaf dirs
    * (no '=' segment) are skipped, never crashed on. */
  def compact(spark: SparkSession, dir: String, partitionCols: Seq[String],
              maxFilesPerPart: Int = 4): Seq[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val hiveLeaf = (p: PartitionFiles) =>
      p.partition != "." && p.partition.split("/").forall(_.contains("="))
    val flagged = fileStats(spark, dir)
      .filter(p => p.nFiles > maxFilesPerPart && hiveLeaf(p))
    if (flagged.isEmpty) return Seq.empty
    // hive-style leaf "col1=v1/col2=v2" -> per-partition predicate
    val preds = flagged.map { pf =>
      pf.partition.split("/").toSeq.map { seg =>
        val Array(k, v) = seg.split("=", 2)
        val value = ExternalCatalogUtils.unescapePathName(v)
        if (value == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) col(k).isNull
        else col(k) === lit(value)
      }.reduce(_ && _)
    }
    val toRewrite = preds.reduce(_ || _)
    spark.read.parquet(dir)
      .filter(toRewrite) // partition pruning: only flagged partitions scan
      .repartition(flagged.length, partitionCols.map(col): _*)
      // materialize before writing: Spark refuses to overwrite a path its
      // plan is reading, and correctness requires the read to finish
      // first anyway. Memory bound = the flagged partitions only — at
      // scale, compact in bounded partition batches.
      .localCheckpoint(true)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
    flagged.map(_.partition)
  }
}
