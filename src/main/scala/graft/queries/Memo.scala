package graft.queries

import org.apache.spark.sql.DataFrame

/** Eager materialization for the session-memoized relations (shingles,
  * pair graph, rarity ranks, bigrams, clusters, pagerank, TokenPairs).
  *
  * Default: `localCheckpoint(true)` — executor-local blocks, the right
  * lifecycle for local mode and bench sweeps, but NOT fault-tolerant on
  * a real cluster: a lost executor invalidates the truncated lineage and
  * every consumer of the cached relation fails with it.
  *
  * Production knob: call `spark.sparkContext.setCheckpointDir(...)` and
  * set `spark.graft.reliableCheckpoint=true` in the session conf to
  * switch every memoized relation to a reliable (DFS-backed) checkpoint
  * — same eager semantics, survives executor loss. One switch, one
  * place, so the bench path and the cluster path cannot drift.
  */
object Memo {
  def materialize(df: DataFrame): DataFrame = {
    val reliable = df.sparkSession.conf
      .getOption("spark.graft.reliableCheckpoint").contains("true")
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
  }

  private final class Lazy(compute: () => DataFrame) {
    lazy val df: DataFrame = compute()
  }
  private val tableCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), Lazy]()

  private val dfCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, String), Lazy]()

  /** Session-memoized MATERIALIZED relation — the in-memory form of the
    * write-once static-index contract (round-15 optimization): a
    * batch-trained artifact that more than one gate probes (the top-500
    * LM, the verbatim df index, the anomaly moments, the IVF inverted
    * lists) is built ONCE per (session, corpus dir) and served
    * checkpointed thereafter, exactly like the module-local LazyDf
    * caches (Dedup shingles/pairs, TrainingData bigrams, TextAnalysis
    * vocab) this generalizes. Production rationale: a stream-static
    * join re-executes an unmaterialized static plan every micro-batch
    * (the r14 12.46x bug class) and re-training the index per probing
    * query is the batch-side form of the same waste. Same LazyDf
    * discipline: computeIfAbsent installs only the thunk; the Spark job
    * runs outside the map's bin lock. */
  def sessionCached(s: org.apache.spark.sql.SparkSession, dir: String,
      tag: String)(build: => DataFrame): DataFrame = {
    dfCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    dfCache.computeIfAbsent((s, dir, tag), _ =>
      new Lazy(() => materialize(build))).df
  }

  /** WRITE-ONCE bucketed lake table, built at most once per (session,
    * corpus dir) and served from the catalog thereafter — the persistence
    * contract behind the incremental dedup band index and the incremental
    * novelty shingle history. The bucketed+sorted layout on the join keys
    * means a probe join shuffles ONLY the arriving slice; the historical
    * side is never re-hashed and never re-shuffled.
    *
    * The table name carries the corpus-dir hash AND a per-session
    * discriminator, so two sessions sharing one warehouse/catalog can
    * never drop-and-rewrite a table out from under each other's cached
    * lazily-executed DataFrames (round-5 advice). Stale siblings — same
    * base and dir hash, a session suffix no LIVE session in this JVM
    * owns (a dead session's, or a previous JVM's, whose in-memory
    * catalogs and cached plans died with it) — are swept before the
    * write, so re-runs stay idempotent and the warehouse does not
    * accumulate garbage. */
  def persistedBucketedTable(s: org.apache.spark.sql.SparkSession,
      base: String, dir: String, buckets: Int, keys: Seq[String])
      (build: => DataFrame): DataFrame = {
    tableCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val prefix = s"${base}_$dirHash"
    val pid = ProcessHandle.current().pid()
    val table = f"${prefix}_p${pid}_${System.identityHashCode(s)}%08x"
    tableCache.computeIfAbsent((s, table), _ => new Lazy(() => {
      // sweep stale siblings: catalog entries and warehouse locations for
      // this (base, dir) not owned by a live session. Ownership is
      // per-PROCESS (the pid is baked into the name): a sibling from
      // another JVM is swept only when that JVM is provably dead — two
      // live JVMs sharing one warehouse (a test suite next to a verify
      // run) must never delete each other's tables out from under a
      // lazily-executed reader.
      val live = {
        import scala.jdk.CollectionConverters._
        tableCache.keySet.asScala.map(_._2).toSet + table
      }
      val pidRe = "_p(\\d+)_".r
      def sweepable(n: String): Boolean = pidRe.findFirstMatchIn(n) match {
        case Some(m) =>
          val p = m.group(1).toLong
          // our own dead session, or a JVM that no longer exists; when
          // liveness can't be determined, keep the table (conservative)
          p == pid || ProcessHandle.of(p).map[Boolean](_ => false).orElse(true)
        case None => true // pre-pid naming: stale by construction
      }
      val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.listStatus(wh)
        .filter(st => st.getPath.getName.startsWith(prefix) &&
                      !live.contains(st.getPath.getName) &&
                      sweepable(st.getPath.getName))
        .foreach { st =>
          s.sql(s"DROP TABLE IF EXISTS `${st.getPath.getName}`")
          fs.delete(st.getPath, true)
        }
      // our own location may survive from a previous JVM while the
      // in-memory catalog starts empty — clear both, then write
      s.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(wh, table)
      if (fs.exists(loc)) fs.delete(loc, true)
      build.write
        .mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet")
        .saveAsTable(table)
      s.table(table)
    })).df
  }
}
