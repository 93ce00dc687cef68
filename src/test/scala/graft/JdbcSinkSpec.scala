package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** S10/S12 end-to-end against EMBEDDED DERBY (ships with Spark's jars —
  * no network, no server): create-if-absent all-text DDL, batched append,
  * read-back, the reference's duplicate-competência re-load guard, and the
  * DSv2 JDBC catalog surface (SHOW/SELECT through a registered catalog).
  *
  * Reference semantics mirrored: dynamic CREATE TABLE with every record
  * column as text (ESTRUTURA_DADOS_PROCESSADOS.md:164-203) and
  * `competencias_existentes` duplicate detection (datasus.service.ts:33)
  * — upgraded from detect-only to skip-already-loaded.
  */
class JdbcSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  /** Decoded-record-shaped frame: all-string payload + competência. */
  private def records(compet: String) = {
    import spark.implicits._
    Tables.orders(spark, sf)
      .limit(100)
      .select(
        $"o_orderkey".cast("string").as("orderkey"),
        $"o_orderstatus".as("status"),
        $"o_orderpriority".as("priority"),
        lit(compet).as("competencia"))
  }

  test("S10: create-if-absent all-text DDL + batched append + read-back") {
    val df = records("2501")
    Sinks.writeJdbc(df, url, "records", textType = "VARCHAR(4096)")
    val back = Sinks.readJdbc(spark, url, "records")
    assert(back.count() == 100)
    // all-text DDL: every column reads back as string
    assert(back.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    // values survive the round trip
    val keys = back.select("orderkey").collect().map(_.getString(0)).toSet
    val orig = df.select("orderkey").collect().map(_.getString(0)).toSet
    assert(keys == orig)
  }

  test("S10: duplicate-competência re-load guard skips loaded months") {
    // table now holds competência 2501 from the previous test
    assert(Sinks.existingCompetencias(spark, url, "records") == Set("2501"))

    // re-loading the same month appends nothing
    val (app1, skip1) = Sinks.appendNewCompetencias(
      records("2501"), url, "records", textType = "VARCHAR(4096)")
    assert(app1 == 0 && skip1 == 100)
    assert(Sinks.readJdbc(spark, url, "records").count() == 100)

    // a mixed batch loads only the new month
    val mixed = records("2501").union(records("2502"))
    val (app2, skip2) = Sinks.appendNewCompetencias(
      mixed, url, "records", textType = "VARCHAR(4096)")
    assert(app2 == 100 && skip2 == 100)
    assert(Sinks.readJdbc(spark, url, "records").count() == 200)
    assert(Sinks.existingCompetencias(spark, url, "records") == Set("2501", "2502"))
  }

  test("S10: existingCompetencias is empty for an absent table") {
    assert(Sinks.existingCompetencias(spark, url, "no_such_table").isEmpty)
  }

  test("S10: NULL-competência rows always append (cannot match a loaded month)") {
    import spark.implicits._
    // own table with the default STRING mapping (CLOB on Derby): Spark's
    // Derby dialect binds NULL string params as CLOB, which Derby rejects
    // against VARCHAR columns — the reference's all-text DDL is the shape
    // that takes NULLs
    val (a0, s0) = Sinks.appendNewCompetencias(records("2501"), url, "records_nullc")
    assert(a0 == 100 && s0 == 0)
    // a batch with a NULL month plus a duplicate month keeps only the
    // NULL row — the NOT-IN filter must not silently drop the NULL
    // (3-valued logic)
    val batch = records("2501").limit(1)
      .union(records("2501").limit(1)
        .withColumn("competencia", lit(null).cast("string"))
        .withColumn("orderkey", lit("null-row")))
    val (app, skip) = Sinks.appendNewCompetencias(batch, url, "records_nullc")
    assert(app == 1 && skip == 1, s"appended $app skipped $skip")
    val back = Sinks.readJdbc(spark, url, "records_nullc")
    assert(back.count() == 101)
    // no pushed-down equality: Derby cannot compare CLOB with CHAR, so
    // materialize the column and check in Spark
    val keys = back.select("orderkey").collect().map(_.getString(0))
    assert(keys.count(_ == "null-row") == 1)
  }

  test("epoch-guard upsert isolates writers: per-writer epochs and stages, per-writer replay guard") {
    // Round-10 hardening (round-9 ADVICE): two logical streams writing
    // the same (url, table) used to share one _STAGE table and key
    // epochs on batchId alone — writer B's batch 0 would be silently
    // skipped because writer A had already committed ITS batch 0, and a
    // concurrent stage write would be cross-overwritten. Now writer
    // identity enters the epoch key and the stage name.
    val df = records("2507").drop("competencia")
    val t = "EO_TWO_WRITERS"
    // same batchId from two distinct writers: BOTH must land
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)",
      writerId = "writer-A")
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)",
      writerId = "writer-B")
    assert(Sinks.readJdbc(spark, url, t).count() == 200,
      "second writer's batch 0 was skipped by the first writer's epoch")
    // replay of the SAME (batch, writer) must still be guarded
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)",
      writerId = "writer-A")
    assert(Sinks.readJdbc(spark, url, t).count() == 200,
      "replayed (batch 0, writer-A) double-inserted")
    // epoch bookkeeping: one row per (batch, writer)
    val epochs = Sinks.readJdbc(spark, url, s"${t}_EPOCHS")
    assert(epochs.count() == 2)
    assert(epochs.select("WRITER_ID").distinct().count() == 2)
    // stages are per-writer tables (distinct names, both present)
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.getMetaData.getTables(null, null, s"${t}_STAGE%", null)
      val stages = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toSet
      assert(stages.size == 2, s"expected two per-writer stages, got $stages")
    } finally c.close()
  }

  test("epoch-guard upsert: hashCode-colliding and overlong writer ids stay isolated (round-10 ADVICE)") {
    // "Aa" and "BB" are the classic String.hashCode collision (both 2112):
    // the pre-fix 31-bit-truncated stage suffix silently shared one
    // _STAGE table between them. The MD5-keyed suffix must keep them
    // apart — same batchId from both, BOTH must land, stages distinct.
    val df = records("2508").drop("competencia")
    val t = "EO_COLLIDING_WRITERS"
    assert("Aa".hashCode == "BB".hashCode, "test premise: hashCode collision")
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)", writerId = "Aa")
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)", writerId = "BB")
    assert(Sinks.readJdbc(spark, url, t).count() == 200,
      "hashCode-colliding writers shared a stage or an epoch key")
    // a checkpoint path far beyond the old VARCHAR(512) must neither fail
    // the epoch insert nor conflate with a different long path sharing a
    // 512-char prefix (the lenient-truncation hazard)
    val longA = "file:///ckpt/" + ("x" * 600) + "/A"
    val longB = "file:///ckpt/" + ("x" * 600) + "/B"
    Sinks.jdbcUpsertBatch(df, 1L, url, t, textType = "VARCHAR(4096)", writerId = longA)
    Sinks.jdbcUpsertBatch(df, 1L, url, t, textType = "VARCHAR(4096)", writerId = longB)
    assert(Sinks.readJdbc(spark, url, t).count() == 400,
      "long writer ids failed or conflated in the epoch key")
    // replay guard still holds per long writer
    Sinks.jdbcUpsertBatch(df, 1L, url, t, textType = "VARCHAR(4096)", writerId = longA)
    assert(Sinks.readJdbc(spark, url, t).count() == 400)
    // epochs key on the fixed-width digest: 4 rows, every key 32 hex chars
    val epochs = Sinks.readJdbc(spark, url, s"${t}_EPOCHS")
    assert(epochs.count() == 4)
    val keys = epochs.select("WRITER_ID").collect().map(_.getString(0))
    assert(keys.forall(k => k.length == 32 && k.matches("[0-9a-f]{32}")),
      s"epoch keys are not fixed-width digests: ${keys.toSeq}")
  }

  test("epoch-guard upsert: pre-digest (raw writerId) epoch rows still block replay (round-11 ADVICE)") {
    // rows written by the pre-r11 version store the RAW writerId in a
    // VARCHAR(512) _EPOCHS column; on upgrade the digest-keyed probe
    // must still see them as committed, or every legacy batch replays
    // exactly once. The legacy id here is deliberately LONGER than the
    // new 64-char column (the checkpoint-path case the round-12 review
    // caught: the first fix only matched raw ids <= 64 chars).
    val df = records("2509").drop("competencia")
    val t = "EO_MIGRATED_WRITERS"
    val legacyWriter = "file:///ckpt/" + ("legacy/" * 12) + "path" // 101 chars
    assert(legacyWriter.length > 64 && legacyWriter.length <= 512)
    // simulate the old deployment: the LEGACY DDL (VARCHAR(512)) with a
    // raw-keyed committed row for batch 0 — created BEFORE the upgraded
    // writer ever runs, exactly like a real upgrade
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try {
        st.executeUpdate(s"CREATE TABLE ${t}_EPOCHS (batch_id BIGINT, " +
          "writer_id VARCHAR(512) NOT NULL, PRIMARY KEY (batch_id, writer_id))")
        st.executeUpdate(
          s"INSERT INTO ${t}_EPOCHS VALUES (0, '$legacyWriter')")
      } finally st.close()
    } finally c.close()
    // the legacy target table holds batch 0's rows already
    Sinks.writeJdbc(df, url, t, textType = "VARCHAR(4096)")
    // the upgraded writer replays batch 0: the raw-form row must block it
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)",
      writerId = legacyWriter)
    assert(Sinks.readJdbc(spark, url, t).count() == 100,
      "legacy raw-keyed epoch row did not block the replay: one-time duplicate")
    // a NEW batch from the same writer commits under the digest key
    Sinks.jdbcUpsertBatch(df, 1L, url, t, textType = "VARCHAR(4096)",
      writerId = legacyWriter)
    assert(Sinks.readJdbc(spark, url, t).count() == 200)
    // and its replay is also blocked (digest arm)
    Sinks.jdbcUpsertBatch(df, 1L, url, t, textType = "VARCHAR(4096)",
      writerId = legacyWriter)
    assert(Sinks.readJdbc(spark, url, t).count() == 200)
    val keys = Sinks.readJdbc(spark, url, s"${t}_EPOCHS")
      .select("WRITER_ID").collect().map(_.getString(0)).sorted
    assert(keys.exists(_ == legacyWriter) && keys.exists(_.matches("[0-9a-f]{32}")),
      s"expected one legacy raw key and one digest key: ${keys.toSeq}")
  }

  test("epoch-guard upsert: a 65..512-char writer id works against a FRESH epochs table") {
    // the raw probe arm must never break commits on new deployments: a
    // long-but-legacy-legal writer id probes a VARCHAR(64) table (the
    // bind may be rejected by strict databases) and the guard must treat
    // that as no-match, not as a failed batch
    val df = records("2510").drop("competencia")
    val t = "EO_FRESH_LONG_WRITER"
    val longWriter = "file:///ckpt/" + ("x" * 80) + "/A" // 95 chars
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)",
      writerId = longWriter)
    assert(Sinks.readJdbc(spark, url, t).count() == 100)
    Sinks.jdbcUpsertBatch(df, 0L, url, t, textType = "VARCHAR(4096)",
      writerId = longWriter)
    assert(Sinks.readJdbc(spark, url, t).count() == 100, "replay not blocked")
  }

  test("missing-relation detection matches exact SQLStates, not class 42") {
    def sql(state: String) = new java.sql.SQLException("boom", state)
    // true missing-relation states, directly and nested in a cause chain
    assert(Sinks.isMissingRelation(sql("42X05")))
    assert(Sinks.isMissingRelation(sql("42P01")))
    assert(Sinks.isMissingRelation(new RuntimeException(new RuntimeException(sql("42S02")))))
    // class-42 neighbors that must PROPAGATE: syntax error (Derby 42X01),
    // insufficient privilege (PostgreSQL 42501) — swallowing them would
    // silently disable the duplicate-load guard
    assert(!Sinks.isMissingRelation(sql("42X01")))
    assert(!Sinks.isMissingRelation(sql("42501")))
    assert(!Sinks.isMissingRelation(sql(null)))
    assert(!Sinks.isMissingRelation(new RuntimeException("no sql in chain")))
  }

  test("E1-to-JDBC: decode pipeline loads per-tipo tables with the re-load guard") {
    val fixtures = graft.queries.EtlFixtures.ensure(spark, sf)
    val url2 = s"jdbc:derby:$dbDir/db2;create=true"
    val first = graft.Pipeline.runToJdbc(spark, s"$fixtures/RD*.dbc", url2,
      textType = "VARCHAR(4096)")
    assert(first.keySet == Set("RD"))
    val (app1, skip1) = first("RD")
    assert(app1 > 0 && skip1 == 0)
    // same month again: everything skips
    val second = graft.Pipeline.runToJdbc(spark, s"$fixtures/RD*.dbc", url2,
      textType = "VARCHAR(4096)")
    val (app2, skip2) = second("RD")
    assert(app2 == 0 && skip2 == app1)
    assert(Sinks.readJdbc(spark, url2, "datasus_rd").count() == app1)
  }

  test("S12: DSv2 JDBC catalog lists and queries the loaded table") {
    spark.conf.set("spark.sql.catalog.graftdb",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graftdb.url", url)
    spark.conf.set("spark.sql.catalog.graftdb.driver",
      "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    // Derby stores the unquoted identifier upper-cased: RECORDS
    val tables = spark.sql("SHOW TABLES IN graftdb.APP")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables.contains("RECORDS"))
    val n = spark.sql("SELECT count(*) AS n FROM graftdb.APP.RECORDS")
      .collect()(0).getLong(0)
    assert(n == 200)
    // predicate pushdown reaches the JDBC scan through the catalog
    val one = spark.sql(
      "SELECT count(*) FROM graftdb.APP.RECORDS WHERE competencia = '2502'")
      .collect()(0).getLong(0)
    assert(one == 100)
  }
}
