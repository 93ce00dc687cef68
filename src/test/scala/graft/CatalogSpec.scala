package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DatasusCatalog
import graft.sources.DatasusCatalog.{CatalogItem, CatalogQuery}
import graft.sources.Sinks

object CatalogSpec {
  // executor-visible collector (local[n] shares the JVM)
  val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** Driver-side connector logic (S1-S4 seams) and sink option plumbing. */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private val q = CatalogQuery(
    tipoArquivo = Seq("PA"), modalidade = Seq("1"), fonte = Seq("SIASUS"),
    ano = Seq("2025"), mes = Seq("01", "02"), uf = Seq("PE"))

  test("P9 form encoding: key[]=v pairs, multi-valued, ordered") {
    assert(DatasusCatalog.encodeForm(q) ==
      "tipo_arquivo[]=PA&modalidade[]=1&fonte[]=SIASUS&ano[]=2025&mes[]=01&mes[]=02&uf[]=PE")
  }

  test("P8 competences walk back across a year boundary, zero-padded, newest first") {
    val c = DatasusCatalog.competences(2025, 2, 4)
    assert(c == Seq(("2025", "02"), ("2025", "01"), ("2024", "12"), ("2024", "11")))
    assert(DatasusCatalog.competences(2025, 6).length == 12)
  }

  test("S2 monthly fan-out issues one query per month and flattens null-safely") {
    var seen = Vector.empty[(String, String)]
    val items = DatasusCatalog.monthlyFanOut(q, 2025, 2, 3) { cq =>
      seen :+= ((cq.ano.head, cq.mes.head))
      if (cq.mes.head == "01") null // null page, reference-observed
      else Seq(CatalogItem("SIASUS", "1", s"PA${cq.mes.head}", "l", "e"))
    }
    assert(seen == Vector(("2025", "02"), ("2025", "01"), ("2024", "12")))
    assert(items.map(_.arquivo) == Seq("PA02", "PA12"))
  }

  test("default workload mirrors ObjectDados: per-family cross product, 89 entries") {
    import graft.sources.DatasusVocabulary
    // family cardinalities from the reference vocabulary
    val expected = Map("SIASUS" -> 12, "CIH" -> 1, "CIHA" -> 1,
      "CNES" -> 13, "SIHSUS" -> 4, "SINAN" -> 58)
    val perFamily = DatasusVocabulary.DefaultWorkload.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perFamily == expected)
    assert(DatasusVocabulary.DefaultWorkload.size == 89)
    // every entry: modalidade 1, uf PE, fonte = the family's wire value
    // (including the reference's SINAN -> SIM_SISCOMEX mapping)
    DatasusVocabulary.DefaultWorkload.foreach { case (fam, fonte, _, mod, uf) =>
      assert(mod == "1" && uf == "PE")
      assert(fonte == DatasusVocabulary.Fontes.toMap.apply(fam))
    }
    assert(DatasusVocabulary.DefaultWorkload.filter(_._1 == "SINAN")
      .forall(_._2 == "SIM_SISCOMEX"))
    // dimension DataFrames agree with the constants
    assert(DatasusVocabulary.tipoDim(spark).count() == 89)
    assert(DatasusVocabulary.fonteDim(spark).count() == 14)
    assert(DatasusVocabulary.ufDim(spark).count() == 3)
    // the workload composes with the S2 monthly fan-out: each entry is a
    // well-formed CatalogQuery whose months the fan-out fills in
    val queries = DatasusVocabulary.defaultWorkloadQueries
    assert(queries.size == 89 && queries.forall(q => q.ano.isEmpty && q.mes.isEmpty))
    val months = scala.collection.mutable.ArrayBuffer.empty[String]
    val items = DatasusCatalog.monthlyFanOut(queries.head, 2025, 2, 2) { cq =>
      months += cq.mes.head
      Seq(CatalogItem(cq.fonte.head, cq.modalidade.head,
        s"${cq.tipoArquivo.head}${cq.mes.head}", "l", "e"))
    }
    assert(months.toSeq == Seq("02", "01") && items.map(_.arquivo) == Seq("AB02", "AB01"))
  }

  test("P2 valid-item guard drops blank arquivo/endereco rows") {
    val df = DatasusCatalog.toDF(spark, Seq(
      CatalogItem("f", "1", "A.zip", "l", "addr"),
      CatalogItem("f", "1", "  ", "l", "addr"),
      CatalogItem("f", "1", "B.zip", "l", " ")))
    assert(DatasusCatalog.validItems(df).count() == 1)
  }

  test("S10 jdbc options pin all-text DDL and batching") {
    val df = Tables.nation(spark, sf)
    val opts = Sinks.jdbcOptions(df)
    // STRING is the Spark-side type; the dialect maps it to the target's
    // text type (TEXT on PostgreSQL — the reference's DDL; CLOB on Derby)
    assert(opts("createTableColumnTypes") ==
      df.schema.fieldNames.map(f => s"$f STRING").mkString(", "))
    assert(opts("createTableColumnTypes").endsWith("n_regionkey STRING"))
    assert(opts("batchsize") == "10000")
    assert(Sinks.jdbcOptions(df, textType = "VARCHAR(4096)")("createTableColumnTypes")
      .endsWith("n_regionkey VARCHAR(4096)"))
  }

  test("retry policy mirrors the reference queue: 3 attempts, fixed backoff, then fail") {
    import graft.sources.HttpFetch
    // transient failure: attempts 1-2 throw, attempt 3 succeeds
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val policy = HttpFetch.RetryPolicy(attempts = 3, backoffMs = 5000,
      sleep = ms => sleeps += ms)
    val got = HttpFetch.withRetry(policy) { attempt =>
      if (attempt < 3) sys.error(s"flaky (attempt $attempt)") else "ok"
    }
    assert(got == "ok")
    assert(sleeps.toSeq == Seq(5000L, 5000L)) // fixed 5 s backoff between tries

    // permanent failure: exactly 3 attempts, then the last error propagates
    var tries = 0
    val e = intercept[RuntimeException] {
      HttpFetch.withRetry(policy) { _ => tries += 1; sys.error(s"down $tries") }
    }
    assert(tries == 3 && e.getMessage == "down 3")

    // end-to-end: fetch succeeds once the resource appears mid-retries
    val f = java.nio.file.Files.createTempDirectory("graft_retry").resolve("late.bin")
    val appearing = HttpFetch.RetryPolicy(attempts = 3, backoffMs = 1,
      sleep = _ => java.nio.file.Files.write(f, Array[Byte](1, 2, 3)))
    val bytes = HttpFetch.fetchBytesWithRetry(f.toUri.toString, policy = appearing)
    assert(bytes.toSeq == Seq[Byte](1, 2, 3))
  }

  test("minhash aggregator merge == signature of the union (sketch algebra)") {
    import org.apache.spark.sql.functions._
    import graft.functions.{MinHashAggregator, TextFunctions}
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("source"), TextFunctions.shingleSet(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val agg = new MinHashAggregator().toColumn
    val merged = docs
      .select(col("source"), TextFunctions.minhashSig(col("sh")).as("sig"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("gsig"))
      .collect().toMap
    // direct signature of each group's unioned shingle set
    val direct = docs.groupBy(col("source"))
      .agg(flatten(collect_list(col("sh"))).as("all"))
      .select(col("source"), TextFunctions.minhashSig(array_distinct(col("all"))).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (k, sig) => assert(sig == direct(k), s"group $k") }
    // estimator sanity: identical signatures estimate 1.0
    val s0 = merged.values.head
    assert(MinHashAggregator.estimate(s0, s0) == 1.0)
  }

  test("S11 escape hatch posts every partition's payload exactly once") {
    import org.apache.spark.sql.functions._
    val received = CatalogSpec.received
    received.clear()
    val df = Tables.nation(spark, sf).select(col("n_name"))
    graft.sources.Sinks.foreachPartitionPost(df) { payloads =>
      payloads.foreach(b => CatalogSpec.received.add(new String(b, "UTF-8")))
    }
    assert(received.size() == 25)
    assert(received.iterator().next().startsWith("{\"n_name\":"))
  }

  test("lake sink batch re-write of same partitions is idempotent") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_lake").toFile.getPath + "/lake"
    val df = Tables.orders(spark, sf)
      .withColumn("tipo_arquivo", lit("RD"))
      .withColumn("uf", substring(col("o_orderpriority"), 1, 1))
      .withColumn("competencia", lit("2501"))
    Sinks.writeLake(df, out)
    val n1 = spark.read.parquet(out).count()
    Sinks.writeLake(df, out) // re-load same competência: overwrite, not append
    assert(spark.read.parquet(out).count() == n1)
  }
}
