package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EtlFixtures

/** End-to-end pipeline: decode -> partitioned lake -> report, idempotent. */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pipeline loads the lake, reports totals, and re-runs idempotently") {
    val base = EtlFixtures.ensure(spark, sf)
    val lake = java.nio.file.Files.createTempDirectory("graft_pipe").toFile.getPath + "/lake"

    val r1 = Pipeline.run(spark, s"$base/RD*.dbc", lake)
    val s1 = r1.summary.collect()(0)
    val nOrders = Tables.orders(spark, sf).count()
    assert(s1.getAs[Long]("total_registros_inseridos") == nOrders)
    assert(s1.getAs[Long]("tabelas_distintas") == 1)
    assert(s1.getAs[Long]("arquivos_processados") == 5)

    val per = r1.perTable.collect()(0)
    assert(per.getAs[scala.collection.Seq[String]]("competencias_existentes").toSeq == Seq("2501"))

    // month re-load: same totals, no duplicate append
    val r2 = Pipeline.run(spark, s"$base/RD*.dbc", lake)
    assert(r2.summary.collect()(0).getAs[Long]("total_registros_inseridos") == nOrders)

    // lake reads partition-prune on uf
    val one = spark.read.parquet(lake).filter(col("uf") === "PE")
    assert(one.count() > 0 && one.count() < nOrders)
  }
}
