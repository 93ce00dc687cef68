package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EtlFixtures

/** DSv2 "dbc" format: discovery by short name, schema from the
  * uncompressed header, column pruning, and the _file metadata column. */
class DbcV2Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val base = EtlFixtures.ensure(spark, sf)

  test("format(\"dbc\") reads the same rows as the library reader") {
    val v2 = spark.read.format("dbc").load(s"$base/RD*.dbc")
    assert(v2.schema.fieldNames.toSeq == EtlFixtures.dbfCols)
    assert(v2.schema.fields.forall(_.dataType.typeName == "string"))
    val lib = graft.sources.DatasusEtl.readDbc(spark, s"$base/RD*.dbc")
    assert(v2.count() == lib.count())
    val a = v2.agg(sum(col("orderkey").cast("long"))).collect()(0).getLong(0)
    val b = lib.agg(sum(col("orderkey").cast("long"))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("column pruning reaches the scan (ReadSchema analog)") {
    val df = spark.read.format("dbc").load(s"$base/RD*.dbc").select("status")
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.toString.contains("DbcScan[status]")),
      s"pruned scan missing in:\n${df.queryExecution.executedPlan}")
    assert(df.distinct().count() > 0)
  }

  test("_file metadata column supports P7 partition derivation") {
    val df = spark.read.format("dbc").load(s"$base/RD*.dbc")
      .select(col("_file"), col("orderkey"))
      .withColumn("uf", regexp_extract(element_at(split(col("_file"), "/"), -1),
        "^([A-Z]+?)([A-Z]{2})(\\d{4})\\.", 2))
    val ufs = df.select("uf").distinct().collect().map(_.getString(0)).toSet
    assert(ufs == EtlFixtures.ufOf.values.toSet)
  }

  test("schema drift: columns resolve by name per file, missing columns null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toFile
    // first file defines the table schema (a, b); second file has the
    // columns REORDERED plus an extra; third lacks column b entirely
    val f1 = graft.sources.Dbc.fromDbf(graft.sources.Dbf.write(
      Seq("A", "B"), Seq(Seq("a1", "b1"))))
    val f2 = graft.sources.Dbc.fromDbf(graft.sources.Dbf.write(
      Seq("B", "X", "A"), Seq(Seq("b2", "x2", "a2"))))
    val f3 = graft.sources.Dbc.fromDbf(graft.sources.Dbf.write(
      Seq("A"), Seq(Seq("a3"))))
    java.nio.file.Files.write(new java.io.File(dir, "F1PE2501.dbc").toPath, f1)
    java.nio.file.Files.write(new java.io.File(dir, "F2PE2501.dbc").toPath, f2)
    java.nio.file.Files.write(new java.io.File(dir, "F3PE2501.dbc").toPath, f3)
    val got = spark.read.format("dbc").load(s"$dir/*.dbc")
      .select("a", "b").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("a1", Some("b1")), ("a2", Some("b2")), ("a3", None)))
  }

  test("permissive mode skips a corrupt file; strict mode fails") {
    val dir = java.nio.file.Files.createTempDirectory("graft_perm").toFile
    val good = graft.sources.Dbc.fromDbf(
      graft.sources.Dbf.write(Seq("A", "B"), Seq(Seq("1", "x"), Seq("2", "y"))))
    java.nio.file.Files.write(new java.io.File(dir, "OKPE2501.dbc").toPath, good)
    val corrupt = good.take(good.length - 8) // truncated compressed body
    java.nio.file.Files.write(new java.io.File(dir, "BADPE2501.dbc").toPath, corrupt)
    val strict = spark.read.format("dbc").load(s"$dir/*.dbc")
    assertThrows[org.apache.spark.SparkException](strict.count())
    val permissive = spark.read.format("dbc").option("mode", "permissive")
      .load(s"$dir/*.dbc")
    assert(permissive.count() == 2)
  }

  test("one partition per file (executor-grain parallelism)") {
    val df = spark.read.format("dbc").load(s"$base/RD*.dbc")
    assert(df.rdd.getNumPartitions == 5)
  }
}
