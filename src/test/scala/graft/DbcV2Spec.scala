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
    // the fleet-wide knob every Spark file source honors must work too:
    // an operator running parquet/orc with ignoreCorruptFiles=true gets
    // the same posture here without a source-specific option
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.format("dbc").load(s"$dir/*.dbc").count() == 2)
    finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assertThrows[org.apache.spark.SparkException](
      spark.read.format("dbc").load(s"$dir/*.dbc").count())
  }

  test("permissive mode truncates MID-file corruption to the rows already decoded") {
    // a large file whose compressed tail is cut: the streaming decoder
    // surfaces the failure from the row iterator (lazy next()), not at
    // construction — permissive mode must emit the prefix decoded so far
    // instead of failing the task
    val dir = java.nio.file.Files.createTempDirectory("graft_midperm").toFile
    val rows = (1 to 2000).map(i => Seq(f"$i%06d", s"v${i % 10}"))
    val full = graft.sources.Dbc.fromDbf(
      graft.sources.Dbf.write(Seq("A", "B"), rows))
    val corrupt = full.take(full.length - 6)
    java.nio.file.Files.write(new java.io.File(dir, "MIDPE2501.dbc").toPath, corrupt)
    val strict = spark.read.format("dbc").load(s"$dir/*.dbc")
    assertThrows[org.apache.spark.SparkException](strict.count())
    val n = spark.read.format("dbc").option("mode", "permissive")
      .load(s"$dir/*.dbc").count()
    assert(n > 0 && n < 2000, s"expected a decoded prefix, got $n rows")
  }

  test("one partition per file (executor-grain parallelism)") {
    val df = spark.read.format("dbc").load(s"$base/RD*.dbc")
    assert(df.rdd.getNumPartitions == 5)
  }
}
