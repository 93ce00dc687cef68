package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink layer (SURVEY §2.1 S9/S10, §7 step 4).
  *
  * The reference loads into PostgreSQL one row at a time from a Python
  * loop with hand-rolled dynamic DDL (all-TEXT columns + SERIAL id,
  * /root/reference/ESTRUTURA_DADOS_PROCESSADOS.md:164-203); here both
  * sinks are declarative writes — the JDBC writer batches and creates the
  * table, and the lake sink gets idempotent month re-loads from dynamic
  * partition overwrite instead of the reference's duplicate-append.
  */
object Sinks {

  /** S10: JDBC append with the reference's all-TEXT dynamic DDL semantics.
    * `createTableColumnTypes` pins every column to TEXT like the
    * converter's CREATE TABLE; `batchsize` replaces the row-at-a-time
    * psycopg2 loop (OTIMIZACAO_API_PYTHON.md:156-167 measured 10-50x from
    * batching alone). No database ships in this container — the option
    * plumbing is unit-tested, the write call is the one-liner it should be. */
  def jdbcOptions(df: DataFrame, batchSize: Int = 10000): Map[String, String] = Map(
    "createTableColumnTypes" -> df.schema.fieldNames.map(f => s"$f TEXT").mkString(", "),
    "batchsize" -> batchSize.toString,
    "isolationLevel" -> "READ_COMMITTED")

  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties()): Unit = {
    val opts = jdbcOptions(df)
    df.write
      .mode("append")
      .option("createTableColumnTypes", opts("createTableColumnTypes"))
      .option("batchsize", opts("batchsize"))
      .jdbc(url, table, props)
  }

  /** S11 escape hatch: per-partition push to an external receiver (the
    * reference POSTs multipart bodies to its converter,
    * datasus.service.ts:307-388; in-engine decode makes that obsolete,
    * but systems still need "ship each partition's payload somewhere").
    * `send` runs on executors — it must be serializable and idempotent
    * (task retries re-send). */
  def foreachPartitionPost(df: DataFrame)(send: Iterator[Array[Byte]] => Unit): Unit = {
    val bin = df.schema.fields match {
      case Array(f) if f.dataType == org.apache.spark.sql.types.BinaryType => df
      case _ => df.toJSON.select(org.apache.spark.sql.functions.col("value")
          .cast(org.apache.spark.sql.types.BinaryType))
    }
    bin.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      send(rows.map(_.getAs[Array[Byte]](0)))
    }
  }

  /** Partitioned parquet lake with idempotent re-loads: dynamic partition
    * overwrite replaces exactly the (tipo, uf, competencia) partitions in
    * `df`, fixing the reference's duplicate-append gap
    * (datasus.service.ts:33 only *detects* duplicates). */
  def writeLake(df: DataFrame, outDir: String,
                partitionCols: Seq[String] = Seq("tipo_arquivo", "uf", "competencia")): Unit = {
    df.write
      .mode("overwrite")
      // per-write option, not a session-wide conf mutation
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
  }
}
