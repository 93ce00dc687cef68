package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.DatasusCatalog.CatalogQuery

/** The catalog's filter-dimension vocabulary and the default workload the
  * reference ships as its entry point (reference
  * /root/reference/src/datasus/datasus-arquivo.type.ts:1-146 for the
  * dimension sets, datasus-object-processor.ts:13-50 for ObjectDados).
  *
  * Modeled as plain constants + dimension DataFrames: the vocabulary is
  * static reference data (dozens of rows), so it broadcasts for free in
  * any join against catalog/lake tables, and the default workload is its
  * deterministic cross product — no driver-side state.
  */
object DatasusVocabulary {

  /** tipo_arquivo vocabulary per source system (type.ts:1-119). */
  val Siasus: Seq[String] =
    Seq("AB", "ABO", "ACF", "AD", "AM", "AN", "AQ", "AR", "ATD", "PA", "PS", "SAD")
  val Cih: Seq[String] = Seq("CR")
  val Ciha: Seq[String] = Seq("CIHA")
  val Cnes: Seq[String] =
    Seq("DC", "EE", "EF", "EP", "EQ", "GM", "HB", "IN", "LT", "PF", "RC", "SR", "ST")
  val Sihsus: Seq[String] = Seq("ER", "RD", "RJ", "SP")
  val Sinan: Seq[String] = Seq(
    "ACBI", "ACGR", "AIDA", "AIDC", "ANIM", "ANTR", "BOTU", "CANC", "CHAG",
    "CHIK", "COLE", "COQU", "DCRJ", "DENG", "DERM", "DIFT", "ESPO", "ESQU",
    "EXAN", "FMAC", "FTIF", "HANS", "HANT", "HEPA", "HIVA", "HIVC", "HIVE",
    "HIVG", "IEXO", "INFL", "LEIV", "LEPT", "LERD", "LTAN", "MALA", "MENI",
    "MENT", "NTRA", "PAIR", "PEST", "PFAN", "PNEU", "RAIV", "ROTA", "SDTA",
    "SIFA", "SIFC", "SIFG", "SRC", "TETA", "TETN", "TOXC", "TOXG", "TRAC",
    "TUBE", "VARC", "VIOL", "ZIKA")

  /** fonte key -> wire value (type.ts:121-137). The reference maps the
    * SINAN key to "SIM_SISCOMEX" and SINASC to "SISCOMEX" — reproduced as
    * observed behavior, since that is what its default workload sends. */
  val Fontes: Seq[(String, String)] = Seq(
    "CIH" -> "CIH", "CIHA" -> "CIHA", "CNES" -> "CNES", "PCE" -> "PCE",
    "PO" -> "PO", "RESP" -> "RESP", "SIASUS" -> "SIASUS",
    "SIHSUS" -> "SIHSUS", "SIM" -> "SIM", "SINAN" -> "SIM_SISCOMEX",
    "SINASC" -> "SISCOMEX", "SISCOLO" -> "SISCOLO", "SISMAMA" -> "SISMAMA",
    "SISPRENATAL" -> "SISPRENATAL")

  /** uf vocabulary (type.ts UFType). */
  val Ufs: Seq[String] = Seq("AL", "PE", "PB")

  /** Workload families in the reference's source order
    * (object-processor.ts:13-50): each family contributes its full tipo
    * set under one fonte. */
  val Families: Seq[(String, Seq[String])] = Seq(
    "SIASUS" -> Siasus, "CIH" -> Cih, "CIHA" -> Ciha,
    "CNES" -> Cnes, "SIHSUS" -> Sihsus, "SINAN" -> Sinan)

  private val fonteValue: Map[String, String] = Fontes.toMap

  /** The reference's default entry workload (ObjectDados): for every
    * family, one entry per tipo_arquivo with modalidade "1", the family's
    * fonte wire value, and uf PE — 89 combinations
    * (12 + 1 + 1 + 13 + 4 + 58). */
  val DefaultWorkload: Seq[(String, String, String, String, String)] =
    Families.flatMap { case (fam, tipos) =>
      tipos.map(t => (fam, fonteValue(fam), t, "1", "PE"))
    }

  /** Dimension DataFrames — static reference relations, broadcast-sized. */
  def tipoDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Families.flatMap { case (fam, tipos) => tipos.map(t => (fam, t)) }
      .toDF("sistema", "tipo_arquivo")
  }

  def fonteDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Fontes.toDF("fonte_key", "fonte")
  }

  def ufDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Ufs.toDF("uf")
  }

  /** The default workload as a DataFrame (the relational twin of
    * ObjectDados; q_catalog_workload gates it cross-engine). */
  def defaultWorkload(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DefaultWorkload.toDF("sistema", "fonte", "tipo_arquivo", "modalidade", "uf")
  }

  /** The same workload as catalog queries, ready for the S2 monthly
    * fan-out (each entry crossed with a competência sequence). */
  def defaultWorkloadQueries: Seq[CatalogQuery] =
    DefaultWorkload.map { case (_, fonte, tipo, modalidade, uf) =>
      CatalogQuery(Seq(tipo), Seq(modalidade), Seq(fonte), Nil, Nil, Seq(uf))
    }
}
