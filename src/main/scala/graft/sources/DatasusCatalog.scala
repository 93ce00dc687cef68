package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side DATASUS catalog/link connector (SURVEY §2.1 S1-S4) with a
  * pluggable transport — the network protocol of the reference
  * (/root/reference/src/datasus/datasus.service.ts:98-213) expressed as
  * pure, testable pieces. This environment has zero egress, so the HTTP
  * transport is injected; everything else (predicate encoding, month
  * fan-out, response normalization) is deterministic logic.
  */
object DatasusCatalog {

  /** S1 predicate payload: the 6 multi-valued filters the catalog accepts
    * (reference SiasusArquivoDto, datasus-arquivo.type.ts:148-155). */
  final case class CatalogQuery(
      tipoArquivo: Seq[String], modalidade: Seq[String], fonte: Seq[String],
      ano: Seq[String], mes: Seq[String], uf: Seq[String])

  /** A catalog row (reference SiasusArquivoResponse, type.ts:157-163). */
  final case class CatalogItem(fonte: String, modalidade: String,
      arquivo: String, link: String, endereco: String)

  /** Transport seam: payload -> raw response body. Production would be an
    * HTTP POST; tests inject fakes. */
  type Transport = String => String

  /** P9: multi-valued form encoding — `key[]=v` per element, insertion
    * order preserved (reference datasus.service.ts:104-111). */
  def encodeForm(q: CatalogQuery): String = {
    def kv(k: String, vs: Seq[String]) = vs.map(v => s"$k[]=$v")
    (kv("tipo_arquivo", q.tipoArquivo) ++ kv("modalidade", q.modalidade) ++
      kv("fonte", q.fonte) ++ kv("ano", q.ano) ++ kv("mes", q.mes) ++
      kv("uf", q.uf)).mkString("&")
  }

  /** P8: walk the calendar back `n` months from (year, month) inclusive,
    * newest first, zero-padded — the getCompetence sequence
    * (datasus.service.ts:73-97). Pure; the reference's hard-coded override
    * at line 96 becomes an explicit caller choice, not a buried surprise. */
  def competences(year: Int, month: Int, n: Int = 12): Seq[(String, String)] = {
    Iterator.iterate((year, month)) { case (y, m) =>
      if (m == 1) (y - 1, 12) else (y, m - 1)
    }.take(n).map { case (y, m) => (y.toString, f"$m%02d") }.toSeq
  }

  /** S2: per-month fan-out — one catalog query per competência, results
    * flattened with null-safety (multReuestFtp, service.ts:139-158). */
  def monthlyFanOut(base: CatalogQuery, year: Int, month: Int, n: Int = 12)(
      fetch: CatalogQuery => Seq[CatalogItem]): Seq[CatalogItem] =
    competences(year, month, n).flatMap { case (y, m) =>
      Option(fetch(base.copy(ano = Seq(y), mes = Seq(m)))).getOrElse(Seq.empty)
    }

  /** P10 as a column expression: normalize the polymorphic download
    * response — JSON array of strings / `{"link": ...}` object / free text
    * with an embedded zip URL (service.ts:186-206) — into one URL column.
    * coalesce(get_json_object..., regexp_extract...) keeps it inside
    * codegen instead of a driver-side branch ladder. */
  def resolveLink(body: Column): Column = {
    val fromArray = get_json_object(body, "$[0]")
    val fromObject = get_json_object(body, "$.link")
    val fromRegex = regexp_extract(body, "https?:[^\"\\s\\]]+\\.zip", 0)
    val resolved = coalesce(fromArray, fromObject, when(fromRegex =!= "", fromRegex))
    // P3 validity guard (service.ts:252-254)
    when(resolved.startsWith("http"), resolved)
  }

  /** P2: null/blank guards on catalog items before link resolution
    * (service.ts:162-168). */
  def validItems(df: DataFrame): DataFrame =
    df.filter(trim(col("arquivo")) =!= "" && trim(col("endereco")) =!= "")

  /** Lift driver-side catalog results into a DataFrame for the relational
    * pipeline (predicates already pushed into the source query — the DSv2
    * SupportsPushDownFilters analog happens at the transport). */
  def toDF(spark: SparkSession, items: Seq[CatalogItem]): DataFrame = {
    import spark.implicits._
    items.toDF()
  }
}
