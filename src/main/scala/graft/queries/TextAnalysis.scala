package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents` (SURVEY §7 north-star
  * extensions): quality scoring, language-ID heuristic, token counting,
  * content fingerprinting. All are per-row column expressions (map-side,
  * no shuffle except the final aggregation), so they scale linearly.
  */
object TextAnalysis {

  /** Per-doc quality metrics: token counts, type-token ratio, punctuation
    * ratio, and a bounded composite quality score. Ratios are exact
    * integer ppm via BIGINT floor division (gate convention — no raw
    * doubles): ttr_ppm = 1e6*nd/nt; quality = min(1, nt/50)*ttr =
    * min(nt,50)*nd / (50*nt), so quality_ppm = 1e6*min(nt,50)*nd DIV (50*nt). */
  def qTextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        length($"text").cast("long").as("len_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long").as("n_punct"))
      .withColumn("ttr_ppm",
        when($"n_tokens" > 0, expr("(n_distinct * 1000000L) DIV n_tokens")))
      .withColumn("punct_ratio_ppm",
        when($"len_chars" > 0, expr("(n_punct * 1000000L) DIV len_chars")))
      .withColumn("quality_ppm",
        when($"n_tokens" > 0,
          expr("(least(n_tokens, 50L) * n_distinct * 1000000L) DIV (50L * n_tokens)"))
          .otherwise(0L))
  }

  val qTextStatsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, length(text) AS len_chars,
      |    list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t,
      |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
      |  FROM documents)
      |SELECT doc_id, len_chars, len(t)::BIGINT AS n_tokens,
      |  len(list_distinct(t))::BIGINT AS n_distinct, n_punct,
      |  (len(list_distinct(t)) * 1000000) // nullif(len(t), 0) AS ttr_ppm,
      |  (n_punct * 1000000) // nullif(len_chars, 0) AS punct_ratio_ppm,
      |  coalesce((least(len(t), 50) * len(list_distinct(t)) * 1000000) // nullif(50 * len(t), 0), 0) AS quality_ppm
      |FROM toks""".stripMargin

  /** Stopword-marker language-ID heuristic, cross-tabbed against the actual
    * `lang` label: predicted = argmax of per-language marker hit counts
    * (fixed preference order en > es > de > fr on ties, 'und' when no hits). */
  def qTextLangid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    def score(words: String*) = size(filter(toks, x => x.isin(words.map(lit): _*)))
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        score("the", "a").as("s_en"), score("el", "la", "de").as("s_es"),
        score("der", "die", "und").as("s_de"), score("le", "les", "et").as("s_fr"))
      .withColumn("predicted",
        when($"s_en" > 0 && $"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr", "en")
          .when($"s_es" > 0 && $"s_es" >= $"s_de" && $"s_es" >= $"s_fr", "es")
          .when($"s_de" > 0 && $"s_de" >= $"s_fr", "de")
          .when($"s_fr" > 0, "fr")
          .otherwise("und"))
      .groupBy($"predicted", $"lang")
      .agg(count(lit(1)).as("n"))
  }

  val qTextLangidSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(t, x -> x IN ('the', 'a'))) AS s_en,
      |    len(list_filter(t, x -> x IN ('el', 'la', 'de'))) AS s_es,
      |    len(list_filter(t, x -> x IN ('der', 'die', 'und'))) AS s_de,
      |    len(list_filter(t, x -> x IN ('le', 'les', 'et'))) AS s_fr
      |  FROM toks)
      |SELECT CASE
      |    WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |    WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
      |    WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
      |    WHEN s_fr > 0 THEN 'fr'
      |    ELSE 'und' END AS predicted,
      |  lang, count(*) AS n
      |FROM scores GROUP BY 1, 2""".stripMargin

  /** Token counting per source: whitespace tokens, regex (BPE-ish
    * word/number/symbol) tokens, and a subword estimate (ceil(len/4)). */
  def qTextTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val reToks = regexp_extract_all($"text", lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    val subwords = aggregate(toks, lit(0L),
      (acc, t) => acc + ceil(length(t) / 4.0).cast("long"))
    Tables.documents(s, dir)
      .select($"source", size(toks).as("nt"), size(reToks).as("nr"), subwords.as("nsw"))
      .groupBy($"source")
      .agg(sum($"nt").as("sum_ws_tokens"),
           sum($"nr").as("sum_re_tokens"),
           sum($"nsw").as("sum_subwords"),
           count(lit(1)).as("n_docs"))
      .withColumn("avg_tokens_ppm", expr("(sum_ws_tokens * 1000000L) DIV n_docs"))
      .drop("n_docs")
  }

  val qTextTokensSql: String =
    """WITH toks AS (
      |  SELECT source,
      |    list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t,
      |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]') AS r
      |  FROM documents)
      |SELECT source,
      |  CAST(sum(len(t)) AS BIGINT) AS sum_ws_tokens,
      |  CAST(sum(len(r)) AS BIGINT) AS sum_re_tokens,
      |  CAST(sum(list_sum(list_transform(t, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))) AS BIGINT) AS sum_subwords,
      |  (CAST(sum(len(t)) AS BIGINT) * 1000000) // count(*) AS avg_tokens_ppm
      |FROM toks GROUP BY source""".stripMargin

  /** Order-insensitive content fingerprint per doc (md5 of sorted distinct
    * token bag) + distinct-token count — catches shuffled/duplicated-token
    * rewrites that exact hashing misses. */
  def qTextFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    Tables.documents(s, dir)
      .select($"doc_id", bagFingerprint(toks).as("fingerprint"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
  }

  val qTextFingerprintSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents)
      |SELECT doc_id, md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint,
      |  len(list_distinct(t))::BIGINT AS n_distinct
      |FROM toks""".stripMargin

  /** TF-IDF: per-doc top-3 terms. Selection order is integer-only
    * (tf desc, df asc, token asc) so row membership is exact across
    * engines; the tfidf score is emitted as micro-unit fixed-point
    * (round(x*1e6) BIGINT), absorbing the cross-engine ln() ulp. */
  def qTextTfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    // corpus size as a broadcast 1-row aggregate: the documents scan is
    // paid once in the plan, not again in a separate count() action
    val nDocs = docs.agg(count(lit(1)).as("n_docs_total"))
    val tf = docs
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"tok".asc)
    tf.join(df, "tok")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .crossJoin(broadcast(nDocs))
      .select($"doc_id", $"tok", $"tf", $"df", $"rnk",
        round($"tf" * log($"n_docs_total".cast("double") / $"df") * 1e6)
          .cast("long").as("tfidf_u"))
  }

  val qTextTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |ranked AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |    CAST(row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS BIGINT) AS rnk,
      |    CAST(round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1e6) AS BIGINT) AS tfidf_u
      |  FROM tf JOIN df USING (tok) CROSS JOIN n)
      |SELECT doc_id, tok, tf, df, rnk, tfidf_u FROM ranked WHERE rnk <= 3""".stripMargin

  /** Token co-occurrence: top-20 distinct-token pairs by the number of
    * docs containing both (integer-deterministic ordering). The phrase/
    * collocation-mining primitive. Derives from the SHARED support-pruned
    * pair pipeline ([[TokenPairs.top20]]) — one pair join feeds both this
    * and qTextPmi; see TokenPairs for the exactness proof of the prune. */
  def qTextCooc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TokenPairs.top20(s, dir)
      .select($"tok_a", $"tok_b", $"n_ab".as("n_docs"))
  }

  val qTextCoocSql: String =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents)
      |SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
      |FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |GROUP BY 1, 2 ORDER BY n_docs DESC, tok_a ASC, tok_b ASC LIMIT 20""".stripMargin

  /** KMV (k-minimum-values) DISTINCT-COUNT SKETCH, k = 256 — the
    * mergeable approximate-distinct sketch (Bar-Yossef et al. 2002; the
    * theta-sketch core) with a property HLL lacks here: it is fully
    * DETERMINISTIC given the shared 60-bit hash, so the sketch estimate
    * itself sits under the exact cross-engine hash gate, next to the
    * true distinct count and its error. Estimator: keep the k smallest
    * distinct hash values; est = (k−1)·2⁶⁰ / h_k (exact n when fewer
    * than k hashes exist). The division runs in float64 on BOTH engines
    * (identical IEEE operands → identical result) because the integer
    * form overflows 2⁶³; the OUTPUT is still BIGINT. Scale shape:
    * per-key k-smallest is the WindowGroupLimit bounded-heap plan (no
    * full sort), and the sketch merges by union-then-trim — the
    * distributed-combine property that makes KMV a sketch at all. */
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val K = 256
    // domain = distinct 3-gram shingles per source (thousands per source
    // even at sf0.01, so the estimator branch genuinely fires; the
    // per-source token vocabulary is ~30 — it would always take the
    // exact branch and prove nothing). Reads the memoized shingle
    // relation (Dedup.docShinglesSrc) — shingle once, fan out.
    // round-16 NOTE (VERDICT-r15 #6): consolidating the two branches onto
    // one Memo.materialize'd distinct (source, sng) relation was tried
    // and MEASURED SLOWER at sf0.1 (1.282 -> 1.504 s p50; the blocking
    // localCheckpoint of the distinct relation costs more than the
    // second pass over the already-memoized docShinglesSrc input) — so
    // the two-branch form stays; see OPTIMIZATION_r16.md.
    def sng = graft.queries.Dedup.docShinglesSrc(s, dir)
      .select($"source", explode($"sh").as("sng"))
    val hs = sng
      .groupBy($"source")
      .agg(countDistinct($"sng").as("n_exact"),
           countDistinct(hash60($"sng")).as("n_h"))
    val kth = sng
      .select($"source", hash60($"sng").as("h")).distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h".asc)).cast("long"))
      .filter($"rk" <= K)
      .groupBy($"source").agg(max($"h").as("h_k"), count(lit(1)).as("k_eff"))
    hs.join(kth, "source")
      .withColumn("est",
        when($"n_h" < K, $"n_h")
          .otherwise(round(lit((K - 1).toDouble) * lit(1.152921504606846976e18) /
            $"h_k".cast("double")).cast("long")))
      .withColumn("err_ppm",
        expr("(abs(est - n_exact) * 1000000L) DIV n_exact"))
      .select($"source", $"n_exact", $"n_h", $"h_k", $"est", $"err_ppm")
  }

  val qKmvDistinctSql: String =
    """WITH toks AS (
      |  SELECT source, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |dt AS (
      |  SELECT DISTINCT source, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sng
      |  FROM toks WHERE len(t) >= 3),
      |hashed AS (
      |  SELECT source, sng, ('0x' || substr(md5(sng), 18, 15))::BIGINT AS h FROM dt),
      |agg AS (
      |  SELECT source, count(DISTINCT sng) AS n_exact, count(DISTINCT h) AS n_h
      |  FROM hashed GROUP BY source),
      |dh AS (SELECT DISTINCT source, h FROM hashed),
      |ranked AS (
      |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rk
      |  FROM dh),
      |kth AS (
      |  SELECT source, CAST(max(h) AS BIGINT) AS h_k FROM ranked
      |  WHERE rk <= 256 GROUP BY source)
      |SELECT a.source, a.n_exact, a.n_h, k.h_k,
      |  CAST(CASE WHEN a.n_h < 256 THEN a.n_h
      |    ELSE CAST(round(255.0 * 1152921504606846976.0 / CAST(k.h_k AS DOUBLE)) AS BIGINT)
      |    END AS BIGINT) AS est,
      |  (abs(CAST(CASE WHEN a.n_h < 256 THEN a.n_h
      |    ELSE CAST(round(255.0 * 1152921504606846976.0 / CAST(k.h_k AS DOUBLE)) AS BIGINT)
      |    END AS BIGINT) - a.n_exact) * 1000000) // a.n_exact AS err_ppm
      |FROM agg a JOIN kth k USING (source)""".stripMargin

  /** TWO-LEVEL KMV MERGE — the distributed-sketch rollup itself, run and
    * gated in-engine: per-source k-minima (the partial sketches a
    * 1000-executor job would emit) union and re-trim to the global
    * k-minima, whose estimate is compared — inside the same gated row —
    * to the estimate computed directly from the global hash set. The
    * union-then-trim law says they are IDENTICAL, and the hash gate
    * locks that as data, not doctrine. Level 2 processes only
    * |sources|·k rows regardless of corpus size — the whole point of
    * sketch-based distinct counting at 100 TB. */
  def qKmvMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val K = 256
    // round-16 NOTE (VERDICT-r15 #6): consolidating direct / partials /
    // exact onto one Memo.materialize'd distinct (source, h) relation was
    // tried and MEASURED SLOWER at sf0.1 (1.227 -> 1.327 s p50; the
    // blocking localCheckpoint outweighs the saved passes over the
    // already-memoized docShinglesSrc input) — the three-branch form
    // stays; see OPTIMIZATION_r16.md.
    val hashes = graft.queries.Dedup.docShinglesSrc(s, dir)
      .select($"source", explode($"sh").as("sng"))
      .select($"source", hash60($"sng").as("h"))
    // exact branch mirrors qKmvDistinct: with fewer than K distinct
    // hashes the k-minima ARE the whole set — the (K-1)/h_k estimator is
    // meaningless there, the distinct count is exact
    def estOf(kMinima: DataFrame): DataFrame =
      kMinima.agg(max($"h").as("h_k"), count(lit(1)).as("k_eff"))
        .select(when($"k_eff" < K, $"k_eff")
          .otherwise(round(lit(255.0) * lit(1.152921504606846976e18) /
            $"h_k".cast("double")).cast("long"))
          .cast("long").as("est"), $"k_eff")
    // direct: global k-minima of the full distinct hash set
    val direct = estOf(hashes.select($"h").distinct().orderBy($"h".asc).limit(K))
    // merged: per-source partial sketches (k-minima), union, re-trim
    val partials = hashes.distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h".asc)).cast("long"))
      .filter($"rk" <= K)
    val merged = estOf(partials.select($"h").distinct().orderBy($"h".asc).limit(K))
    val exact = hashes.agg(countDistinct($"h").as("n_exact"),
      countDistinct($"source").as("n_sources"))
    exact
      .crossJoin(broadcast(direct.select($"est".as("est_direct"))))
      .crossJoin(broadcast(merged.select($"est".as("est_merged"))))
      .withColumn("merge_law_holds", ($"est_direct" === $"est_merged").cast("long"))
      .withColumn("err_ppm", expr("(abs(est_direct - n_exact) * 1000000L) DIV n_exact"))
  }

  /** PAIRWISE SOURCE OVERLAP from sketch algebra — the |sources|²
    * overlap matrix WITHOUT any corpus-scale pair join: each source
    * keeps a K=256 k-minimum-values sketch of its distinct-shingle
    * hashes; a pair's union estimate comes from merging the two
    * K-sets and re-trimming to K, and the intersection falls out by
    * inclusion–exclusion (clamped at 0). This is the 100 TB form of
    * [[qTextOverlap]]'s exact matrix: per-pair state is ≤ 2K hashes —
    * corpus-size-INDEPENDENT — and the estimator is the same
    * deterministic (K−1)·2⁶⁰/h_K rule [[qKmvDistinct]] gates, so the
    * whole matrix hash-gates cross-engine. Unsaturated sketches (< K
    * hashes) fall back to exact counts, making small sources exact.
    * The source-list cartesian is |sources|² rows — constant at any
    * corpus (PlanHygieneSpec whitelist). */
  def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val K = 256
    // sketch build is the ALGEBRAIC bounded min-K aggregate (round-6):
    // partial aggregation ships <= K values per map partition, never the
    // distinct hash universe — the form that scales; equality with the
    // distinct+row_number formulation is spec'd in TrainingOpsSpec
    val minK = new graft.functions.MinKDistinctAggregator(K).toColumn
    val sk = Memo.materialize(graft.queries.Dedup.docShinglesSrc(s, dir)
      .select($"source", explode($"sh").as("sng"))
      .select($"source", hash60($"sng").as("h"))
      .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(minK.name("ks")).toDF("source", "ks")
      .select($"source", explode($"ks").as("h")))
    def estOver(g: DataFrame, keys: Seq[String], out: String): DataFrame =
      g.groupBy(keys.map(col): _*)
        .agg(max($"h").as("h_k"), count(lit(1)).as("k_eff"))
        .select(keys.map(col) :+
          when($"k_eff" < K, $"k_eff")
            .otherwise(round(lit(255.0) * lit(1.152921504606846976e18) /
              $"h_k".cast("double")).cast("long"))
            .cast("long").as(out): _*)
    val estS = estOver(sk, Seq("source"), "est")
    val srcs = sk.select($"source").distinct()
    val pr = srcs.select($"source".as("src_a"))
      .crossJoin(srcs.select($"source".as("src_b")))
      .filter($"src_a" < $"src_b")
    val m = pr.join(sk.withColumnRenamed("source", "src_a"), "src_a")
      .select($"src_a", $"src_b", $"h")
      .union(pr.join(sk.withColumnRenamed("source", "src_b"), "src_b")
        .select($"src_a", $"src_b", $"h"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy($"src_a", $"src_b").orderBy($"h".asc)).cast("long"))
      .filter($"rk" <= K)
    estOver(m, Seq("src_a", "src_b"), "est_union")
      .join(estS.select($"source".as("src_a"), $"est".as("est_a")), "src_a")
      .join(estS.select($"source".as("src_b"), $"est".as("est_b")), "src_b")
      .select($"src_a", $"src_b", $"est_a", $"est_b", $"est_union",
        greatest(lit(0L), $"est_a" + $"est_b" - $"est_union").as("est_inter"))
  }

  val qKmvOverlapSql: String =
    """WITH toks AS (
      |  SELECT source, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |dt AS (
      |  SELECT DISTINCT source, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sng
      |  FROM toks WHERE len(t) >= 3),
      |hashed AS (
      |  SELECT DISTINCT source, ('0x' || substr(md5(sng), 18, 15))::BIGINT AS h FROM dt),
      |sk AS (
      |  SELECT source, h FROM (
      |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
      |    FROM hashed) WHERE rk <= 256),
      |est_s AS (
      |  SELECT source,
      |    CAST(CASE WHEN count(*) < 256 THEN count(*)
      |      ELSE CAST(round(255.0 * 1.152921504606846976e18 / max(h)) AS BIGINT)
      |    END AS BIGINT) AS est
      |  FROM sk GROUP BY 1),
      |srcs AS (SELECT DISTINCT source FROM sk),
      |pr AS (
      |  SELECT a.source AS src_a, b.source AS src_b
      |  FROM srcs a JOIN srcs b ON a.source < b.source),
      |m AS (
      |  SELECT src_a, src_b, h FROM pr JOIN sk ON sk.source = pr.src_a
      |  UNION
      |  SELECT src_a, src_b, h FROM pr JOIN sk ON sk.source = pr.src_b),
      |mk AS (
      |  SELECT src_a, src_b, h FROM (
      |    SELECT src_a, src_b, h,
      |      row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
      |    FROM m) WHERE rk <= 256),
      |est_u AS (
      |  SELECT src_a, src_b,
      |    CAST(CASE WHEN count(*) < 256 THEN count(*)
      |      ELSE CAST(round(255.0 * 1.152921504606846976e18 / max(h)) AS BIGINT)
      |    END AS BIGINT) AS est_union
      |  FROM mk GROUP BY 1, 2)
      |SELECT e.src_a AS src_a, e.src_b AS src_b, a.est AS est_a,
      |  b.est AS est_b, e.est_union,
      |  greatest(0, a.est + b.est - e.est_union) AS est_inter
      |FROM est_u e JOIN est_s a ON a.source = e.src_a
      |  JOIN est_s b ON b.source = e.src_b""".stripMargin

  val qKmvMergeSql: String =
    """WITH toks AS (
      |  SELECT source, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT source, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sng
      |  FROM toks WHERE len(t) >= 3),
      |hashes AS (
      |  SELECT DISTINCT source, ('0x' || substr(md5(sng), 18, 15))::BIGINT AS h FROM sh),
      |direct_k AS (
      |  SELECT h FROM (SELECT DISTINCT h FROM hashes) ORDER BY h ASC LIMIT 256),
      |direct AS (
      |  SELECT CAST(CASE WHEN count(*) < 256 THEN count(*)
      |    ELSE CAST(round(255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)) AS BIGINT)
      |    END AS BIGINT) AS est_direct
      |  FROM direct_k),
      |partials AS (
      |  SELECT h FROM (
      |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rk
      |    FROM hashes) WHERE rk <= 256),
      |merged_k AS (
      |  SELECT h FROM (SELECT DISTINCT h FROM partials) ORDER BY h ASC LIMIT 256),
      |merged AS (
      |  SELECT CAST(CASE WHEN count(*) < 256 THEN count(*)
      |    ELSE CAST(round(255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)) AS BIGINT)
      |    END AS BIGINT) AS est_merged
      |  FROM merged_k),
      |exact AS (
      |  SELECT count(DISTINCT h) AS n_exact, count(DISTINCT source) AS n_sources FROM hashes)
      |SELECT n_exact, n_sources, est_direct, est_merged,
      |  CAST(CASE WHEN est_direct = est_merged THEN 1 ELSE 0 END AS BIGINT) AS merge_law_holds,
      |  (abs(est_direct - n_exact) * 1000000) // n_exact AS err_ppm
      |FROM exact CROSS JOIN direct CROSS JOIN merged""".stripMargin

  /** Chi-square contingency cells for lang × source independence — the
    * "is my metadata balanced?" audit every corpus card needs, in EXACT
    * integer arithmetic: the per-cell statistic (o−e)²/e with e = r·c/n
    * is multiplied through to (o·n − r·c)² / (r·c·n), evaluated as
    * staged BIGINT floor divisions (identical operation order on both
    * engines, so the gate hash-matches; magnitudes stay under 2^63 —
    * (o·n − r·c)² ≤ (n²)² needs n ≤ ~55k cells-scale counts; rescale
    * counts DIV k first at web scale, the decision statistic is
    * invariant up to rounding). Plan: one (lang, source) cell aggregate,
    * row/col/grand totals derived from the CELLS (not the base table —
    * the scan is paid once), folded back as broadcast joins. */
  def qChisq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy($"lang").agg(sum($"o").as("r_tot"))
    val cols = cells.groupBy($"source").agg(sum($"o").as("c_tot"))
    val n = cells.agg(sum($"o").as("n_tot"))
    cells.join(broadcast(rows), "lang")
      .join(broadcast(cols), "source")
      .crossJoin(broadcast(n))
      // runtime enforcement of the 2^63 bound the scaladoc states:
      // dev2 ≤ n_tot^4 overflows silently past n_tot ≈ 55k, so refuse to
      // emit wrong numbers — rescale counts DIV k upstream instead. The
      // guard lives in the data path (n_tot is an output column), so
      // column pruning cannot eliminate it.
      .withColumn("n_tot", when($"n_tot" > lit(55000L),
          raise_error(concat(lit("qChisq: n_tot="), $"n_tot".cast("string"),
            lit(" exceeds the int64-safe bound 55000; rescale counts DIV k first")))
            .cast("long"))
        .otherwise($"n_tot"))
      .withColumn("dev2",
        ($"o" * $"n_tot" - $"r_tot" * $"c_tot") * ($"o" * $"n_tot" - $"r_tot" * $"c_tot"))
      .withColumn("cell_chi2_m",
        expr("((dev2 DIV (r_tot * c_tot)) * 1000L) DIV n_tot"))
      .select($"lang", $"source", $"o", $"r_tot", $"c_tot", $"n_tot",
        $"dev2", $"cell_chi2_m")
  }

  val qChisqSql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r_tot FROM cells GROUP BY 1),
      |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c_tot FROM cells GROUP BY 1),
      |n AS (SELECT CASE WHEN CAST(sum(o) AS BIGINT) > 55000
      |  THEN error('qChisq: n_tot exceeds the int64-safe bound 55000; rescale counts DIV k first')
      |  ELSE CAST(sum(o) AS BIGINT) END AS n_tot FROM cells)
      |SELECT lang, source, o, r_tot, c_tot, n_tot,
      |  (o * n_tot - r_tot * c_tot) * (o * n_tot - r_tot * c_tot) AS dev2,
      |  (((o * n_tot - r_tot * c_tot) * (o * n_tot - r_tot * c_tot))
      |     // (r_tot * c_tot) * 1000) // n_tot AS cell_chi2_m
      |FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n""".stripMargin

  /** Triangle structure among the strongest co-occurrence pairs — the
    * graph-analytics view of the [[TokenPairs]] top-20 edge set: a token's
    * triangle participation counts how many cohesive token cliques it
    * anchors (the local-cohesion signal behind clustering coefficients).
    * Reuses the memoized support-pruned pair pipeline as the edge list and
    * [[graft.operators.Triangles]] as the counting operator — the
    * degree-oriented O(E^1.5) plan, exact per-node counts (randomized
    * brute-force spec in ScaleOpsSpec). */
  def qTextTri(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Triangles.perNode(
        TokenPairs.top20(s, dir).select($"tok_a", $"tok_b"))
      .select($"id".as("tok"), $"n_triangles")
  }

  val qTextTriSql: String =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |p AS (
      |  SELECT a.tok AS ta, b.tok AS tb, count(*) AS n_docs
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2 ORDER BY n_docs DESC, ta ASC, tb ASC LIMIT 20),
      |tr AS (
      |  SELECT p1.ta AS a, p1.tb AS b, p2.tb AS c
      |  FROM p p1 JOIN p p2 ON p2.ta = p1.tb
      |  JOIN p p3 ON p3.ta = p1.ta AND p3.tb = p2.tb)
      |SELECT tok, count(*) AS n_triangles FROM (
      |  SELECT a AS tok FROM tr UNION ALL SELECT b FROM tr UNION ALL SELECT c FROM tr)
      |GROUP BY tok""".stripMargin

  /** Within-document repetition metrics (the Gopher/MassiveText-style
    * repetition quality rules — public Rae et al. 2021 filter family):
    * most-frequent-token count, most-frequent-bigram count, and the
    * fraction of tokens belonging to token types occurring >= 2 times.
    * Degenerate machine-generated or template text scores high; all
    * outputs are exact integers / ppm. Two key-partitioned shuffles
    * ((doc_id, tok) and (doc_id, bigram) counts) — linear at corpus
    * scale, no cross-doc work at all. */
  def qTextRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", tokens($"text").as("t"))
    val tc = docs.select($"doc_id", explode($"t").as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val tokStats = tc.groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"),
           max($"c").as("top_tok_count"),
           sum(when($"c" >= 2, $"c").otherwise(0L)).as("rep_tokens"))
    val bc = docs.filter(size($"t") >= 2)
      .select($"doc_id", explode(
        zip_with(slice($"t", lit(1), size($"t") - 1), slice($"t", lit(2), size($"t") - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_bigram_count"))
    tokStats.join(bc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"top_tok_count", $"rep_tokens",
        expr("(rep_tokens * 1000000L) DIV n_tokens").as("rep_ppm"),
        coalesce($"top_bigram_count", lit(0L)).as("top_bigram_count"))
  }

  val qTextRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |ts AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(max(c) AS BIGINT) AS top_tok_count,
      |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS rep_tokens
      |  FROM tc GROUP BY 1),
      |bg AS (
      |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
      |bs AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count FROM bc GROUP BY 1)
      |SELECT ts.doc_id, n_tokens, top_tok_count, rep_tokens,
      |  (rep_tokens * 1000000) // n_tokens AS rep_ppm,
      |  coalesce(top_bigram_count, 0) AS top_bigram_count
      |FROM ts LEFT JOIN bs ON bs.doc_id = ts.doc_id""".stripMargin

  /** Per-row formulation of [[qTextRepetition]]'s metrics: every count is
    * computed over the row's own token array, no shuffle at all — so the
    * SAME function runs unchanged on a streaming DataFrame in append mode
    * (stateless map; StreamingSpec proves stream == batch == the shuffle
    * form). The counting is the single-pass native
    * [[org.apache.spark.sql.graft.NativeExprs.RepetitionStats]] (round-15
    * optimization, guide §4): the previous HOF formulation — kept below
    * as the executable spec [[repetitionColsPerRowHof]], equality
    * property-checked in NativeExprsPropSpec — walked
    * `transform(array_distinct(t), x -> size(filter(t, y -> y = x)))`,
    * O(n_tokens²) interpreted lambda evals per document: measured
    * 2.0–2.3 s of q_stream_repetition's 2.4 s addBatch at sf0.1. */
  def repetitionColsPerRow(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") > 0) // matches explode semantics: no tokens, no row
      .withColumn("st", org.apache.spark.sql.graft.NativeExprs.repetitionStats($"t"))
      .select($"doc_id",
        size($"t").cast("long").as("n_tokens"),
        $"st.top_tok_count".as("top_tok_count"),
        $"st.rep_tokens".as("rep_tokens"),
        $"st.top_bigram_count".as("top_bigram_count"))
      .select($"doc_id", $"n_tokens", $"top_tok_count", $"rep_tokens",
        expr("(rep_tokens * 1000000L) DIV n_tokens").as("rep_ppm"),
        $"top_bigram_count")
  }

  /** HOF executable spec of [[repetitionColsPerRow]] (the pre-round-15
    * form): same columns via higher-order functions only. Kept for the
    * native-vs-HOF equality property test; NOT a gated entry. */
  private[graft] def repetitionColsPerRowHof(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") > 0) // matches explode semantics: no tokens, no row
      .withColumn("counts",
        expr("transform(array_distinct(t), x -> size(filter(t, y -> y = x)))"))
      .withColumn("bgs", expr(
        """CASE WHEN size(t) >= 2
          |  THEN zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |                (a, b) -> concat_ws(' ', a, b))
          |  ELSE array() END""".stripMargin))
      .select($"doc_id",
        size($"t").cast("long").as("n_tokens"),
        expr("CAST(array_max(counts) AS LONG)").as("top_tok_count"),
        expr("CAST(aggregate(counts, 0, (a, c) -> a + IF(c >= 2, c, 0)) AS LONG)")
          .as("rep_tokens"),
        expr("CAST(size(bgs) AS LONG)").as("n_bgs"),
        expr("""CAST(CASE WHEN size(bgs) = 0 THEN 0
                |  ELSE array_max(transform(array_distinct(bgs), x -> size(filter(bgs, y -> y = x))))
                |  END AS LONG)""".stripMargin).as("top_bigram_count"))
      .select($"doc_id", $"n_tokens", $"top_tok_count", $"rep_tokens",
        expr("(rep_tokens * 1000000L) DIV n_tokens").as("rep_ppm"),
        $"top_bigram_count")
  }

  /** Text normalization (the P5-cleanup analog for corpora): lowercase,
    * strip non-alphanumerics, collapse whitespace; emit the cleaned hash
    * and size deltas so the transform is fully oracle-checked.
    * [[textCleanCols]] is pure map-side, so the SAME function runs
    * unchanged on a streaming DataFrame (parity spec in StreamingSpec). */
  def textCleanCols(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cleaned = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9\\s]", " "), "\\s+", " "))
    docs.select($"doc_id",
      md5(cleaned).as("clean_md5"),
      length($"text").cast("long").as("len_raw"),
      length(cleaned).cast("long").as("len_clean"))
  }

  def qTextClean(s: SparkSession, dir: String): DataFrame =
    textCleanCols(Tables.documents(s, dir))

  val qTextCleanSql: String =
    """WITH c AS (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS cleaned
      |  FROM documents)
      |SELECT doc_id, md5(cleaned) AS clean_md5,
      |  length(text) AS len_raw, length(cleaned) AS len_clean
      |FROM c""".stripMargin

  private final class LazyDf(compute: () => org.apache.spark.sql.DataFrame) {
    lazy val df: org.apache.spark.sql.DataFrame = compute()
  }
  private val vocabCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), LazyDf]()

  /** Memoized (source, tok, cnt) TOKEN VOCABULARY — the frequency
    * dictionary every vocabulary-shaped operator starts from (vocab
    * stats, spectrum, heavy hitters, drift, OOV, distinctive terms, the
    * whole BPE family). A real pipeline counts tokens ONCE; Zipf makes
    * the vocabulary orders of magnitude smaller than the token stream,
    * so every consumer then works at vocabulary scale. Same holder +
    * dead-session-sweep pattern as the bigram and shingle caches. */
  private[graft] def tokVocab(s: SparkSession, dir: String): DataFrame = {
    vocabCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    vocabCache.computeIfAbsent((s, dir), _ => new LazyDf(() => {
      import s.implicits._
      Memo.materialize(Tables.documents(s, dir)
        .select($"source", explode(tokens($"text")).as("tok"))
        .groupBy($"source", $"tok").agg(count(lit(1)).as("cnt")))
    })).df
  }

  /** Per-source vocabulary richness (Heaps'-law style corpus health
    * signals): token volume, distinct types, hapax legomena (types seen
    * once — the growth frontier of the vocabulary), and type-token ratio
    * in exact ppm. Template/machine-generated sources show depressed TTR
    * and hapax share; a corpus whose hapax count stops growing has
    * saturated its source. Two key-partitioned shuffles ((source, tok)
    * then source) with map-side partials — linear, no cross-doc work. */
  def qTextVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tokVocab(s, dir).select($"source", $"tok", $"cnt".as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_tokens"),
           count(lit(1)).as("n_types"),
           sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_ppm", expr("(n_types * 1000000L) DIV n_tokens"))
      .withColumn("hapax_ppm", expr("(n_hapax * 1000000L) DIV n_types"))
  }

  val qTextVocabSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  (count(*) * 1000000) // CAST(sum(c) AS BIGINT) AS ttr_ppm,
      |  (CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) AS hapax_ppm
      |FROM tc GROUP BY source""".stripMargin

  /** FREQUENCY SPECTRUM — the per-source Zipf/LNRE profile: token types
    * and token mass bucketed by frequency OCTAVE (⌊log₂ c⌋ + 1, computed
    * exactly as the binary-representation length on both engines — no
    * float log at bucket boundaries). Octave 1 = hapax, octave 2 =
    * freq 2–3, … — the spectrum tokenizer sizing and vocabulary-growth
    * (Heaps-law) estimates read, and the long-tail-vs-head mass split
    * that decides BPE vocab budgets. Scale shape: ONE (source, token)
    * count aggregate (vocabulary-bounded state), re-aggregated onto
    * ≤ |sources|·64 octave cells. */
  def qTextSpectrum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tokVocab(s, dir).select($"source", $"tok", $"cnt".as("c"))
      .select($"source", length(bin($"c")).cast("long").as("octave"), $"c")
      .groupBy($"source", $"octave")
      .agg(count(lit(1)).as("n_types"), sum($"c").as("token_mass"))
  }

  val qTextSpectrumSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2)
      |SELECT source, CAST(len(format('{:b}', c)) AS BIGINT) AS octave,
      |  count(*) AS n_types, CAST(sum(c) AS BIGINT) AS token_mass
      |FROM tc GROUP BY 1, 2""".stripMargin

  /** SCRIPT-MIX audit — per-document character-class decomposition
    * (ascii letters / digits / whitespace / OTHER, exact codepoint
    * counts via class-strip length deltas) rolled up per source with
    * two flags real filters alarm on: `n_mixed` (5–50% other — the
    * mojibake / mixed-script / injection band: mostly-latin text
    * carrying a large foreign or garbage payload) and `n_nonlatin`
    * (> 50% other — a different writing system, which is a ROUTING
    * decision, not a quality one). Complements [[qTextLangid]]: langid
    * names the dominant language; this flags documents that do not have
    * one. Scale: per-row regexp class strips ride the scan; one
    * source-keyed aggregate. */
  def qTextScriptmix(s: SparkSession, dir: String): DataFrame =
    scriptmixCols(Tables.documents(s, dir))

  /** Shared batch/streaming core of [[qTextScriptmix]]: stateless
    * per-row class COUNTS + ONE aggregation, so the streaming twin is a
    * single legal complete-mode aggregation. Round-15 (guide §4): the
    * counts come from the single-pass codegen'd
    * [[org.apache.spark.sql.graft.NativeExprs.CharClassCounts]] — the
    * previous form materialized THREE regexp-stripped copies of every
    * document just to take length deltas; the class-strip formulation is
    * kept as the executable spec [[scriptmixColsRegex]] (equality
    * property-checked in NativeExprsPropSpec). */
  private[graft] def scriptmixCols(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("source"), col("text"),
        char_length(col("text")).cast("long").as("n_ch"))
      .filter(col("n_ch") > 0)
      .withColumn("cc", org.apache.spark.sql.graft.NativeExprs.charClassCounts(col("text")))
      .select(col("source"), col("n_ch"),
        col("cc.n_alpha").as("n_alpha"),
        col("cc.n_digit").as("n_digit"),
        col("cc.n_ws").as("n_ws"))
      .withColumn("n_other", col("n_ch") - col("n_alpha") - col("n_digit") - col("n_ws"))
      .withColumn("other_ppm", expr("(n_other * 1000000L) DIV n_ch"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ch")).as("n_chars"),
        expr("sum(n_other * 1000000L) DIV sum(n_ch)").as("other_ppm"),
        sum(when(col("other_ppm") > 50000L && col("other_ppm") <= 500000L, 1L)
          .otherwise(0L)).as("n_mixed"),
        sum(when(col("other_ppm") > 500000L, 1L).otherwise(0L)).as("n_nonlatin"))
  }

  /** Regexp class-strip executable spec of [[scriptmixCols]] (the
    * pre-round-15 form). Kept for the native-vs-regex equality property
    * test; NOT a gated entry. */
  private[graft] def scriptmixColsRegex(docs: DataFrame): DataFrame = {
    docs
      .select(col("source"), col("text"),
        char_length(col("text")).cast("long").as("n_ch"))
      .filter(col("n_ch") > 0)
      .select(col("source"), col("n_ch"),
        (col("n_ch") - char_length(regexp_replace(col("text"), "[A-Za-z]", ""))).cast("long").as("n_alpha"),
        (col("n_ch") - char_length(regexp_replace(col("text"), "[0-9]", ""))).cast("long").as("n_digit"),
        (col("n_ch") - char_length(regexp_replace(col("text"), "[ \t\n\r]", ""))).cast("long").as("n_ws"))
      .withColumn("n_other", col("n_ch") - col("n_alpha") - col("n_digit") - col("n_ws"))
      .withColumn("other_ppm", expr("(n_other * 1000000L) DIV n_ch"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ch")).as("n_chars"),
        expr("sum(n_other * 1000000L) DIV sum(n_ch)").as("other_ppm"),
        sum(when(col("other_ppm") > 50000L && col("other_ppm") <= 500000L, 1L)
          .otherwise(0L)).as("n_mixed"),
        sum(when(col("other_ppm") > 500000L, 1L).otherwise(0L)).as("n_nonlatin"))
  }

  val qTextScriptmixSql: String =
    """WITH d AS (
      |  SELECT source, length(text) AS n_ch,
      |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
      |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
      |    length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS n_ws
      |  FROM documents WHERE length(text) > 0),
      |x AS (
      |  SELECT source, n_ch,
      |    n_ch - n_alpha - n_digit - n_ws AS n_other,
      |    ((n_ch - n_alpha - n_digit - n_ws) * 1000000) // n_ch AS other_ppm
      |  FROM d)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_ch) AS BIGINT) AS n_chars,
      |  CAST(sum(n_other * 1000000) AS BIGINT) // CAST(sum(n_ch) AS BIGINT) AS other_ppm,
      |  CAST(sum(CASE WHEN other_ppm > 50000 AND other_ppm <= 500000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
      |  CAST(sum(CASE WHEN other_ppm > 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonlatin
      |FROM x GROUP BY 1""".stripMargin

  /** BURSTINESS ranking — the boilerplate detector frequency alone
    * misses: a token's mean occurrences PER CONTAINING DOC (n / df).
    * Normal language words spread thinly across many documents
    * (burst ≈ 1–2); template artifacts, separators, and boilerplate
    * repeat heavily inside few documents (burst >> 1). Top-10 by exact
    * integer n·100 DIV df over a df ≥ 5 support floor (rare typos would
    * otherwise dominate). Scale shape: doc-frequency is one distinct
    * (doc, tok) aggregate; total counts re-aggregate the memoized
    * [[tokVocab]]; the rank is a Limit-bounded TakeOrdered, never a
    * full sort. */
  def qTextBurstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Tables.documents(s, dir)
      .select($"doc_id", explode(tokens($"text")).as("tok")).distinct()
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val tc = tokVocab(s, dir).groupBy($"tok").agg(sum($"cnt").as("n"))
    tc.join(df, "tok")
      .filter($"df" >= 5)
      .withColumn("burst_x100", expr("(n * 100L) DIV df"))
      .orderBy($"burst_x100".desc, $"tok".asc).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy($"burst_x100".desc, $"tok".asc)).cast("long"))
      .select($"rk", $"tok", $"n", $"df", $"burst_x100")
  }

  val qTextBurstinessSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |df AS (
      |  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tok)
      |  GROUP BY 1),
      |tc AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
      |j AS (
      |  SELECT tc.tok AS tok, CAST(tc.n AS BIGINT) AS n,
      |    CAST(df.df AS BIGINT) AS df,
      |    (CAST(tc.n AS BIGINT) * 100) // df.df AS burst_x100
      |  FROM tc JOIN df ON tc.tok = df.tok WHERE df.df >= 5)
      |SELECT CAST(row_number() OVER (ORDER BY burst_x100 DESC, tok ASC) AS BIGINT) AS rk,
      |  tok, n, df, burst_x100
      |FROM j ORDER BY burst_x100 DESC, tok ASC LIMIT 10""".stripMargin

  /** Per-source heavy hitters: each source's top-3 tokens by frequency
    * (ties → lexicographic) — the domain-vocabulary signature used for
    * source fingerprinting and template detection. Same WindowGroupLimit
    * shape as the top-N sampler: the rank filter pushes into bounded
    * per-partition heaps before the (source) shuffle, so a dominant
    * source never forces a full sort of its token counts. */
  def qTextHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"c".desc, $"tok".asc)
    tokVocab(s, dir).select($"source", $"tok", $"cnt".as("c"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"source", $"rk", $"tok", $"c")
  }

  val qTextHeavyHittersSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |rk AS (
      |  SELECT source, tok, c,
      |    row_number() OVER (PARTITION BY source ORDER BY c DESC, tok ASC) AS rk
      |  FROM tc)
      |SELECT source, CAST(rk AS BIGINT) AS rk, tok, c
      |FROM rk WHERE rk <= 3""".stripMargin

  /** Corpus DRIFT measurement — total-variation distance between each
    * source's unigram distribution and the reference source (src0), in
    * EXACT integer arithmetic: TV = Σ|p_s − p_0|/2 over the token union,
    * computed as Σ|c_s·N_0 − c_0·N_s| over cross-multiplied raw counts
    * (never a float probability), with the disjoint-token tail folded in
    * as (N_0 − Σ matched c_0)·N_s — so the full-outer union never
    * materializes, only a left join from each source's tokens. The
    * domain-shift / dataset-drift statistic of corpus monitoring; TV = 0
    * iff identical distributions, 1e6 ppm iff disjoint. One (source, tok)
    * count shuffle + a tok-keyed reference join — linear. The reference
    * vocabulary is NOT broadcast: vocabulary grows with the corpus
    * (Heaps' law — 1e8–1e9 types at 100 TB), so the left join shuffles on
    * tok, co-partitioned with the count shuffle already present; only the
    * 1-row N_0 total is broadcast. */
  def qTextDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tc = tokVocab(s, dir).select($"source", $"tok", $"cnt".as("c"))
    val totals = tc.groupBy($"source").agg(sum($"c").as("n"))
    val ref = tc.filter($"source" === "src0")
      .select($"tok", $"c".as("c0"))
    // global (no-grouping) aggregate: mechanically ≤1 row at any corpus
    // size, which is what PlanHygieneSpec's pinned-broadcast rule checks
    val n0 = tc.filter($"source" === "src0").agg(sum($"c").as("n0"))
    tc.filter($"source" =!= "src0")
      .join(ref, Seq("tok"), "left")
      .join(totals.filter($"source" =!= "src0"), Seq("source")) // N_s rides each row
      .crossJoin(broadcast(n0))
      .groupBy($"source")
      .agg(first($"n").as("n_tokens"), first($"n0").as("n0"),
           count(lit(1)).as("n_types"),
           sum(coalesce($"c0", lit(0L))).as("matched0"),
           sum(abs($"c" * $"n0" - coalesce($"c0", lit(0L)) * $"n")).as("sum_d"))
      .select($"source", $"n_tokens", $"n_types",
        expr("((sum_d + (n0 - matched0) * n_tokens) * 1000000L) DIV (2 * n0 * n_tokens)")
          .as("tv_ppm"))
  }

  val qTextDriftSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
      |ref AS (SELECT tok, c AS c0 FROM tc WHERE source = 'src0'),
      |n0t AS (SELECT n AS n0 FROM totals WHERE source = 'src0'),
      |j AS (
      |  SELECT tc.source, tc.c, coalesce(ref.c0, 0) AS c0
      |  FROM tc LEFT JOIN ref ON tc.tok = ref.tok
      |  WHERE tc.source <> 'src0'),
      |agg AS (
      |  SELECT j.source,
      |    CAST(sum(abs(j.c * n0 - j.c0 * t.n)) AS BIGINT) AS sum_d,
      |    count(*) AS n_types,
      |    CAST(sum(j.c0) AS BIGINT) AS matched0
      |  FROM j JOIN totals t ON j.source = t.source CROSS JOIN n0t
      |  GROUP BY j.source)
      |SELECT a.source, t.n AS n_tokens, a.n_types,
      |  ((a.sum_d + (n0 - a.matched0) * t.n) * 1000000) // (2 * n0 * t.n) AS tv_ppm
      |FROM agg a JOIN totals t ON a.source = t.source CROSS JOIN n0t""".stripMargin

  /** Cross-source shingle-overlap matrix — the "how much does source A
    * repeat source B" corpus card every multi-source training mix needs
    * (near-identical crawls, mirrored sites, re-crawled snapshots show
    * up here before any doc-level dedup runs). Exact distinct-shingle
    * jaccard per source PAIR, from one inverted index: the self-join key
    * is the shingle, and each shingle carries at most |sources| rows per
    * side, so the blow-up per posting is bounded by a CONSTANT (|sources|²)
    * — linear in postings at any corpus size, output |sources|² rows.
    * Reads the memoized per-doc shingle relation (one corpus shingling,
    * shared with the whole dedup family). */
  def qTextOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // materialized once: both the per-source sizes and the per-shingle
    // pair aggregation consume the same distinct (source, shingle)
    // relation (explode + distinct would otherwise run twice)
    val ss = Memo.materialize(graft.queries.Dedup.docShinglesSrc(s, dir)
      .select($"source", explode($"sh").as("sng")).distinct())
    val sz = ss.groupBy($"source").agg(count(lit(1)).as("n"))
    // ONE aggregation per shingle (state ≤ |sources| strings), then the
    // ordered source pairs expand IN-ROW from the sorted set — no
    // postings-scale self-join, no second shuffle of the inverted index
    val pairs = ss.groupBy($"sng")
      .agg(sort_array(collect_set($"source")).as("srcs"))
      .filter(size($"srcs") >= 2)
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    y -> named_struct('src_a', x, 'src_b', y))))""".stripMargin)).as("p"))
      .select($"p.src_a", $"p.src_b")
    pairs.groupBy($"src_a", $"src_b").agg(count(lit(1)).as("i"))
      .join(sz.select($"source".as("src_a"), $"n".as("n_a")), "src_a")
      .join(sz.select($"source".as("src_b"), $"n".as("n_b")), "src_b")
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"i",
        expr("(i * 1000000L) DIV (n_a + n_b - i)").as("jaccard_ppm"))
  }

  val qTextOverlapSql: String =
    """WITH toks AS (
      |  SELECT source, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |ssh AS (
      |  SELECT DISTINCT source, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sng
      |  FROM toks WHERE len(t) >= 3),
      |sz AS (SELECT source, count(*) AS n FROM ssh GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS i
      |  FROM ssh a JOIN ssh b ON a.sng = b.sng AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, x.n AS n_a, y.n AS n_b, i,
      |  (i * 1000000) // (x.n + y.n - i) AS jaccard_ppm
      |FROM inter JOIN sz x ON x.source = src_a JOIN sz y ON y.source = src_b""".stripMargin

  /** N-GRAM NOVELTY — the memorization-risk metric of corpus curation:
    * processing documents in corpus order (doc_id), what fraction of a
    * document's shingles has never been seen before? A doc assembled
    * from earlier documents' fragments scores near zero novelty even
    * when no single pair crosses a near-dup threshold — the additive
    * leakage jaccard and containment both miss. Exact and
    * order-deterministic: a shingle's FIRST OWNER is min(doc_id) over
    * its postings, one inverted-index aggregate; each doc then counts
    * the shingles it owns first. Two shuffles on the shingle key (the
    * aggregate and the join are co-partitioned), output one row per
    * doc. Reads the memoized shingle relation. */
  def qTextNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inv = graft.queries.Dedup.docShinglesSrc(s, dir)
      .select($"doc_id", explode($"sh").as("sng"))
    val firstOwner = inv.groupBy($"sng").agg(min($"doc_id").as("first_doc"))
    inv.join(firstOwner, "sng")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum(($"doc_id" === $"first_doc").cast("long")).as("n_novel"))
      .withColumn("novelty_ppm", expr("(n_novel * 1000000L) DIV n_shingles"))
  }

  val qTextNoveltySql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sng
      |  FROM toks WHERE len(t) >= 3),
      |fo AS (SELECT sng, min(doc_id) AS first_doc FROM sh GROUP BY 1)
      |SELECT doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  (CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // count(*) AS novelty_ppm
      |FROM sh JOIN fo USING (sng)
      |GROUP BY doc_id""".stripMargin

  /** Shared batch/stream core of incremental novelty: per-doc counts of
    * exploded (doc_id, sng) rows against a static distinct historical
    * shingle set — a left stream-static join + one aggregation, so the
    * SAME code runs on a bounded relation and on an unbounded stream
    * (StreamingEtl.noveltyStream). */
  private[graft] def noveltyAgainstIndex(inv: DataFrame, hist: DataFrame): DataFrame = {
    import inv.sparkSession.implicits._
    // the contract is a DISTINCT shingle set — enforce it here rather
    // than assuming it: a duplicated history row would multiply inv rows
    // through the left join, inflating n_shingles and deflating
    // novelty_ppm for seen shingles. On the bucketed persisted history
    // the dropDuplicates rides the bucket layout (no extra exchange);
    // on an already-distinct in-memory set it is a cheap no-op pass.
    inv.join(hist.select($"sng").dropDuplicates("sng")
        .withColumn("seen", lit(1L)), Seq("sng"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum($"seen".isNull.cast("long")).as("n_novel"))
      .withColumn("novelty_ppm", expr("(n_novel * 1000000L) DIV n_shingles"))
  }

  /** The historical distinct-shingle set PERSISTED through the lake and
    * read back — incremental novelty's write-once state made real,
    * mirroring the incremental-dedup band index (Dedup.persistedBandIndex):
    * built once per (session, dir), saved as a parquet table bucketed AND
    * sorted by `sng` — the probe-join key — then served from the catalog.
    * The bucketed scan carries hashpartitioning(sng) natively, so each
    * daily/streaming probe shuffles ONLY the arriving slice; the history
    * is never re-shingled and never re-shuffled (ScaleOpsSpec asserts the
    * history side of the probe join plans zero Exchange). */
  private[graft] def persistedShingleHistory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Memo.persistedBucketedTable(s, "graft_novelty_hist", dir,
      graft.queries.Dedup.IncrBuckets, Seq("sng"))(
      graft.queries.Dedup.docShinglesSrc(s, dir)
        .filter($"doc_id" % 5 =!= 0)
        .select(explode($"sh").as("sng")).distinct())
  }

  /** INCREMENTAL novelty — [[qTextNovelty]]'s daily-ingest form: the
    * arriving slice (doc_id % 5 == 0, the same convention as incremental
    * dedup) scored against the HISTORICAL distinct-shingle set only.
    * This is the shape that runs at ingest: the history is write-once
    * state served from the lake ([[persistedShingleHistory]] — bucketed
    * by the probe key, zero exchanges on the history side), the arriving
    * doc never compares to its own batch, and the streaming twin runs
    * the identical [[noveltyAgainstIndex]] core against the SAME
    * reloaded table (stream == batch proven in StreamingSpec). */
  def qTextNoveltyIncr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inv = graft.queries.Dedup.docShinglesSrc(s, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", explode($"sh").as("sng"))
    noveltyAgainstIndex(inv, persistedShingleHistory(s, dir))
  }

  val qTextNoveltyIncrSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t)-1)]) AS sng
      |  FROM toks WHERE len(t) >= 3),
      |hist AS (SELECT DISTINCT sng FROM sh WHERE doc_id % 5 <> 0),
      |inv AS (SELECT doc_id, sng FROM sh WHERE doc_id % 5 = 0)
      |SELECT doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN h.sng IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  (CAST(sum(CASE WHEN h.sng IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
      |    // count(*) AS novelty_ppm
      |FROM inv LEFT JOIN hist h ON inv.sng = h.sng
      |GROUP BY doc_id""".stripMargin

  /** First-round BPE merge learning — the tokenizer-training primitive,
    * distributed: count every adjacent character pair across all token
    * instances of the corpus and rank the top 20 merge candidates with a
    * deterministic (count desc, pair asc) tie-break. Plan: one explode →
    * per-token pair expansion (a HOF transform riding the scan, no
    * shuffle) → one hash-aggregate on the pair (vocabulary-bounded) →
    * TakeOrdered 20. The rank window runs AFTER the limit, over 20 rows.
    * Subsequent BPE rounds re-run the same aggregate over re-segmented
    * tokens — each round is this exact plan shape. */
  def qTextBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // learn on the WEIGHTED VOCABULARY (round-6): pair counts are
    // sum(cnt) over distinct tokens, identical to instance counts but
    // Zipf-small — the word-frequency-dict form every BPE trainer uses
    val pairs = tokVocab(s, dir)
      .groupBy($"tok").agg(sum($"cnt").as("cnt"))
      .filter(length($"tok") >= 2)
      .select($"cnt", explode(expr(
        "transform(sequence(1, char_length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
    pairs.groupBy($"pair").agg(sum($"cnt").as("n"))
      .orderBy($"n".desc, $"pair".asc).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy($"n".desc, $"pair".asc)).cast("long"))
      .select($"rk", $"pair", $"n")
  }

  /** SECOND-round BPE — the loop shape every tokenizer trainer runs,
    * in-engine: learn the top round-1 merge, APPLY it (re-segment every
    * token), then learn round 2's top-20 pair ranking over the merged
    * symbol sequences. Each round is the same vocabulary-bounded
    * aggregate as [[qTextBpe]]; the applied merge is a 1-row broadcast
    * (a global top-1, bounded at any scale), and re-segmentation rides
    * the scan as pure higher-order array expressions — no extra shuffle
    * beyond the two pair aggregates.
    *
    * Re-segmentation is positional: a symbol starts wherever the
    * previous two chars are NOT the merge, and a starting position whose
    * two chars ARE the merge emits the merged symbol. For a merge with
    * two distinct characters this equals greedy left-to-right BPE
    * application exactly (occurrences cannot overlap); a self-pair
    * merge (aa) would differ, so BOTH engines guard it with an explicit
    * error rather than silently diverging. Round-2 pairs are
    * space-separated symbol pairs (symbols never contain spaces), so
    * (x, yz) and (xy, z) cannot collide. */
  def qTextBpe2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // weighted-vocabulary form (round-6): both learning rounds run at
    // vocabulary scale; counts are exact instance counts via sum(cnt)
    val toks = tokVocab(s, dir)
      .groupBy($"tok").agg(sum($"cnt").as("cnt"))
      .filter(length($"tok") >= 2)
    val merge1 = toks
      .select($"cnt", explode(expr(
        "transform(sequence(1, char_length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(sum($"cnt").as("n"))
      .orderBy($"n".desc, $"pair".asc).limit(1)
      .select(expr(
        "CASE WHEN substr(pair, 1, 1) = substr(pair, 2, 1) " +
        "THEN raise_error('q_text_bpe2: self-pair top merge not supported') " +
        "ELSE pair END").as("m"))
    val pairs2 = toks.crossJoin(broadcast(merge1))
      .select(expr(
        """transform(
          |  filter(sequence(1, char_length(tok)),
          |         i -> i = 1 OR substring(tok, i - 1, 2) != m),
          |  i -> CASE WHEN substring(tok, i, 2) = m THEN m
          |       ELSE substring(tok, i, 1) END)""".stripMargin).as("syms"),
        $"m", $"cnt")
      .filter(size($"syms") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
        "j -> concat(element_at(syms, j), ' ', element_at(syms, j + 1)))"))
        .as("pair"), $"m", $"cnt")
    pairs2.groupBy($"pair")
      .agg(sum($"cnt").as("n"), first($"m").as("merge1"))
      .orderBy($"n".desc, $"pair".asc).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy($"n".desc, $"pair".asc)).cast("long"))
      .select($"rk", $"pair", $"n", $"merge1")
  }

  val qTextBpe2Sql: String =
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tok2 AS (SELECT tok FROM tok WHERE len(tok) >= 2),
      |p1 AS (
      |  SELECT unnest([substr(tok, i, 2) for i in range(1, len(tok))]) AS pair
      |  FROM tok2),
      |m1 AS (
      |  SELECT CASE WHEN substr(pair, 1, 1) = substr(pair, 2, 1)
      |         THEN error('q_text_bpe2: self-pair top merge not supported')
      |         ELSE pair END AS m
      |  FROM (SELECT pair FROM p1 GROUP BY pair
      |        ORDER BY count(*) DESC, pair ASC LIMIT 1)),
      |segs AS (
      |  SELECT [CASE WHEN substr(tok, i, 2) = m THEN m ELSE substr(tok, i, 1) END
      |          for i in range(1, len(tok) + 1)
      |          if i = 1 OR substr(tok, i - 1, 2) <> m] AS syms, m
      |  FROM tok2 CROSS JOIN m1),
      |p2 AS (
      |  SELECT unnest([syms[j] || ' ' || syms[j + 1] for j in range(1, len(syms))]) AS pair, m
      |  FROM segs WHERE len(syms) >= 2),
      |top AS (
      |  SELECT pair, count(*) AS n, min(m) AS merge1 FROM p2 GROUP BY pair
      |  ORDER BY n DESC, pair ASC LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rk,
      |  pair, n, merge1
      |FROM top""".stripMargin

  val qTextBpeSql: String =
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |bp AS (
      |  SELECT unnest([substr(tok, i, 2) for i in range(1, len(tok))]) AS pair
      |  FROM tok WHERE len(tok) >= 2),
      |pc AS (SELECT pair, count(*) AS n FROM bp GROUP BY 1),
      |top AS (SELECT pair, n FROM pc ORDER BY n DESC, pair ASC LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rk,
      |  pair, n
      |FROM top""".stripMargin

  /** Tokenizer-coverage / OOV audit: the top-K corpus vocabulary (K=24,
    * deterministic count-desc / token-asc tie-break) stands in for a
    * trained tokenizer's vocab table; per source, the report gives the
    * token-INSTANCE out-of-vocabulary rate plus the distinct OOV type
    * count — the "what does a 32k vocab cost each source" audit that
    * precedes every tokenizer freeze. Scale shape: ONE (source, token)
    * count aggregate (state bounded by |sources| x |vocab|, not corpus
    * rows), the top-K vocab is Limit-bounded and explicitly broadcast,
    * and the per-source rollup weights by the pre-aggregated counts —
    * token instances are never re-scanned after the first aggregate. */
  def qVocabOov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val st = tokVocab(s, dir).select($"source", $"tok", $"cnt".as("n"))
    val vocab = st.groupBy($"tok").agg(sum($"n").as("cn"))
      .orderBy($"cn".desc, $"tok".asc).limit(24)
      .select($"tok", lit(true).as("in_vocab"))
    st.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy($"source")
      .agg(sum($"n").as("n_instances"),
        sum(when($"in_vocab".isNull, $"n").otherwise(0L)).as("n_oov"),
        countDistinct(when($"in_vocab".isNull, $"tok")).as("n_oov_types"))
      .select($"source", $"n_instances", $"n_oov", $"n_oov_types",
        expr("(n_oov * 1000000L) DIV n_instances").as("oov_ppm"))
  }

  val qVocabOovSql: String =
    """WITH tk AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |st AS (SELECT source, tok, count(*) AS n FROM tk GROUP BY 1, 2),
      |v AS (SELECT tok FROM st GROUP BY tok ORDER BY sum(n) DESC, tok ASC LIMIT 24)
      |SELECT source, CAST(sum(n) AS BIGINT) AS n_instances,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN n ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(count(DISTINCT CASE WHEN v.tok IS NULL THEN st.tok END) AS BIGINT) AS n_oov_types,
      |  (CAST(sum(CASE WHEN v.tok IS NULL THEN n ELSE 0 END) AS BIGINT) * 1000000)
      |    // CAST(sum(n) AS BIGINT) AS oov_ppm
      |FROM st LEFT JOIN v ON st.tok = v.tok
      |GROUP BY source""".stripMargin

  /** BPE merge APPLICATION + per-source fertility report — the other
    * half of tokenizer training: after learning the top merge
    * ([[qTextBpe]]), apply it corpus-wide and measure what every source
    * pays, as symbols-per-token (fertility x1e4) and symbols-per-char
    * (compression ppm). The per-token re-segmentation is the same
    * positional higher-order expression as [[qTextBpe2]] (greedy
    * left-to-right application, exact for two-distinct-char merges,
    * guarded self-pair). Scale shape: the learned merge is a 1-row
    * Limit-bounded broadcast; segmentation rides the scan; the only
    * shuffle is the source-bounded final aggregate. */
  def qTextBpeApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // weighted-vocabulary form (round-6): learn globally and apply per
    // (source, token-type), weighting every per-token stat by cnt
    val toks = tokVocab(s, dir)
    val merge1 = toks
      .groupBy($"tok").agg(sum($"cnt").as("cnt"))
      .filter(length($"tok") >= 2)
      .select($"cnt", explode(expr(
        "transform(sequence(1, char_length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(sum($"cnt").as("n"))
      .orderBy($"n".desc, $"pair".asc).limit(1)
      .select(expr(
        "CASE WHEN substr(pair, 1, 1) = substr(pair, 2, 1) " +
        "THEN raise_error('q_text_bpe_apply: self-pair top merge not supported') " +
        "ELSE pair END").as("m"))
    toks.crossJoin(broadcast(merge1))
      .select($"source", $"cnt", char_length($"tok").as("nch"),
        expr("size(filter(sequence(1, char_length(tok)), " +
             "i -> i = 1 OR substring(tok, i - 1, 2) != m))").as("nsym"))
      .groupBy($"source")
      .agg(sum($"cnt").as("n_toks"),
        sum($"nch".cast("long") * $"cnt").as("n_chars"),
        sum($"nsym".cast("long") * $"cnt").as("n_syms"))
      .select($"source", $"n_toks", $"n_chars", $"n_syms",
        expr("(n_syms * 10000L) DIV n_toks").as("fert_x10k"),
        expr("(n_syms * 1000000L) DIV n_chars").as("compress_ppm"))
  }

  val qTextBpeApplySql: String =
    """WITH tk AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |p1 AS (
      |  SELECT unnest([substr(tok, i, 2) for i in range(1, len(tok))]) AS pair
      |  FROM tk WHERE len(tok) >= 2),
      |m1 AS (
      |  SELECT CASE WHEN substr(pair, 1, 1) = substr(pair, 2, 1)
      |         THEN error('q_text_bpe_apply: self-pair top merge not supported')
      |         ELSE pair END AS m
      |  FROM (SELECT pair FROM p1 GROUP BY pair
      |        ORDER BY count(*) DESC, pair ASC LIMIT 1)),
      |seg AS (
      |  SELECT source, len(tok) AS nch,
      |    len([i for i in range(1, len(tok) + 1)
      |         if i = 1 OR substr(tok, i - 1, 2) <> m]) AS nsym
      |  FROM tk CROSS JOIN m1)
      |SELECT source, count(*) AS n_toks,
      |  CAST(sum(nch) AS BIGINT) AS n_chars,
      |  CAST(sum(nsym) AS BIGINT) AS n_syms,
      |  (CAST(sum(nsym) AS BIGINT) * 10000) // count(*) AS fert_x10k,
      |  (CAST(sum(nsym) AS BIGINT) * 1000000)
      |    // CAST(sum(nch) AS BIGINT) AS compress_ppm
      |FROM seg GROUP BY source""".stripMargin

  /** Distinctive-term profile per source: each token's lift — in-source
    * relative frequency over corpus relative frequency, as the exact
    * integer ppm (n·N)·1e6 DIV (N_s·n_tok) — ranked top-3 per source.
    * The corpus-characterization op behind "what makes source X
    * different": templates, domain vocabulary, and contamination all
    * surface as high-lift terms. Scale shape: ONE (source, token) count
    * aggregate; source and token marginals are re-aggregates of it; the
    * grand total is a 1-row broadcast; the top-3 rank filter rewrites to
    * WindowGroupLimit bounded heaps (never a full per-source sort). */
  def qSourceTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val st = tokVocab(s, dir).select($"source", $"tok", $"cnt".as("n"))
    val stot = st.groupBy($"source").agg(sum($"n").as("s_tot"))
    val ctot = st.groupBy($"tok").agg(sum($"n").as("c_n"))
    val gtot = st.agg(sum($"n").as("g_tot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"lift_ppm".desc, $"tok".asc)
    st.join(stot, "source").join(ctot, "tok").crossJoin(broadcast(gtot))
      .select($"source", $"tok", $"n",
        expr("(n * g_tot * 1000000L) DIV (s_tot * c_n)").as("lift_ppm"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"source", $"rk", $"tok", $"n", $"lift_ppm")
  }

  val qSourceTermsSql: String =
    """WITH tk AS (
      |  SELECT source, unnest(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |st AS (SELECT source, tok, count(*) AS n FROM tk GROUP BY 1, 2),
      |stot AS (SELECT source, CAST(sum(n) AS BIGINT) AS s_tot FROM st GROUP BY 1),
      |ctot AS (SELECT tok, CAST(sum(n) AS BIGINT) AS c_n FROM st GROUP BY 1),
      |g AS (SELECT CAST(sum(n) AS BIGINT) AS g_tot FROM st),
      |lift AS (
      |  SELECT st.source AS source, st.tok AS tok, n,
      |    (n * g_tot * 1000000) // (s_tot * c_n) AS lift_ppm
      |  FROM st JOIN stot USING (source) JOIN ctot ON st.tok = ctot.tok
      |  CROSS JOIN g),
      |rk AS (
      |  SELECT source, tok, n, lift_ppm,
      |    CAST(row_number() OVER (
      |      PARTITION BY source ORDER BY lift_ppm DESC, tok ASC) AS BIGINT) AS rk
      |  FROM lift)
      |SELECT source, rk, tok, n, lift_ppm FROM rk WHERE rk <= 3""".stripMargin

  /** TOKENIZER FERTILITY per language — tokens and bytes per character,
    * the numbers that size a token budget across languages (whitespace
    * tokenization under-segments CJK and a byte-level tokenizer's cost
    * tracks BYTES, so both ratios matter when allocating a multilingual
    * mix). Map-side per-row arithmetic + one |langs|-row aggregation;
    * ratios are exact integer ppm/centi (gate convention). */
  def qTokFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"lang",
        size(tokens($"text")).cast("long").as("nt"),
        length($"text").cast("long").as("nc"),
        octet_length($"text").cast("long").as("nb"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
        sum($"nc").as("n_chars"), sum($"nb").as("n_bytes"))
      .select($"lang", $"n_docs", $"n_tokens", $"n_chars", $"n_bytes",
        expr("(n_tokens * 1000000L) DIV n_chars").as("tok_per_char_ppm"),
        expr("(n_bytes * 100L) DIV n_chars").as("bytes_per_char_c"))
  }

  val qTokFertilitySql: String =
    """WITH d AS (
      |  SELECT lang,
      |    len(list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS nt,
      |    length(text) AS nc, strlen(text) AS nb
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS n_tokens,
      |  CAST(sum(nc) AS BIGINT) AS n_chars,
      |  CAST(sum(nb) AS BIGINT) AS n_bytes,
      |  (CAST(sum(nt) AS BIGINT) * 1000000) // CAST(sum(nc) AS BIGINT) AS tok_per_char_ppm,
      |  (CAST(sum(nb) AS BIGINT) * 100) // CAST(sum(nc) AS BIGINT) AS bytes_per_char_c
      |FROM d GROUP BY lang""".stripMargin

  /** WINNOWING document fingerprints, gated (round-9 — the last
    * spec-only text operator): Schleimer et al.'s MOSS algorithm
    * (SIGMOD 2003) as the native
    * [[org.apache.spark.sql.graft.NativeExprs.winnowFingerprint]]
    * expression — token 4-gram rolling hashes, keep the minimum of each
    * 4-window (rightmost on ties), emit the sorted distinct selection.
    * Guaranteed to cover any shared run of >= w+k-1 = 7 tokens, with
    * density ~2/(w+1) — the fingerprint index plagiarism/near-dup
    * detectors build at corpus scale (per-row map-side expression; the
    * exploded (fp -> doc) inverted index shuffles only selected hashes,
    * ~1/3 of the gram volume).
    *
    * The gate runs the expression's mod-p twin (prime=1e9+7 codepoint
    * polynomial — same selection loop, swappable hash) because the
    * production 64-bit wrapping hash cannot be stated in DuckDB SQL
    * (BIGINT arithmetic errors on overflow rather than wrapping); the
    * oracle states hashes via list_reduce over codepoints and the
    * window minimum via a rank over (gh ASC, i DESC). The production
    * hash stays pinned by NativeExprsPropSpec (identity,
    * edit-robustness, discrimination, drift merge). */
  def qTextWinnow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.NativeExprs
    Tables.documents(s, dir)
      .select($"doc_id",
        NativeExprs.winnowFingerprint(tokens($"text"), k = 4, w = 4,
          prime = 1000000007L).as("fps"))
      .filter(size($"fps") > 0)
      .select($"doc_id", explode($"fps").as("fp"))
  }

  val qTextWinnowSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' '), x -> x <> '') AS t
      |  FROM documents),
      |tokh AS (
      |  SELECT doc_id,
      |    [list_reduce(list_prepend(0::BIGINT, [unicode(c)::BIGINT for c in string_split(tok, '')]),
      |       (h, c) -> (h * 31 + c) % 1000000007) for tok in t] AS th
      |  FROM toks WHERE len(t) >= 4),
      |gram AS (
      |  SELECT doc_id, i,
      |    (((((th[i] * 131 + th[i+1]) % 1000000007) * 131 + th[i+2]) % 1000000007)
      |      * 131 + th[i+3]) % 1000000007 AS gh
      |  FROM (SELECT doc_id, th, unnest(range(1, len(th) - 2)) AS i FROM tokh)),
      |wins AS (
      |  SELECT doc_id, unnest(range(0, greatest(len(th) - 7, 0) + 1)) AS s
      |  FROM tokh),
      |sel AS (
      |  SELECT DISTINCT doc_id, gh FROM (
      |    SELECT w.doc_id, w.s, g.gh,
      |      row_number() OVER (PARTITION BY w.doc_id, w.s
      |        ORDER BY g.gh ASC, g.i DESC) AS rn
      |    FROM wins w JOIN gram g
      |      ON g.doc_id = w.doc_id AND g.i - 1 >= w.s AND g.i - 1 < w.s + 4)
      |  WHERE rn = 1)
      |SELECT doc_id, gh AS fp FROM sel""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_winnow"      -> (qTextWinnow _),
    "q_tok_fertility"    -> (qTokFertility _),
    "q_vocab_oov"        -> (qVocabOov _),
    "q_text_bpe_apply"   -> (qTextBpeApply _),
    "q_source_terms"     -> (qSourceTerms _),
    "q_text_overlap"     -> (qTextOverlap _),
    "q_text_bpe"         -> (qTextBpe _),
    "q_text_bpe2"        -> (qTextBpe2 _),
    "q_text_novelty"     -> (qTextNovelty _),
    "q_text_novelty_incr" -> (qTextNoveltyIncr _),
    "q_text_drift"       -> (qTextDrift _),
    "q_text_hh"          -> (qTextHeavyHitters _),
    "q_text_vocab"       -> (qTextVocab _),
    "q_text_spectrum"    -> (qTextSpectrum _),
    "q_text_scriptmix"   -> (qTextScriptmix _),
    "q_text_burstiness"  -> (qTextBurstiness _),
    "q_text_clean"       -> (qTextClean _),
    "q_text_repetition"  -> (qTextRepetition _),
    "q_text_tfidf"       -> (qTextTfidf _),
    "q_text_cooc"        -> (qTextCooc _),
    "q_text_stats"       -> (qTextStats _),
    "q_text_langid"      -> (qTextLangid _),
    "q_text_tokens"      -> (qTextTokens _),
    "q_text_fingerprint" -> (qTextFingerprint _),
    "q_text_tri"         -> (qTextTri _),
    "q_chisq"            -> (qChisq _),
    "q_kmv_distinct"     -> (qKmvDistinct _),
    "q_kmv_merge"        -> (qKmvMerge _),
    "q_kmv_overlap"      -> (qKmvOverlap _),
  )

  def oracles: Map[String, String] = Map(
    "q_text_winnow"      -> qTextWinnowSql,
    "q_tok_fertility"    -> qTokFertilitySql,
    "q_vocab_oov"        -> qVocabOovSql,
    "q_text_bpe_apply"   -> qTextBpeApplySql,
    "q_source_terms"     -> qSourceTermsSql,
    "q_text_overlap"     -> qTextOverlapSql,
    "q_text_bpe"         -> qTextBpeSql,
    "q_text_bpe2"        -> qTextBpe2Sql,
    "q_text_novelty"     -> qTextNoveltySql,
    "q_text_novelty_incr" -> qTextNoveltyIncrSql,
    "q_text_drift"       -> qTextDriftSql,
    "q_text_hh"          -> qTextHeavyHittersSql,
    "q_text_vocab"       -> qTextVocabSql,
    "q_text_spectrum"    -> qTextSpectrumSql,
    "q_text_scriptmix"   -> qTextScriptmixSql,
    "q_text_burstiness"  -> qTextBurstinessSql,
    "q_text_clean"       -> qTextCleanSql,
    "q_text_repetition"  -> qTextRepetitionSql,
    "q_text_tfidf"       -> qTextTfidfSql,
    "q_text_cooc"        -> qTextCoocSql,
    "q_text_stats"       -> qTextStatsSql,
    "q_text_langid"      -> qTextLangidSql,
    "q_text_tokens"      -> qTextTokensSql,
    "q_text_fingerprint" -> qTextFingerprintSql,
    "q_text_tri"         -> qTextTriSql,
    "q_chisq"            -> qChisqSql,
    "q_kmv_distinct"     -> qKmvDistinctSql,
    "q_kmv_merge"        -> qKmvMergeSql,
    "q_kmv_overlap"      -> qKmvOverlapSql,
  )
}
