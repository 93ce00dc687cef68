package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExprs
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Column-expression library for text dedup / analysis (SURVEY §7 north-star
  * extensions; the reference has no text ops — its record cleanup is
  * /root/reference/OTIMIZACAO_API_PYTHON.md:67-75 stringification only).
  *
  * Everything here is built from Catalyst higher-order functions (transform/
  * aggregate/zip_with) so expressions stay in the JVM columnar path — no
  * Scala UDFs, no serialization fences. Hashes that must be reproducible in
  * the DuckDB oracle use the shared 60-bit scheme [[hash60]]; hashes that are
  * Spark-internal (MinHash permutations) use codegen'd xxhash64.
  */
object TextFunctions {

  /** Mersenne prime 2^31-1: modulus for MinHash permutation arithmetic.
    * a*x+b stays under 2^62, so the math is exact in Long. */
  val MinhashP: Long = 2147483647L

  /** Whitespace tokens, empty strings dropped. Matches the oracle's
    * `list_filter(string_split(regexp_replace(trim(x),'\s+',' ','g'),' '), ...)`.
    *
    * Round-16 (VERDICT-r15 #2): native single-pass tokenizer —
    * TokenNgrams with n = 1 emits exactly the token array, one compiled
    * byte scan per row. The previous regex form (kept below as the
    * executable spec, [[tokensHof]]) paid one `regexp_replace` full-string
    * rewrite + split + an interpreted filter lambda per token on EVERY
    * tokenizing path (tokVocab, tfidf, repetition, langid, token-count
    * quality shapes — guide §4). Exactness: Java regex `\s` is exactly
    * the ASCII set [ \t\n\x0B\f\r] the native tokenizer splits on, and
    * both drop empty tokens (NativeExprsPropSpec property-checks equality
    * against the regex spec). */
  def tokens(text: Column): Column = NativeExprs.tokenNgrams(text, 1)

  /** Regex/HOF formulation of [[tokens]] — executable spec for the
    * property test. */
  private[graft] def tokensHof(text: Column): Column =
    filter(split(regexp_replace(trim(text), "\\s+", " "), " "), t => t =!= "")

  /** Distinct token 3-gram shingle set of a text column — native
    * single-pass expression; semantically array_distinct(shingles3(tokens)). */
  def shingleSet(text: Column): Column = NativeExprs.tokenShingles(text, 3)

  /** Token 3-gram shingles ("w1 w2 w3"); empty array for docs under 3 tokens.
    * HOF formulation, kept as the executable spec for [[shingleSet]]. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Shared 60-bit hash: low 15 hex digits of md5, as a positive Long.
    * DuckDB computes the identical value as
    * `('0x' || substr(md5(x), 18, 15))::BIGINT`, which lets oracles
    * reproduce SimHash and fingerprints bit-for-bit. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 18, 15), 16, 10).cast("long")

  private val idx60: Column = sequence(lit(0), lit(59))

  /** 60-bit SimHash over a shingle-set column: bit i of the signature is the
    * sign of sum over shingles of (2*bit_i(hash60(shingle)) - 1).
    * Delegates to the native Catalyst expression (one compiled pass per
    * row); [[simhash60Hof]] keeps the original higher-order-function
    * formulation as an executable specification for cross-checking. */
  def simhash60(shingleSet: Column): Column = NativeExprs.simhash60(shingleSet)

  private[graft] def simhash60Hof(shingleSet: Column): Column = {
    val hashes = transform(shingleSet, s => hash60(s))
    val weights = aggregate(
      hashes,
      array_repeat(lit(0L), 60),
      (acc, h) =>
        zip_with(acc, idx60, (a, i) =>
          a + call_function("shiftright", h, i).bitwiseAND(lit(1L)) * 2 - 1))
    aggregate(
      zip_with(weights, idx60, (w, i) =>
        when(w > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** Deterministic MinHash permutation constants (a_i, b_i) from a fixed
    * splitmix-style generator — no runtime randomness, stable across runs. */
  def minhashPerms(n: Int): IndexedSeq[(Long, Long)] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until n).map { _ =>
      val a = java.lang.Long.remainderUnsigned(next(), MinhashP - 1) + 1
      val b = java.lang.Long.remainderUnsigned(next(), MinhashP)
      (a, b)
    }
  }

  /** MinHash signature (array of n minima) over a shingle-set column —
    * native expression, one compiled pass per row. Callers filter
    * `size(sh) > 0` first (empty sets yield degenerate signatures). */
  def minhashSig(shingleSet: Column, n: Int = 128): Column =
    NativeExprs.minhashSig(shingleSet, n)

  /** LSH band keys for a MinHash signature: `bands` hashes of `rowsPerBand`
    * consecutive signature entries, as array<struct<band:int, bkey:long>>.
    * Two docs are candidates iff they agree on all entries of some band. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      val slice = (0 until rowsPerBand).map(k =>
        element_at(sig, j * rowsPerBand + k + 1).cast("string"))
      struct(lit(j).as("band"), xxhash64(concat_ws(",", slice: _*)).as("bkey"))
    }: _*)

  /** SimHash band keys: split a 60-bit signature into `bands` equal bit
    * ranges. Pigeonhole: any pair with hamming distance < bands shares at
    * least one exact band — banding is lossless for thresholds <= bands-1. */
  def simhashBands(sim: Column, bands: Int): Column = {
    val width = 60 / bands
    val mask = (1L << width) - 1
    array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        call_function("shiftright", sim, lit(j * width)).bitwiseAND(lit(mask)).as("bkey"))
    }: _*)
  }

  /** Exact set-Jaccard between two array columns (assumed distinct) —
    * native single-pass hash-set expression. */
  def jaccard(a: Column, b: Column): Column = NativeExprs.arrayJaccard(a, b)

  /** Cosine similarity between two double-array columns, computed as
    * dot / sqrt(|a|^2 * |b|^2) — matches DuckDB's list_cosine_similarity.
    * Native expression with whole-stage codegen (fused loop). */
  def cosine(a: Column, b: Column): Column = NativeExprs.arrayCosine(a, b)

  /** Order-insensitive content fingerprint: md5 of the sorted distinct token
    * bag. Identical token-sets collide regardless of ordering/duplication. */
  def bagFingerprint(toks: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(toks))))
}
