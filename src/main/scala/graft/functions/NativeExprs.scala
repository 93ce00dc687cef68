// Lives under org.apache.spark.sql so the expressions can use the
// private[sql] ExpectsInputTypes/AbstractDataType/ExpressionUtils surface —
// the standard packaging for out-of-tree native Catalyst expressions.
package org.apache.spark.sql.graft

import java.security.MessageDigest

import graft.functions.TextFunctions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The first implementations used Catalyst higher-order functions
  * (aggregate/zip_with/transform); correct, but HOF lambdas evaluate
  * interpreted per element — sf0.1 bench showed 80-110 s per dedup query,
  * almost all of it lambda-walking. These expressions do the same math in
  * one compiled call per row (prompt preference order (b): native
  * Expression > UDF): 10-100x on the hot path, identical results.
  */
object NativeExprs {

  /** Cosine similarity of two double arrays: dot / sqrt(|a|² * |b|²),
    * sequential accumulation — bit-identical to both the HOF formulation
    * and DuckDB's list_cosine_similarity. Whole-stage-codegen'd: emits a
    * fused loop straight into the generated Java. */
  case class ArrayCosine(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "array_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / math.sqrt(na * nb)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
          |int $n = Math.min($a.numElements(), $b.numElements());
          |double $dot = 0.0, $na = 0.0, $nb = 0.0;
          |for (int $i = 0; $i < $n; $i++) {
          |  double $xv = $a.getDouble($i);
          |  double $yv = $b.getDouble($i);
          |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          |}
          |${ev.value} = $dot / Math.sqrt($na * $nb);
        """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Distinct token n-gram shingles of a text column in one compiled pass:
    * trim → split on whitespace runs → join n consecutive tokens with a
    * single space → first-occurrence-distinct. Byte-level UTF-8 scan
    * (ASCII whitespace only — matching Java/RE2 `\s`), zero intermediate
    * arrays. Replaces the trim/split/filter/transform/array_distinct HOF
    * chain that cost ~12 s per evaluation at sf0.1. */
  case class TokenShingles(child: Expression, n: Int = 3)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "token_shingles"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(input: Any): Any =
      NativeEval.tokenShingles(input.asInstanceOf[UTF8String], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.tokenShingles($c, $n);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature over a string array: nPerms minima of (a*h+b) mod P
    * permutations of a 64-bit base hash folded into [0, P). One compiled
    * pass per row (the HOF version walked 128 x |set| lambda evals). Base
    * hash is engine-internal (candidates are exactly verified downstream). */
  case class MinHashSig(child: Expression, nPerms: Int = 128)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "minhash_sig"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(input: Any): Any =
      NativeEval.minhashSig(input.asInstanceOf[ArrayData], nPerms)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.minhashSig($c, $nPerms);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 60-bit SimHash over a string array, using the shared md5-low-60-bit
    * hash — bit-identical to the DuckDB oracle's SQL formulation (and to
    * the original HOF expression), one compiled pass per row. */
  case class SimHash60(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "simhash60"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(input: Any): Any =
      NativeEval.simhash60(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.simhash60($c);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 96-bit SimHash over a string array — the WIDE form of [[SimHash60]]
    * (round-13, the scale path the 60-bit entry's scaladoc names): two
    * 48-bit halves [hi, lo] from md5 hex chars 1–12 and 13–24, majority
    * vote over all 96 positions. 4 pigeonhole bands of 24 bits stay
    * LOSSLESS for hamming <= 3 while dividing decorrelated band
    * collisions by 2^14 vs the 60-bit form's 10-bit bands (~n²/2²⁴ per
    * band instead of ~n²/2¹⁰) — the collision wall moves from ~10⁶ to
    * ~10⁸ documents. Bit-identical to the DuckDB oracle's
    * ('0x'||substr(md5(s),1,12))::BIGINT / substr(...,13,12)
    * formulation. */
  case class SimHash96(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "simhash96"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(input: Any): Any =
      NativeEval.simhash96(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.simhash96($c);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Random-hyperplane LSH band keys for cosine similarity (Charikar,
    * STOC 2002): bit (i) = sign of v · h_i with h_i a fixed ±1 hyperplane
    * (deterministic splitmix-derived), grouped into `bands` keys of
    * `rowsPerBand` bits. Two vectors land in the same band bucket with
    * probability (1 - θ/π)^rowsPerBand — candidates are exactly verified
    * downstream, so the signature is engine-internal. */
  case class CosineBandKeys(child: Expression, bands: Int = 32, rowsPerBand: Int = 4)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "cosine_band_keys"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback.
    // The plane-matrix cache moved with it (keyed by (bands, rowsPerBand,
    // dims) in a small concurrent map, same bit-identical planeSign
    // derivation — see NativeEval.planesFor).
    override def nullSafeEval(input: Any): Any =
      NativeEval.cosineBandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.cosineBandKeys($c, $bands, $rowsPerBand);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowing document fingerprint (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003): rolling hashes of token k-grams; in every window of w
    * consecutive hashes keep the minimum (rightmost on ties) — a
    * position-robust fingerprint subset with guaranteed coverage of any
    * match of length >= w + k - 1 tokens. Returns the sorted distinct
    * selected hashes. */
  case class WinnowFingerprint(child: Expression, k: Int = 4, w: Int = 4,
                               prime: Long = 0L)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "winnow_fingerprint"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(input: Any): Any =
      NativeEval.winnowFingerprint(input.asInstanceOf[ArrayData], k, w, prime)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.winnowFingerprint($c, $k, $w, ${prime}L);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Exact set-Jaccard of two string arrays (inputs assumed distinct), one
    * hash-set pass per pair instead of array_intersect + two sizes. */
  case class ArrayJaccard(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "array_jaccard"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeEval.arrayJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.arrayJaccard($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** |a ∩ b| of two string arrays (inputs assumed distinct) as BIGINT —
    * the integer-exact building block for jaccard-ppm gate outputs: one
    * hash-set pass per pair instead of array_intersect + size (which
    * materializes the intersection array per row on the verify hot path). */
  case class ArrayIntersectSize(left: Expression, right: Expression,
                                evalOnce: Boolean = false)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "array_intersect_size"

    // evalOnce marks the expression NON-DETERMINISTIC (guide §4.4): the
    // value is pure — only the OPTIMIZER contract changes. Without it,
    // the dedup verify shape `withColumn("i", ...).filter(i*5 >= u*3)`
    // gets its filter pushed INTO the preceding join condition with the
    // intersect substituted inline — evaluated twice per candidate pair
    // in the join condition and a third time in the surviving project
    // (measured: q_dedup_jaccard_prefix 1.90 -> 2.96 s when the r16
    // codegen conversion fused that triple-eval into one WSC span).
    // Marked once-per-row, the alias cannot be duplicated or pushed, so
    // every candidate pays the hash-set pass exactly once.
    override lazy val deterministic: Boolean = !evalOnce && left.deterministic && right.deterministic

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeEval.arrayIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.arrayIntersectSize($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Exact integer squared L2 between two BIGINT arrays — the PQ
    * subspace-assignment distance. Pure long arithmetic in one compiled
    * loop (replaces the zip_with/aggregate HOF chain); codegen'd. */
  case class ArrayLongSqL2(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "array_long_sq_l2"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
          |int $n = Math.min($a.numElements(), $b.numElements());
          |long $acc = 0L;
          |for (int $i = 0; $i < $n; $i++) {
          |  long $d = $a.getLong($i) - $b.getLong($i);
          |  $acc += $d * $d;
          |}
          |${ev.value} = $acc;
        """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** ALL token n-grams of a text column in one compiled pass, IN TOKEN
    * ORDER and WITH multiplicity — the non-distinct sibling of
    * [[TokenShingles]] (same byte-level tokenizer: trim → split on
    * ASCII-whitespace runs, inner whitespace runs of a joined n-gram
    * normalized to one space). Replaces the
    * tokens → slice/zip_with/concat_ws HOF chain of the bigram
    * extractor (guide §4: interpreted lambda per element); fewer than n
    * tokens yields an empty array (explode then emits no rows, matching
    * the previous `size(t) >= 2` filter). */
  case class TokenNgrams(child: Expression, n: Int = 2)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "token_ngrams"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback
    override def nullSafeEval(input: Any): Any =
      NativeEval.tokenNgrams(input.asInstanceOf[UTF8String], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = org.apache.spark.sql.graft.NativeEval.tokenNgrams($c, $n);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Single-pass per-row repetition statistics over a token array:
    * struct(top_tok_count, rep_tokens, top_bigram_count) — the Gopher
    * repetition-rule numerators. Replaces the per-row HOF formulation
    * `transform(array_distinct(t), x -> size(filter(t, y -> y = x)))`
    * (kept as the executable spec in
    * TextAnalysis.repetitionColsPerRowHof), which is O(n_tokens²)
    * interpreted-lambda evals per document — measured 2.0-2.3 s of
    * q_stream_repetition's addBatch at sf0.1 (guide §4: no non-codegen
    * Scala lambdas in the hot path). Here: one hash-count pass over the
    * tokens and one over the adjacent bigrams, O(n) per row, identical
    * integer outputs (token equality is binary UTF8, exactly Catalyst's
    * string `=`; the bigram key is the same "a b" concat_ws join —
    * unambiguous because tokens are whitespace-split and so never
    * contain a space themselves).
    *
    * Empty input arrays return NULL (the HOF form's array_max(empty) is
    * null there too); callers filter `size(t) > 0` first, matching the
    * explode semantics of the batch shuffle form. */
  case class RepetitionStats(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = StructType(Seq(
      StructField("top_tok_count", LongType, nullable = false),
      StructField("rep_tokens", LongType, nullable = false),
      StructField("top_bigram_count", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "repetition_stats"

    // body in NativeEval (round-16): shared by interpreted eval and the
    // generated code's one-static-call-per-row path — no CodegenFallback.
    // NativeEval.repetitionStats returns null for an empty token array,
    // so the generated code re-checks the result for null.
    override def nullSafeEval(input: Any): Any =
      NativeEval.repetitionStats(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
          |${ev.value} = org.apache.spark.sql.graft.NativeEval.repetitionStats($c);
          |${ev.isNull} = ${ev.value} == null;
        """.stripMargin)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Single-pass ASCII character-class counts over a string:
    * struct(n_alpha, n_digit, n_ws) = the number of codepoints matching
    * [A-Za-z], [0-9], [ \t\n\r] respectively. Replaces three full-string
    * `regexp_replace(text, cls, "")` rewrites whose only purpose was a
    * length delta (guide §4: the rewrites allocate three stripped copies
    * of every document per row). Exactness: all three classes are pure
    * ASCII, and ASCII bytes never occur inside UTF-8 multi-byte
    * sequences, so counting matching BYTES equals counting matching
    * CODEPOINTS — identical to char_length(text) −
    * char_length(regexp_replace(text, cls, "")). Codegen'd: one fused
    * byte loop per row. */
  case class CharClassCounts(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_alpha", LongType, nullable = false),
      StructField("n_digit", LongType, nullable = false),
      StructField("n_ws", LongType, nullable = false)))
    override def prettyName: String = "char_class_counts"

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var a = 0L; var d = 0L; var w = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) a += 1L
        else if (b >= '0' && b <= '9') d += 1L
        else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') w += 1L
        i += 1
      }
      InternalRow(a, d, w)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val a = ctx.freshName("a")
        val d = ctx.freshName("d")
        val w = ctx.freshName("w")
        s"""
          |byte[] $bytes = $c.getBytes();
          |long $a = 0L, $d = 0L, $w = 0L;
          |for (int $i = 0; $i < $bytes.length; $i++) {
          |  byte $b = $bytes[$i];
          |  if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z')) $a++;
          |  else if ($b >= '0' && $b <= '9') $d++;
          |  else if ($b == ' ' || $b == '\\t' || $b == '\\n' || $b == '\\r') $w++;
          |}
          |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          |  new Object[] { $a, $d, $w });
        """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-level wrappers

  /** Spark's own bloom-filter sketch aggregate (the engine uses it for
    * runtime shuffle pruning; here it powers the decontamination
    * prefilter). Input must be an xxhash64 LongType column; the sketch
    * size is fixed by (expectedItems, numBits) — corpus-independent. */
  def bloomFilterAgg(h: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(h),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits),
        0, 0).toAggregateExpression())

  /** Probe of [[bloomFilterAgg]]'s sketch: no false negatives, so an
    * exact verify join downstream restores exact semantics. */
  def bloomMightContain(bloom: Column, h: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloom), ExpressionUtils.expression(h)))

  def tokenShingles(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(TokenShingles(ExpressionUtils.expression(text), n))
  def repetitionStats(toks: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(toks)))
  def charClassCounts(text: Column): Column =
    ExpressionUtils.column(CharClassCounts(ExpressionUtils.expression(text)))
  def tokenNgrams(text: Column, n: Int = 2): Column =
    ExpressionUtils.column(TokenNgrams(ExpressionUtils.expression(text), n))
  def arrayCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayCosine(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def minhashSig(sh: Column, nPerms: Int = 128): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(sh), nPerms))
  def simhash60(sh: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(sh)))
  def simhash96(sh: Column): Column =
    ExpressionUtils.column(SimHash96(ExpressionUtils.expression(sh)))
  def arrayJaccard(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayJaccard(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def arrayIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayIntersectSize(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  /** [[arrayIntersectSize]] with the once-per-row optimizer barrier —
    * use when the result feeds BOTH a filter and a projection (the dedup
    * verify shape), where the default lets Catalyst clone the evaluation
    * into the join condition (guide §4.4). */
  def arrayIntersectSizeOnce(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayIntersectSize(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), evalOnce = true))
  def winnowFingerprint(toks: Column, k: Int = 4, w: Int = 4,
                        prime: Long = 0L): Column =
    ExpressionUtils.column(WinnowFingerprint(ExpressionUtils.expression(toks), k, w, prime))
  def cosineBandKeys(v: Column, bands: Int = 32, rowsPerBand: Int = 4): Column =
    ExpressionUtils.column(CosineBandKeys(ExpressionUtils.expression(v), bands, rowsPerBand))
  def arrayLongSqL2(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayLongSqL2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Static-callable evaluation bodies for the text-path native expressions
  * (round-16, VERDICT-r15 #4): a top-level Scala object compiles to a class
  * with STATIC forwarders, so generated (Janino) code can call these
  * directly — `doGenCode` on the expressions emits one static call per row
  * instead of the CodegenFallback boxing path (references-array lookup +
  * interpreted `eval(InternalRow)` per row, and an INPUT_ROW
  * materialization requirement inside whole-stage codegen). The
  * interpreted `nullSafeEval` paths delegate to the same methods, so both
  * execution modes share one body and cannot drift. */
object NativeEval {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Token boundaries of a UTF-8 byte string (ASCII-whitespace runs as
    * separators, matching Java/RE2 `\s`): packed [s0,e0,s1,e1,...] plus
    * the token count. */
  private def tokenBounds(bytes: Array[Byte]): (Array[Int], Int) = {
    var cap = 32
    var arr = new Array[Int](cap * 2)
    var nTok = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        val s = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        if (nTok == cap) { cap *= 2; arr = java.util.Arrays.copyOf(arr, cap * 2) }
        arr(2 * nTok) = s
        arr(2 * nTok + 1) = i
        nTok += 1
      }
    }
    (arr, nTok)
  }

  /** Tokens t..t+n-1 joined with single spaces (inner whitespace runs of
    * the raw span normalized to one ' ' — byte-identical to the previous
    * in-class loop). */
  private def joinedNgram(bytes: Array[Byte], bounds: Array[Int],
                          t: Int, n: Int): UTF8String = {
    val start = bounds(2 * t)
    val end = bounds(2 * (t + n - 1) + 1)
    val buf = new Array[Byte](end - start)
    var w = 0
    var k = start
    var lastWs = false
    while (k < end) {
      val b = bytes(k)
      if (isWs(b)) {
        if (!lastWs) { buf(w) = ' '; w += 1 }
        lastWs = true
      } else { buf(w) = b; w += 1; lastWs = false }
      k += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(buf, w))
  }

  /** [[NativeExprs.TokenNgrams]] body: all order-preserving n-grams with
    * multiplicity; n = 1 is the plain whitespace tokenizer. */
  def tokenNgrams(input: UTF8String, n: Int): ArrayData = {
    val bytes = input.getBytes
    val (bounds, nTok) = tokenBounds(bytes)
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var t = 0
    while (t <= nTok - n) {
      out(t) = joinedNgram(bytes, bounds, t, n)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** [[NativeExprs.TokenShingles]] body: first-occurrence-distinct n-gram
    * shingle set. */
  def tokenShingles(input: UTF8String, n: Int): ArrayData = {
    val bytes = input.getBytes
    val (bounds, nTok) = tokenBounds(bytes)
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t <= nTok - n) {
      seen.add(joinedNgram(bytes, bounds, t, n))
      t += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  private val ngramSep = UTF8String.fromString(" ")

  /** [[NativeExprs.RepetitionStats]] body; returns null for an empty
    * token array (the HOF spec's array_max(empty) is null there too). */
  def repetitionStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      counts.merge(arr.getUTF8String(i), 1L, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var rep = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c >= 2L) rep += c
    }
    var topBg = 0L
    if (n >= 2) {
      val bg = new java.util.HashMap[UTF8String, Long](n * 2)
      var j = 0
      var prev = arr.getUTF8String(0)
      while (j < n - 1) {
        val next = arr.getUTF8String(j + 1)
        bg.merge(UTF8String.concatWs(ngramSep, prev, next), 1L, (a, b) => a + b)
        prev = next
        j += 1
      }
      val bit = bg.values().iterator()
      while (bit.hasNext) {
        val c = bit.next()
        if (c > topBg) topBg = c
      }
    }
    InternalRow(top, rep, topBg)
  }

  private val permsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private def permsFor(nPerms: Int): Array[(Long, Long)] =
    permsCache.computeIfAbsent(nPerms, n => TextFunctions.minhashPerms(n).toArray)

  /** [[NativeExprs.MinHashSig]] body. */
  def minhashSig(arr: ArrayData, nPerms: Int): ArrayData = {
    val perms = permsFor(nPerms)
    val P = TextFunctions.MinhashP
    val m = arr.numElements()
    val sig = Array.fill(nPerms)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val s = arr.getUTF8String(j)
      // splitmix-style avalanche of a 31+31 polynomial fold
      var h = 1125899906842597L
      val bytes = s.getBytes
      var k = 0
      while (k < bytes.length) { h = h * 31 + bytes(k); k += 1 }
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      val base = java.lang.Long.remainderUnsigned(h, P)
      var p = 0
      while (p < nPerms) {
        val (a, b) = perms(p)
        val v = (a * base + b) % P
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** [[NativeExprs.SimHash60]] body. */
  def simhash60(arr: ArrayData): Long = {
    val m = arr.numElements()
    val weights = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    var j = 0
    while (j < m) {
      md.reset()
      val d = md.digest(arr.getUTF8String(j).getBytes)
      // low 60 bits of the hex digest = low nibble of byte 8 ++ bytes 9..15
      var h = (d(8) & 0x0FL)
      var k = 9
      while (k < 16) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      var i = 0
      while (i < 60) {
        weights(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 60) {
      if (weights(i) > 0) sim |= 1L << i
      i += 1
    }
    sim
  }

  /** [[NativeExprs.SimHash96]] body. */
  def simhash96(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val weights = new Array[Int](96)
    val md = MessageDigest.getInstance("MD5")
    var j = 0
    while (j < m) {
      md.reset()
      val d = md.digest(arr.getUTF8String(j).getBytes)
      // hex chars 1-12 = digest bytes 0-5 (hi48); 13-24 = bytes 6-11 (lo48)
      var hi = 0L
      var k = 0
      while (k < 6) { hi = (hi << 8) | (d(k) & 0xFFL); k += 1 }
      var lo = 0L
      while (k < 12) { lo = (lo << 8) | (d(k) & 0xFFL); k += 1 }
      // positions 0-47 vote from lo, 48-95 from hi — the exact layout
      // the oracle's range(0,96) CASE states
      var i = 0
      while (i < 48) {
        weights(i) += (if (((lo >>> i) & 1L) == 1L) 1 else -1)
        weights(i + 48) += (if (((hi >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      j += 1
    }
    var shi = 0L
    var slo = 0L
    var i = 0
    while (i < 48) {
      if (weights(i) > 0) slo |= 1L << i
      if (weights(i + 48) > 0) shi |= 1L << i
      i += 1
    }
    new GenericArrayData(Array(shi, slo))
  }

  /** [[NativeExprs.WinnowFingerprint]] body. */
  def winnowFingerprint(arr: ArrayData, k: Int, w: Int, prime: Long): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // per-token hash, then k-gram rolling combination. prime == 0 is
    // the production 64-bit wrapping hash; prime > 0 swaps in a mod-p
    // codepoint polynomial (same winnowing selection loop) — the
    // cross-engine-expressible twin the q_text_winnow gate uses,
    // because DuckDB BIGINT arithmetic ERRORS on overflow and cannot
    // state wrapping 64-bit multiplies
    val tok = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = if (prime > 0) 0L else 1125899906842597L
      if (prime > 0) {
        val s = arr.getUTF8String(i).toString
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          h = (h * 31 + cp) % prime
          ci += Character.charCount(cp)
        }
      } else {
        val bytes = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < bytes.length) { h = h * 31 + bytes(j); j += 1 }
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      }
      tok(i) = h
      i += 1
    }
    val nGrams = n - k + 1
    val gram = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = if (prime > 0) (h * 131 + tok(i + j)) % prime
            else h * 0x100000001B3L + tok(i + j)
        j += 1
      }
      gram(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var min = 0
      i = 1
      while (i < nGrams) { if (gram(i) <= gram(min)) min = i; i += 1 }
      selected.add(gram(min))
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var min = start
        i = start + 1
        while (i < start + w) { if (gram(i) <= gram(min)) min = i; i += 1 }
        selected.add(gram(min))
        start += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** [[NativeExprs.ArrayJaccard]] body. */
  def arrayJaccard(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements(); val ny = y.numElements()
    val set = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < ny) { if (set.contains(y.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (nx + ny - inter)
  }

  /** [[NativeExprs.ArrayIntersectSize]] body. */
  def arrayIntersectSize(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements(); val ny = y.numElements()
    val set = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0L
    i = 0
    while (i < ny) { if (set.contains(y.getUTF8String(i))) inter += 1; i += 1 }
    inter
  }

  private def planeSign(bit: Int, dim: Int): Double = {
    var z = (bit.toLong << 32 | dim.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  // The plane matrix is a pure function of (bands, rowsPerBand, dims):
  // built once per (bands, rowsPerBand, dims) key in a concurrent map
  // (previously once per expression instance) instead of re-deriving the
  // splitmix sign for every (bit, dim) of every row. Values are
  // bit-identical to planeSign, so signatures (and the gated LSH output)
  // are unchanged.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  private def planesFor(bands: Int, rowsPerBand: Int, n: Int): Array[Double] =
    planeCache.computeIfAbsent((bands, rowsPerBand, n), key => {
      val nBits = key._1 * key._2
      val m = new Array[Double](nBits * n)
      var bit = 0
      while (bit < nBits) {
        var j = 0
        while (j < n) { m(bit * n + j) = planeSign(bit, j); j += 1 }
        bit += 1
      }
      m
    })

  /** [[NativeExprs.CosineBandKeys]] body. */
  def cosineBandKeys(v: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = v.numElements()
    val nBits = bands * rowsPerBand
    val planes = planesFor(bands, rowsPerBand, n)
    val keys = new Array[Long](bands)
    var bit = 0
    while (bit < nBits) {
      val base = bit * n
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getDouble(j) * planes(base + j); j += 1 }
      if (dot > 0) keys(bit / rowsPerBand) |= 1L << (bit % rowsPerBand)
      bit += 1
    }
    new GenericArrayData(keys)
  }
}
