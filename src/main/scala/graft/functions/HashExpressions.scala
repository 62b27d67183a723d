package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over [[HashKernels]].
  *
  * Each generates a direct static call inside whole-stage codegen — the
  * whole dedup hot path stays in one generated loop per partition (vs a
  * Scala UDF, which would break codegen and pay ser/de per row).
  */
object HashExpressions {

  /** array<string> shingles → array<long> k-permutation MinHash signature. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    require(k > 0 && k <= 256, s"minhash k=$k out of range 1..256 (coefficient table size)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** array<string> tokens → 64-bit SimHash. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.simhash64(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** string → mod-(2^61-1) FNV-1a hash — the fixed-width join key the
    * span-dedup inverted index shuffles instead of k-token window
    * strings. Same arithmetic as the MinHash pre-hash
    * ([[HashKernels.mod61]] of [[HashKernels.fnv1a64]]), so the DuckDB
    * oracle replays it with the existing fnv/HUGEINT fragment.
    */
  case class Fnv61(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fnv61"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.mod61(HashKernels.fnv1a64(input.asInstanceOf[UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashKernels.mod61(graft.functions.HashKernels.fnv1a64($c))")
    override protected def withNewChildInternal(newChild: Expression): Fnv61 =
      copy(child = newChild)
  }

  /** binary → mod-(2^61-1) FNV-1a over the RAW bytes — the m5 stub
    * signature. Byte-identical to [[Fnv61]] on ASCII payloads (where the
    * UTF-8 bytes ARE the payload bytes — the oracle corpus), but
    * semantically safe for arbitrary binary: no UTF8String round-trip,
    * whose unvalidated wrap of non-UTF8 bytes Spark happens to pass
    * through today but does not contract (r16 ADVICE).
    */
  case class Fnv61Bytes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fnv61_bytes"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.mod61(HashKernels.fnv1a64Bytes(input.asInstanceOf[Array[Byte]]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashKernels.mod61(graft.functions.HashKernels.fnv1a64Bytes($c))")
    override protected def withNewChildInternal(newChild: Expression): Fnv61Bytes =
      copy(child = newChild)
  }

  /** int cell index → value of an EMBEDDED long table (t17's CMS grid
    * rows): the table rides the expression as a codegen reference
    * object, NOT as literal array elements — at corpus-sized widths a
    * `typedlit` of w longs inflates every plan print and taxes every
    * Catalyst transform that walks the literal's children, while a
    * reference object ships once per task closure and costs the plan
    * tree one pointer (r16 VERDICT #3). Equality is reference-based
    * (fine: the grid is per-query state, never an exchange-reuse key).
    */
  case class LongTableLookup(child: Expression, table: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_cms_lookup"
    // floorMod, not a raw index: the only first-party caller already
    // feeds pmod(hash, w) so this is free there (JIT-predictable), but
    // the expression is public via cmsLookup — an out-of-range or
    // negative cell from a future caller must read a well-defined cell,
    // not throw ArrayIndexOutOfBoundsException from generated code
    // mid-task (r17 ADVICE)
    protected override def nullSafeEval(input: Any): Any =
      table(Math.floorMod(input.asInstanceOf[Int], table.length))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("cmsRow", table, "long[]")
      defineCodeGen(ctx, ev, c => s"$tbl[java.lang.Math.floorMod($c, $tbl.length)]")
    }
    override def toString: String = s"graft_cms_lookup($child, long[${table.length}])"
    override protected def withNewChildInternal(newChild: Expression): LongTableLookup =
      copy(child = newChild)
  }

  /** string → min Rabin–Karp window hash (winnowing fingerprint). */
  case class RollingFingerprint(child: Expression, window: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fingerprint"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.rollingFingerprint(input.asInstanceOf[UTF8String], window)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingFingerprint($c, $window)")
    override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
      copy(child = newChild)
  }

  /** (array<float>, array<float>) → cosine similarity in double. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"
    protected override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.cosineF($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** array<float> → Int bucket id under LSH table `table` with `nPlanes`
    * deterministic random hyperplanes.
    */
  case class HyperplaneSignature(child: Expression, table: Int, nPlanes: Int)
      extends UnaryExpression {
    require(nPlanes > 0 && nPlanes <= 30, s"nPlanes=$nPlanes out of range 1..30 (Int bucket bits)")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_hyperplane_sig"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.hyperplaneSig(input.asInstanceOf[ArrayData], table, nPlanes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.hyperplaneSig($c, $table, $nPlanes)")
    override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
      copy(child = newChild)
  }

  /** string → struct(total, n_distinct, sumsq, entropy_fp) — the t12
    * one-pass character-distribution kernel ([[HashKernels.charStats]]);
    * makes the char-stats operator a pure map-side projection.
    */
  case class CharStats(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("total", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("sumsq", LongType, nullable = false),
      StructField("entropy_fp", LongType, nullable = false)))
    override def prettyName: String = "graft_char_stats"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.charStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charStats($c)")
    override protected def withNewChildInternal(newChild: Expression): CharStats =
      copy(child = newChild)
  }

  /** array<string> tokens → array<string> space-joined n-grams
    * ([[HashKernels.ngramArray]]) — the shingle builder; callers gate
    * on size >= n (size < n returns an empty array, see the kernel's
    * carve-out scaladoc).
    */
  case class NgramArray(child: Expression, n: Int)
      extends UnaryExpression {
    require(n > 0, s"ngram n=$n must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_ngrams" // matches the registered SQL name
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.ngramArray(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.ngramArray($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): NgramArray =
      copy(child = newChild)
  }

  /** string → struct(s_de, s_en, …) per-language stopword hit counts
    * ([[HashKernels.langScores]]) — the t1/t2 kernel; field order is
    * [[HashKernels.stopwords]] order.
    */
  case class LangScores(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StructType(
      HashKernels.stopwords.map { case (lang, _) =>
        StructField(s"s_$lang", LongType, nullable = false)
      })
    override def prettyName: String = "graft_lang_scores"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.langScores(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.langScores($c)")
    override protected def withNewChildInternal(newChild: Expression): LangScores =
      copy(child = newChild)
  }

  /** array<string> tokens → struct(total, n_distinct) space-joined
    * n-gram repetition counts — the t6 kernel
    * ([[HashKernels.ngramStats]]); exact distinct, one pass.
    */
  case class NgramStats(child: Expression, n: Int)
      extends UnaryExpression {
    require(n > 0, s"ngram n=$n must be positive")
    override def dataType: DataType = StructType(Seq(
      StructField("total", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false)))
    override def prettyName: String = "graft_ngram_stats"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.ngramStats(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.ngramStats($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): NgramStats =
      copy(child = newChild)
  }

  /** array<float> → struct(n_dims, scale_fp, q_sum, q_l2, q_min, q_max)
    * — the whole a4 int8-quantization summary in one O(d) codegen pass
    * ([[HashKernels.int8Stats]]); consumed t12-style (struct alias +
    * field extraction, so the kernel runs once per row).
    */
  case class Int8Stats(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_dims", LongType, nullable = false),
      StructField("scale_fp", LongType, nullable = false),
      StructField("q_sum", LongType, nullable = true),
      StructField("q_l2", LongType, nullable = true),
      StructField("q_min", LongType, nullable = true),
      StructField("q_max", LongType, nullable = true)))
    override def prettyName: String = "graft_int8_stats"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.int8Stats(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.int8Stats($c)")
    override protected def withNewChildInternal(newChild: Expression): Int8Stats =
      copy(child = newChild)
  }

  /** array<float> → array<long> int8 code array (scale computed
    * in-kernel — [[HashKernels.int8Codes]]).
    */
  case class Int8Codes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "graft_int8_codes"
    protected override def nullSafeEval(input: Any): Any =
      HashKernels.int8Codes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.int8Codes($c)")
    override protected def withNewChildInternal(newChild: Expression): Int8Codes =
      copy(child = newChild)
  }

  /** (array<float>, array<float>) → raw cosine, NO zero-norm branch
    * ([[HashKernels.cosineRawF]] — zero vectors yield NaN like the
    * column twin); null on length mismatch or null element.
    */
  case class CosineRaw(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cosine_raw"
    protected override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.cosineRawF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r = graft.functions.HashKernels.cosineRawF($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      """)
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineRaw =
      copy(left = newLeft, right = newRight)
  }

  /** (array<float>, array<float>) → left-to-right-folded squared L2
    * ([[HashKernels.sqL2F]]); null on length mismatch or null element
    * (the zip_with+aggregate contract), hence the boxed-return codegen.
    */
  case class SqL2F(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sql2"
    protected override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.sqL2F(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r = graft.functions.HashKernels.sqL2F($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      """)
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqL2F =
      copy(left = newLeft, right = newRight)
  }

  /** (array<long>, array<long>) → count of equal non-null positions in
    * the overlap ([[HashKernels.longEqCount]] — the exact
    * zip_with+IF twin semantics: null elements and padded tails count 0,
    * the result is never null for non-null arrays).
    */
  case class LongEqCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_long_eq_count"
    protected override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.longEqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.longEqCount($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongEqCount =
      copy(left = newLeft, right = newRight)
  }

  /** (array<long>, array<long>) → exact BIGINT dot product; null on
    * length mismatch or null element (the zip_with+aggregate contract),
    * hence the explicit nullable + boxed-return codegen.
    */
  case class LongDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_long_dot"
    protected override def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Long ${ev.value}_r = graft.functions.HashKernels.longDot($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.longValue(); }
      """)
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
      copy(left = newLeft, right = newRight)
  }

  // --- Column API -----------------------------------------------------------
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def minhash(shingles: Column, k: Int): Column = col(MinHashSignature(expr(shingles), k))
  def fnv61(s: Column): Column = col(Fnv61(expr(s)))
  def fnv61Bytes(b: Column): Column = col(Fnv61Bytes(expr(b)))
  def cmsLookup(cell: Column, table: Array[Long]): Column =
    col(LongTableLookup(expr(cell), table))
  def simhash(tokens: Column): Column = col(SimHash64(expr(tokens)))
  def fingerprint(text: Column, window: Int): Column = col(RollingFingerprint(expr(text), window))
  def cosine(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))
  def hyperplaneSig(emb: Column, table: Int, nPlanes: Int): Column =
    col(HyperplaneSignature(expr(emb), table, nPlanes))
  def charStats(text: Column): Column = col(CharStats(expr(text)))
  def ngrams(tokens: Column, n: Int): Column = col(NgramArray(expr(tokens), n))
  def langScores(text: Column): Column = col(LangScores(expr(text)))
  def ngramStats(tokens: Column, n: Int): Column = col(NgramStats(expr(tokens), n))
  def int8Stats(vec: Column): Column = col(Int8Stats(expr(vec)))
  def int8Codes(vec: Column): Column = col(Int8Codes(expr(vec)))
  def longDot(a: Column, b: Column): Column = col(LongDot(expr(a), expr(b)))
  def sqL2F(a: Column, b: Column): Column = col(SqL2F(expr(a), expr(b)))
  def cosineRaw(a: Column, b: Column): Column = col(CosineRaw(expr(a), expr(b)))
  def longEqCount(a: Column, b: Column): Column = col(LongEqCount(expr(a), expr(b)))
}
