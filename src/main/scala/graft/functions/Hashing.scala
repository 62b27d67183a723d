package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hash kernels for the dedup / fingerprint operators.
  *
  * All standard public constructions: FNV-1a 64, polynomial MinHash over a
  * Mersenne prime (2^61-1), SimHash (Charikar), Rabin–Karp rolling hash.
  * Kept as static JVM methods so the Catalyst expressions in
  * [[HashExpressions]] can call them from generated code (whole-stage
  * codegen emits a direct static call — no boxing, no UDF serialization).
  *
  * Reference semantics: deep-field has no content hashing; these back the
  * training-data dedup operators the brief adds on top (SURVEY.md §2.3).
  */
object HashKernels {
  final val MersennePrime: Long = (1L << 61) - 1

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: UTF8String): Long = fnv1a64Bytes(s.getBytes)

  def fnv1a64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64String(s: String): Long =
    fnv1a64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** (x*y) mod 2^61-1 for 0 <= x,y < 2^61-1, via 128-bit product split.
    * 2^64 ≡ 8 (mod p), so hi*2^64 + lo ≡ (hi<<3) + (lo>>>61) + (lo&p).
    */
  def mulMod61(x: Long, y: Long): Long = {
    val hi = Math.multiplyHigh(x, y)
    val lo = x * y
    var r = (hi << 3) + (lo >>> 61) + (lo & MersennePrime)
    while (r >= MersennePrime) r -= MersennePrime
    r
  }

  /** Reduce an arbitrary long to [0, p). */
  def mod61(x: Long): Long = {
    var r = (x & MersennePrime) + (x >>> 61)
    while (r >= MersennePrime) r -= MersennePrime
    r
  }

  // MinHash coefficients a_i (odd, < p) and b_i, derived from FNV so every
  // executor materializes identical values with zero driver state shipped.
  private[this] val maxK = 256
  private[this] lazy val coefA: Array[Long] =
    Array.tabulate(maxK)(i => mod61(fnv1a64String(s"graft-minhash-a-$i")) | 1L)
  private[this] lazy val coefB: Array[Long] =
    Array.tabulate(maxK)(i => mod61(fnv1a64String(s"graft-minhash-b-$i")))

  /** The permutation coefficients, publicly readable: they are operator
    * CONSTANTS (pure FNV derivations of their index), and an external
    * oracle recomputing the signature needs their values — the same way
    * the text oracles embed the stopword lists.
    */
  def minhashA(j: Int): Long = coefA(j)
  def minhashB(j: Int): Long = coefB(j)

  /** k-permutation MinHash signature of a string set: one pass over the
    * shingles, k running minima — no per-shingle shuffle, no O(n*k) rows.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = mod61(fnv1a64(shingles.getUTF8String(i)))
        var j = 0
        while (j < k) {
          val v = mulMod61(coefA(j), h) + coefB(j)
          val r = if (v >= MersennePrime) v - MersennePrime else v
          if (r < sig(j)) sig(j) = r
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Charikar SimHash-64 with token-frequency weights (each occurrence
    * votes, matching the classic near-dup construction).
    */
  def simhash64(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Rabin–Karp rolling hash (base 257 mod 2^61-1) over UTF-8 bytes;
    * returns the MIN window hash — a winnowing-style document fingerprint
    * robust to local edits. Shorter-than-window text hashes whole.
    */
  def rollingFingerprint(text: UTF8String, window: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val base = 257L
    if (n == 0) return 0L
    if (n <= window) return mod61(fnv1a64Bytes(bytes))
    // base^(window-1) mod p
    var pow = 1L
    var e = 0
    while (e < window - 1) { pow = mulMod61(pow, base); e += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = mod61(mulMod61(h, base) + (bytes(i) & 0xffL)); i += 1 }
    var min = h
    while (i < n) {
      val out = (bytes(i - window) & 0xffL)
      h = mod61(h + MersennePrime - mulMod61(out, pow)) // subtract outgoing
      h = mod61(mulMod61(h, base) + (bytes(i) & 0xffL))
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Exact cosine over two float vectors, accumulated in double (left
    * fold, index order — bit-identical across engines that do the same).
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // --- random-hyperplane LSH ------------------------------------------------
  // Plane component (table, plane, dim j) is a pure function of its indices,
  // so buckets are reproducible on every executor with no shipped state.
  def planeComponent(table: Int, plane: Int, j: Int): Double =
    ((java.lang.Long.remainderUnsigned(
      fnv1a64String(s"graft-plane-t$table-p$plane-d$j"), 2001L)) - 1000L) / 1000.0

  private[this] val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(table: Int, nPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((table, nPlanes, dim), _ =>
      Array.tabulate(nPlanes, dim)((p, j) => planeComponent(table, p, j)))

  /** Sign-bit signature of `emb` against `nPlanes` deterministic
    * hyperplanes of LSH table `table` → an Int bucket id.
    */
  def hyperplaneSig(emb: ArrayData, table: Int, nPlanes: Int): Int = {
    val dim = emb.numElements()
    val pl = planes(table, nPlanes, dim)
    var bits = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var j = 0
      val row = pl(p)
      while (j < dim) { dot += emb.getFloat(j).toDouble * row(j); j += 1 }
      if (dot >= 0.0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  /** One-pass per-document character-distribution statistics:
    * (total, n_distinct, Σn², entropy_fp) over CODE POINTS — the t12
    * kernel. Replaces an explode-one-row-per-character Generate + two
    * aggregations with a single in-loop histogram, so t12 becomes a
    * map-only projection (no shuffle at all; the histogram is bounded
    * by the alphabet, not the document).
    *
    * Bit-parity contract with the previous column formulation (and so
    * with the committed DuckDB oracle): `total` is the code-point count
    * (Spark's length()/split("") semantics), Σn and Σn² are exact
    * BIGINTs, and each Shannon term quantizes to the 1e6 grid through
    * the IDENTICAL double sequence — `-p * StrictMath.log(p) /
    * StrictMath.log(2.0) * 1e6 + 0.5`, floored. StrictMath, not Math:
    * Spark's own `log` codegen calls java.lang.StrictMath.log
    * (UnaryLogExpression), and Math.log is allowed to differ by 1 ulp
    * under intrinsics — this kernel must reproduce the engine's bits.
    * The BIGINT term sum is order-independent, so the histogram's
    * iteration order cannot move the result.
    */
  def charStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    // allocation-free fast path for the ASCII range (the dominant case
    // in a pretraining corpus: ~100 distinct chars per doc would
    // otherwise box an Integer + allocate a long[1] cell each — per
    // ROW); code points >= 128 fall back to a map allocated lazily
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, Array[Long]] = null
    var total = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Array[Long]]()
        val slot = wide.get(cp)
        if (slot == null) wide.put(cp, Array(1L)) else slot(0) += 1
      }
    }
    var sumsq = 0L
    var entFp = 0L
    var distinct = 0L
    def term(n: Long): Unit = {
      distinct += 1
      sumsq += n * n
      val p = n.toDouble / total.toDouble
      entFp += math.floor(-p * StrictMath.log(p) / StrictMath.log(2.0)
        * 1000000.0 + 0.5).toLong
    }
    var c = 0
    while (c < 128) { if (ascii(c) > 0) term(ascii(c)); c += 1 }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) term(it.next()(0))
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinct, sumsq, entFp))
  }

  /** Canonical per-language stopword lists for the t1 language-ID
    * heuristic (alphabetical language order = the tie-break order).
    * Lives here so the one-pass [[langScores]] kernel and the Column
    * API ([[graft.operators.TextAnalysis.stopwords]] aliases this) can
    * never drift.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有"))

  // word → bitmask of the languages whose list contains it ("la" is
  // both es and fr; "de"/"en" are words in other languages' lists)
  private[this] val stopMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    stopwords.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) =>
          Integer.valueOf(a.intValue() | b.intValue()))
      }
    }
    m
  }

  /** One-pass per-language stopword hit counts over the single-space
    * token split — the t1/t2 kernel. Exactly
    * `size(filter(split(text, " "), t => t.isin(words)))` per language,
    * in one token scan instead of one interpreted higher-order filter
    * per language (split(" ") matches the literal space; empty tokens
    * from runs of spaces are never stopwords, so they cannot affect
    * the counts).
    */
  def langScores(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val counts = new Array[Long](stopwords.size)
    var start = 0
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      if (end > start) {
        val m = stopMask.get(s.substring(start, end))
        if (m != null) {
          var mask = m.intValue()
          while (mask != 0) {
            val i = Integer.numberOfTrailingZeros(mask)
            counts(i) += 1
            mask &= mask - 1
          }
        }
      }
      start = end + 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      counts.map(c => c: Any))
  }

  /** Space-joined word n-gram array of a token array — the shingle
    * builder shared by the dedup family (d2/d7/d8/d9 explode it, d3
    * minhashes its distinct form). Bit-parity contract with the column
    * twin the DuckDB oracles replay:
    * `transform(sequence(0, size(t) - n), i -> concat_ws(' ',
    * slice(t, i + 1, n)))` for the size >= n branch only, including
    * concat_ws's null-skip. Documented carve-out for n > size: the
    * twin there evaluates sequence(0, negative) — a DESCENDING range
    * whose shrinking prefix windows eventually hit slice's
    * non-positive-start error — while the kernel returns an EMPTY
    * array. Every repo caller gates with filter(size >= n), so the
    * branch never carries data internally; the empty array exists so
    * that ungated ad-hoc calls through the registered `graft_ngrams`
    * SQL function degrade to zero shingles instead of failing the
    * job. One pass with a reused StringBuilder instead of one
    * interpreted slice+concat per gram (higher-order functions are
    * CodegenFallback).
    */
  // ONE definition of the gram-window text shared by ngramArray and
  // ngramStats (r13 review: two hand-rolled copies could drift apart
  // and silently break the d2/d7/d8/d9-vs-t6 oracle parity): decode the
  // token array once, then concat_ws(" ", window) semantics — null
  // tokens skipped, single-space separator between surviving parts.
  private def decodeTokens(tokens: ArrayData): Array[String] = {
    val m = tokens.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).toString
      i += 1
    }
    toks
  }

  private def joinWindow(toks: Array[String], start: Int, n: Int,
                         sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var first = true
    var j = 0
    while (j < n) {
      val t = toks(start + j)
      if (t != null) {
        if (!first) sb.append(' ')
        sb.append(t)
        first = false
      }
      j += 1
    }
    sb.toString
  }

  def ngramArray(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    // m < n: the column twin's sequence(0, m - n) runs DOWNWARD and its
    // slice(t, i + 1, n) errors at i = -1, so no gated caller can reach
    // this branch with data; return [] so the public SQL surface is
    // total (see the contract carve-out in the scaladoc above).
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val toks = decodeTokens(tokens)
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= m) {
      out(i) = UTF8String.fromString(joinWindow(toks, i, n, sb))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass within-document n-gram repetition counts:
    * (total, distinct) over space-joined token n-grams — the t6 kernel.
    * Replaces a column formulation that materialized the gram array via
    * transform(sequence, slice+concat_ws) and ran array_distinct over
    * it once per consuming output column (7 s for the whole corpus at
    * sf0.1 vs ~0.4 s here). EXACT distinct (a HashSet of the joined
    * gram strings, never a hash-only sketch — the DuckDB oracle
    * list_distinct's the same strings and a collision would undercount).
    * Parity contract: total = max(m-(n-1), 0); m < n ⇒ distinct 0;
    * gram text is concat_ws(" ", ...) of the window, which SKIPS null
    * tokens (whitespace-split tokens are never null, but the twin's
    * semantics are mirrored regardless).
    */
  def ngramStats(tokens: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val m = tokens.numElements()
    val total = math.max(m - (n - 1), 0).toLong
    var distinct = 0L
    if (m >= n) {
      val toks = decodeTokens(tokens)
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= m) {
        seen.add(joinWindow(toks, i, n, sb))
        i += 1
      }
      distinct = seen.size.toLong
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinct))
  }

  // --- int8 scalar quantization (the a4/a8 storage kernel) ------------------

  /** Per-vector int8 scale: 127/max|x| clamped at 1e12, 0 for empty/zero/
    * all-null/NaN-containing vectors. Bit-parity contract with the
    * column formulation the DuckDB oracle replays:
    * `when(array_max(transform(v, abs(cast double))) > 0,
    *  least(127.0/mx, 1e12)).otherwise(0.0)` — max skips null elements
    * and ranks NaN greatest (java.lang.Double.compare, Spark's double
    * ordering), `NaN > 0` is false so a NaN component zeroes the scale,
    * and the clamp keeps scale_fp = floor(scale·1e6 + 0.5) inside int64
    * in every engine (unclamped, max|x| < ~1.3e-10 would saturate
    * Spark's cast where DuckDB raises).
    */
  private def int8ScaleOf(vec: ArrayData): Double = {
    val n = vec.numElements()
    var mx = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = math.abs(vec.getFloat(i).toDouble)
        if (!any || java.lang.Double.compare(v, mx) > 0) mx = v
        any = true
      }
      i += 1
    }
    if (any && mx > 0.0) math.min(127.0 / mx, 1.0e12) else 0.0
  }

  /** One-pass a4 quantization summary:
    * (n_dims, scale_fp, q_sum, q_l2, q_min, q_max) with
    * code_i = floor(x_i·scale + 0.5) as long. Replaces a column
    * formulation that nested the scale subtree inside the per-element
    * transform lambda — Catalyst's higher-order functions re-evaluate
    * the whole captured subtree per ELEMENT, so the projection cost was
    * O(d²)/row interpreted; this kernel is O(d) inside whole-stage
    * codegen. Arithmetic is replayed bit-for-bit: codes via the same
    * double sequence (float→double, ·scale, +0.5, Math.floor, long cast
    * — NaN casts to 0 like Spark's Cast), q_sum/q_l2 null iff any
    * element is null (the aggregate-over-null contract), q_min/q_max
    * skip null elements and are null when no element survives
    * (array_min/array_max contract), and the empty vector yields
    * (0, 0, 0, 0, null, null).
    *
    * One DELIBERATE divergence from the twin, unreachable on real
    * embeddings: a NaN component zeroes the scale (both sides agree),
    * and its code is floor(NaN·0 + 0.5) = NaN — the kernel's long cast
    * yields 0 where the column twin's ANSI cast (Spark 4 default)
    * would fail the job. A quality/storage operator must not kill a
    * 100 TB pass over one pathological vector; the oracle data cannot
    * contain NaN, so the gate cannot see the difference.
    */
  def int8Stats(vec: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    val scale = int8ScaleOf(vec)
    val scaleFp = math.floor(scale * 1000000.0 + 0.5).toLong
    var qSum = 0L; var qL2 = 0L
    var qMin = Long.MaxValue; var qMax = Long.MinValue
    var sawCode = false; var nullElem = false
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) nullElem = true
      else {
        val c = math.floor(vec.getFloat(i).toDouble * scale + 0.5).toLong
        qSum += c; qL2 += c * c
        if (c < qMin) qMin = c
        if (c > qMax) qMax = c
        sawCode = true
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n.toLong, scaleFp,
      if (nullElem) null else qSum,
      if (nullElem) null else qL2,
      if (sawCode) qMin else null,
      if (sawCode) qMax else null))
  }

  /** array<float> → array<long> int8 code array under [[int8ScaleOf]] —
    * the a8 storage representation, same per-element double sequence as
    * [[int8Stats]]; null elements stay null.
    */
  def int8Codes(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val scale = int8ScaleOf(vec)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (vec.isNullAt(i)) null
        else java.lang.Long.valueOf(
          math.floor(vec.getFloat(i).toDouble * scale + 0.5).toLong)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Raw cosine between two float arrays with NO zero-norm branch —
    * the a1 scoring kernel, bit-identical to the three-fold column twin
    * `dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b)))` the DuckDB oracle
    * replays: each accumulator folds left-to-right in its own double
    * sequence, zero vectors divide through to NaN exactly like the
    * twin (unlike [[cosineF]], whose zero branch returns 0), and the
    * zip_with null/length contract maps to a null result.
    */
  def cosineRawF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Squared-L2 between two float arrays, folded LEFT-TO-RIGHT in
    * doubles — bit-identical to the zip_with+aggregate column twin the
    * PQ oracles replay ((p−q)·(p−q) per element, acc+v in index
    * order), including its null contract: null on length mismatch
    * (zip_with pads with null) or any null element.
    */
  def sqL2F(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Count of positions where two long arrays hold equal values — the
    * d3 signature-agreement kernel. Mirrors
    * `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, acc + v)`
    * EXACTLY, including its null behavior (r13 review): `x = y` with a
    * null side is null, IF(null, …) takes the ELSE, so a null element
    * contributes 0 — and zip_with pads the shorter array with nulls, so
    * a length mismatch counts only overlap matches. The twin never
    * returns null for non-null arrays, and neither does this.
    */
  def longEqCount(a: ArrayData, b: ArrayData): Long = {
    val overlap = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < overlap) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Exact BIGINT dot product of two long arrays (order-independent, so
    * no fold-order caveat). Mirrors the zip_with+aggregate column twin:
    * null if the lengths differ (zip_with pads with null) or any element
    * is null. Boxed return: null signals those cases to the codegen
    * null-check.
    */
  def longDot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
