package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3 a1/a2).
  *
  * Baseline is brute-force cosine top-k (broadcast the queries, scan the
  * corpus once); the scale path is hyperplane-LSH bucketing, where the
  * bucket id is the shuffle key and per-bucket brute force is bounded by
  * bucket size.
  */
object Similarity {

  /** Shared tail: per-query rank by (rounded cosine desc, neighbor id)
    * and keep the top k — identical ordering semantics for every ANN
    * variant so results are comparable across them.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic md5-smallest-id sample of `n` (id, vector) rows — THE
    * shared coarse-sampling contract: [[ivfTopK]]'s centroids,
    * [[pqEncode]]/[[pqAdcTopK]]'s codebook rows and
    * [[Dedup.semanticDedupPairs]]'s cells all draw from this one
    * definition (stateless, reproducible on every executor, replayed
    * verbatim by the DuckDB oracles) — a tie-break or ordering tweak
    * here changes every consumer together instead of desynchronizing
    * them. Executes as TakeOrdered (per-partition heaps of n), never a
    * global sort.
    */
  private[graft] def md5Sample(df: DataFrame, idCol: String, vecCol: String,
                                   n: Int, idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
      .orderBy(md5(col(idAs).cast("string")), col(idAs)).limit(n)

  /** SQL-expressible double-fold cosine (kept in sync with the DuckDB
    * oracle in DocumentSuite — same left-to-right accumulation order,
    * no zero-norm branch so zero vectors divide through to NaN).
    * Executes as the one-pass cosineRawF codegen kernel, bit-identical
    * to the three interpreted zip_with+aggregate folds it replaced.
    */
  def cosineSql(a: Column, b: Column): Column = HashExpressions.cosineRaw(a, b)

  /** Exact cosine top-k: queries (small) are broadcast against the corpus,
    * so the fact side never shuffles for the join; the only shuffle is the
    * per-query top-k window. Ordering and selection use the ROUNDED cosine
    * (6 dp) + neighbor id so results are reproducible across engines.
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosineSql(col("qv"), col("cv")), 6))
    rankTopK(scored, k)
  }

  /** IVF-style ANN: partition the corpus into `nCentroids` Voronoi cells
    * around deterministically-sampled centroid vectors (the corpus rows
    * with the smallest md5(id) — stateless, reproducible on every
    * executor, and engine-portable so the assignment is oracle-checkable
    * in any SQL engine); each query probes its `nProbe` nearest cells and
    * reranks members by exact cosine. The cell id is the shuffle/join
    * key, so per-query work is bounded by nProbe/nCentroids of the
    * corpus.
    */
  /** Nearest-cell assignment against a broadcast centroid sample: keep
    * the `keep` argmax-cosine cells per row (cid tie-break). Shared by
    * [[ivfTopK]] and [[ivfPqTopK]].
    */
  private def ivfAssign(cents: DataFrame, df: DataFrame, id: String,
                        vec: String, keep: Int): DataFrame = {
    val scored = df.join(broadcast(cents))
      .withColumn("__cc", HashExpressions.cosine(col(vec), col("cv")))
    val w = Window.partitionBy(id).orderBy(col("__cc").desc, col("cid").asc)
    scored.withColumn("__r", row_number().over(w)).filter(col("__r") <= keep)
      .select(col(id), col(vec), col("cid"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val cents = md5Sample(corpus, idCol, vecCol, nCentroids, "cid", "cv")

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame =
      ivfAssign(cents, df, id, vec, keep)

    val corpusCells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv2")), "neighbor_id", "cv2", 1)
    val queryProbes = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", nProbe)

    val cand = corpusCells.join(broadcast(queryProbes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(HashExpressions.cosine(col("qv"), col("cv2")), 6))
    rankTopK(cand, k)
  }

  /** Int8 scalar quantization of an embedding column — the storage/IO
    * half of a vector index: per vector, scale = 127/max|x| and each
    * component maps to floor(x·scale + 0.5) ∈ [-127, 127]. A map-only
    * projection (no shuffle, no UDF — all codegen'd collection
    * functions), so at 100 TB it rides the scan. `floor(x+0.5)` rather
    * than round() because round's half-case tie rule differs across
    * engines while floor is IEEE-exact everywhere; EVERY emitted summary
    * column (scale included) is an exact integer, so the oracle
    * comparison has no float tolerance at all — `scale_fp` is the scale
    * at 6-decimal fixed point, floor(scale·1e6 + 0.5) as BIGINT, for the
    * same cross-engine reason (a rounded DOUBLE near a half boundary
    * could tie-break differently between engines). Zero vectors quantize
    * to scale_fp 0 and all-zero components. The scale is CLAMPED at 1e12
    * (so scale_fp ≤ 1e18, inside int64 in every engine): unclamped,
    * a denormal-ish max|x| below ~1.3e-10 would push scale_fp past
    * Long.MaxValue, where Spark's cast saturates but other engines
    * (e.g. DuckDB's CAST AS BIGINT) raise — the clamp keeps the two
    * sides bit-identical over the full double domain instead of
    * diverging on pathological vectors.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    // One O(d) codegen kernel pass per row (HashKernels.int8Stats),
    // consumed t12-style: struct alias in its own projection, fields
    // extracted in the next (the non-cheap multi-referenced alias keeps
    // CollapseProject from inlining the kernel per field). The previous
    // column formulation nested the scale subtree inside the transform
    // lambda — higher-order functions re-evaluate captured subtrees per
    // ELEMENT, so it cost O(d²)/row interpreted and recomputed the code
    // array once per summary column on top (r13: 4.2 s → ~0.2 s at
    // sf0.1; at production dims the gap is the difference between
    // riding the scan and dominating it).
    emb.select(col(idCol).as("vec_id"),
        HashExpressions.int8Stats(col(vecCol)).as("__s"))
      .select(col("vec_id"),
        col("__s.n_dims").as("n_dims"),
        col("__s.scale_fp").as("scale_fp"),
        col("__s.q_sum").as("q_sum"),
        col("__s.q_l2").as("q_l2"),
        col("__s.q_min").as("q_min"),
        col("__s.q_max").as("q_max"))

  /** Per-label embedding centroids with FIXED-POINT accumulation: each
    * component is first quantized to an exact integer grid
    * (floor(x·grid + 0.5)), the per-(label, position) sums run on
    * BIGINTs, and the mean is divided back out at the end. Summing
    * doubles in a distributed aggregate is order-dependent (float
    * addition is non-associative, and Spark's partial-aggregate merge
    * order is nondeterministic) — integer accumulation makes the
    * centroid bit-reproducible run to run AND engine to engine, which is
    * what lets a DuckDB oracle hash-match it. The reported mean stays on
    * that exact-integer footing too: `centroid_fp` is the mean at
    * 6-decimal fixed point via floor(x·1e6 + 0.5), never a rounded
    * double (round()'s half-case tie rule differs across engines; the
    * deterministic double ops here — one division chain, +0.5, floor —
    * are IEEE-identical everywhere). Long-form output
    * (label, pos, n, q_sum, centroid_fp): one posexplode scan, one
    * partial-aggregating shuffle on (label, pos) — never a per-label
    * collect of whole vectors. This is the "train the coarse quantizer"
    * summarization step feeding [[ivfTopK]]-style cell layouts.
    */
  def labelCentroids(emb: DataFrame, labelCol: String, vecCol: String,
                     grid: Long = 1000000L): DataFrame = {
    val qcs = posexplode(transform(col(vecCol),
      x => floor(x.cast("double") * grid + lit(0.5)).cast("long")))
    emb.select(col(labelCol).as("label"), qcs.as(Seq("pos", "qc")))
      .select(col("label"), col("pos").cast("long").as("pos"), col("qc"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum("qc").as("q_sum"))
      // op sequence (/grid, /n, *1e6, +0.5, floor) is mirrored verbatim
      // in the DuckDB oracle — same IEEE double sequence, same bits
      .withColumn("centroid_fp",
        floor(col("q_sum").cast("double") / grid.toDouble / col("n").cast("double")
          * lit(1000000.0) + lit(0.5)).cast("long"))
  }

  /** Product quantization encode — the vector-compression half of an
    * IVF-PQ index (Jégou et al. 2011, "Product Quantization for Nearest
    * Neighbor Search"): each vector splits into `m` subvectors and each
    * subvector is replaced by the index of its nearest codebook entry,
    * so a d-dim float vector stores as `m` small codes. Codebooks are
    * "trained" by the same stateless deterministic sampling as
    * [[ivfTopK]]'s centroids (the `kCodes` corpus rows with the smallest
    * md5(id), coded 0..kCodes-1 in that order) — reproducible on every
    * executor and in any engine, which is what makes the assignment
    * oracle-checkable.
    *
    * Scale posture: the codebook is dim-scale (kCodes·m subvectors) and
    * broadcasts; the corpus side explodes ×m, scores each subvector
    * against its sub's codes inside the broadcast join, and the argmin
    * is a PARTIAL-AGGREGABLE `min(struct(dist, code))` — map-side
    * combine reduces the kCodes-way candidate fan-in before the single
    * (vec_id, sub) shuffle, so shuffle volume is m rows per vector, not
    * m·kCodes. The tiny row_number window coding the codebook runs on
    * kCodes rows (dim-scale, the surrogateDim contract). Distances fold
    * doubles left-to-right in the exact order the DuckDB twin replays;
    * ties break on the code index; `dist_fp` reports the quantization
    * error at 6-decimal fixed point (floor(x·1e6+0.5), the a4/a5
    * convention — no float tolerance in the comparison at all). If `m`
    * does not divide the dimension, both engines ignore the same tail
    * elements (identical slice arithmetic).
    */
  /** The per-subspace codebook of [[pqEncode]]/[[pqAdcTopK]]:
    * `(code, sub, cs)` — the `kCodes` md5-sampled rows, coded 0..k-1 in
    * sample order, sliced into their `m` subvectors. The tiny
    * row_number window runs on kCodes rows (dim-scale, the surrogateDim
    * contract); every consumer broadcasts this relation.
    */
  private def codebookSubs(corpus: DataFrame, idCol: String, vecCol: String,
                           m: Int, kCodes: Int): DataFrame = {
    val byMd5 = Window.orderBy(md5(col("cent_id").cast("string")), col("cent_id"))
    md5Sample(corpus, idCol, vecCol, kCodes, "cent_id", "cw")
      .withColumn("code", row_number().over(byMd5).cast("long") - 1)
      .select(col("code"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("cw"))
      .select(col("code"), col("sub"),
        expr(s"slice(cw, sub * (size(cw) div $m) + 1, size(cw) div $m)").as("cs"))
  }

  /** `(id → m subvectors)` explode shared by the encode and query sides. */
  private def subVectors(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, idAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as("v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col(idAs), col("sub"),
        expr(s"slice(v, sub * (size(v) div $m) + 1, size(v) div $m)").as("vs"))

  /** Squared-L2 between two float subvectors, folded left-to-right in
    * doubles — the exact order the DuckDB twins replay. One codegen
    * kernel pass (HashKernels.sqL2F, bit-identical to the
    * zip_with+aggregate twin) instead of an interpreted lambda per
    * (row × codebook-entry) pair.
    */
  private def sqL2(a: Column, b: Column): Column = HashExpressions.sqL2F(a, b)

  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, kCodes: Int): DataFrame =
    pqEncodeWith(broadcast(codebookSubs(corpus, idCol, vecCol, m, kCodes)),
      corpus, idCol, vecCol, m)

  /** [[pqEncode]] against a prebuilt (broadcast) codebook — shared so
    * the ADC operators sample the codebook ONCE and feed the same
    * broadcast to both the encode and query sides (one corpus-wide
    * md5-ordered sample instead of two, and a single broadcast the
    * exchange-reuse machinery dedups at execution).
    */
  private def pqEncodeWith(cb: DataFrame, corpus: DataFrame, idCol: String,
                           vecCol: String, m: Int): DataFrame =
    subVectors(corpus, idCol, vecCol, m, "vec_id")
      .join(cb, Seq("sub"))
      .withColumn("dist", sqL2(col("vs"), col("cs")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("dist"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("best.code").as("code"),
        floor(col("best.dist") * lit(1000000.0) + lit(0.5)).cast("long").as("dist_fp"))

  /** The compressed corpus representation + per-query ADC distance
    * tables, from ONE codebook sample — the shared front half of
    * [[pqAdcTopK]] and [[ivfPqTopK]].
    */
  private def pqCodesAndAdc(queries: DataFrame, corpus: DataFrame,
                            idCol: String, vecCol: String,
                            m: Int, kCodes: Int): (DataFrame, DataFrame) = {
    val cb = broadcast(codebookSubs(corpus, idCol, vecCol, m, kCodes))
    val codes = pqEncodeWith(cb, corpus, idCol, vecCol, m)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val adc = subVectors(queries, idCol, vecCol, m, "query_id")
      .join(cb, Seq("sub"))
      .select(col("query_id"), col("sub").cast("long").as("sub"), col("code"),
        floor(sqL2(col("vs"), col("cs")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("dfp"))
    (codes, adc)
  }

  /** Asymmetric-distance (ADC) top-k over the PQ codes — the faiss
    * IndexPQ query path: the corpus is visited only through its
    * compressed `(vec_id, sub, code)` representation (m small codes per
    * vector — at 100 TB of vectors THE reason PQ exists), while each
    * query precomputes a distance TABLE (query-subvector → every
    * codebook entry, m·kCodes rows per query) that broadcasts. Scoring
    * is one broadcast join codes⋈table and a partial-aggregated sum per
    * (query, neighbor); ranking reuses the a1/a3 top-k window (partial
    * WindowGroupLimit before the shuffle).
    *
    * Per-sub table entries are quantized to the a4/a5 fixed point
    * BEFORE the sum, so the total is a BIGINT sum of BIGINTs —
    * order-independent across partial-aggregate merges and exact in any
    * engine; ties rank by neighbor id. Production stores the a6 codes
    * and reads them here; this composition recomputes them inline so
    * the operator is self-contained over raw vectors.
    */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, m: Int, kCodes: Int): DataFrame = {
    val (codes, adc) = pqCodesAndAdc(queries, corpus, idCol, vecCol, m, kCodes)
    val scored = codes.join(broadcast(adc), Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dfp")).as("adc_fp"))
    val w = Window.partitionBy("query_id").orderBy(col("adc_fp").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_fp"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF + PQ-ADC composed search — the faiss `IndexIVFPQ` query path
    * and the production shape of a 100 TB vector index: the corpus is
    * BOTH cell-pruned (only the `nProbe`/`nCentroids` fraction a query
    * probes is visited) and compressed (visited rows are read as m
    * small codes, never as float vectors). [[ivfTopK]] contributes the
    * coarse quantizer (md5-sampled centroids, argmax-cosine cells);
    * [[pqAdcTopK]] contributes the residual-free ADC scoring (per-query
    * distance tables over the shared codebook, fixed-point BEFORE the
    * sum so the total is an order-independent BIGINT).
    *
    * Plan: centroids, query probes and the per-query ADC tables all
    * broadcast; the only corpus-sized work is the code table's id-keyed
    * join to its cell assignment and the partial-aggregated per-pair
    * sum over candidates — Θ(corpus·m/nCentroids·nProbe) rows into the
    * final exchange. Ranking reuses the a1/a3/a7 per-query top-k window
    * (partial WindowGroupLimit before the shuffle). In production the
    * a6 codes and cell ids land once as bucketed parquet and this
    * recomputation disappears; the operator is self-contained over raw
    * vectors so the oracle can replay it from the table alone.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, nCentroids: Int, nProbe: Int, m: Int, kCodes: Int): DataFrame = {
    val cents = md5Sample(corpus, idCol, vecCol, nCentroids, "cid", "cv")
    val corpusCells = ivfAssign(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv2")),
      "neighbor_id", "cv2", 1).select("neighbor_id", "cid")
    val queryProbes = ivfAssign(cents,
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", nProbe).select("query_id", "cid")
    val (codes, adc) = pqCodesAndAdc(queries, corpus, idCol, vecCol, m, kCodes)
    // a corpus vector lives in exactly ONE cell (keep = 1), so a
    // candidate (query, neighbor) pair arises from at most one probed
    // cell and needs no dedup before the sum
    val scored = codes.join(corpusCells, "neighbor_id")
      .join(broadcast(queryProbes), Seq("cid"))
      .join(broadcast(adc), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dfp")).as("adc_fp"))
    val w = Window.partitionBy("query_id").orderBy(col("adc_fp").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_fp"),
        col("rank").cast("long").as("rank"))
  }

  /** Scalar-quantization ADC top-k — the int8 analog of [[pqAdcTopK]]
    * (the faiss `IndexScalarQuantizer` query path): every vector is
    * stored as the [[quantizeInt8]] code array (floor(x·scale + 0.5)
    * with scale = min(127/max|x|, 1e12)) and search runs entirely over
    * the codes. At 100 TB this is the 4×-smaller-scan variant of a1:
    * the corpus is read as int8 codes (the production layout would
    * land the code arrays once and scan only them), the quantized
    * queries broadcast, and the only shuffle is the per-query top-k
    * window — same single-corpus-scan + partial WindowGroupLimit shape
    * as a1/a3/a7.
    *
    * Exactness contract: the code arrays and their integer dot product
    * and squared norms are BIGINT-exact (the dot folds longs, so
    * partial order can never matter); the reported `cos_fp` is the
    * quantized cosine at the a4/a5 6-decimal fixed point through ONE
    * deterministic double sequence (int→double casts, two sqrts, one
    * multiply, one division, ·1e6, +0.5, floor — IEEE-identical in any
    * engine, mirrored verbatim by the DuckDB twin). A zero vector
    * quantizes to an all-zero code (norm 0) and scores `cos_fp` 0
    * against everything, in both engines.
    */
  def sqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    // the code array comes from the one-pass int8Codes kernel (scale
    // computed in-kernel — the old lambda-captured scale subtree cost
    // O(d²)/row, see quantizeInt8), and both the squared norm and the
    // per-pair dot run the exact-BIGINT longDot kernel inside codegen
    def codes(df: DataFrame, idAs: String, codeAs: String, n2As: String): DataFrame =
      df.select(col(idCol).as(idAs), HashExpressions.int8Codes(col(vecCol)).as(codeAs))
        .withColumn(n2As, HashExpressions.longDot(col(codeAs), col(codeAs)))
    val qs = codes(queries, "query_id", "qq", "n2q")
    val cs = codes(corpus, "neighbor_id", "cq", "n2c")
    val dot = HashExpressions.longDot(col("qq"), col("cq"))
    val scored = cs.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_fp",
        when(col("n2q") > 0 && col("n2c") > 0,
          floor(dot.cast("double")
            / (sqrt(col("n2q").cast("double")) * sqrt(col("n2c").cast("double")))
            * lit(1000000.0) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
    val w = Window.partitionBy("query_id").orderBy(col("cos_fp").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_fp"),
        col("rank").cast("long").as("rank"))
  }

  /** Hyperplane-LSH ANN: bucket corpus and queries into `tables`
    * independent sign-bit bucketings; candidates are same-bucket rows in
    * any table; rerank candidates by exact cosine and keep top-k. Recall
    * grows with `tables`, per-bucket cost shrinks with `planes`.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, tables: Int, planes: Int): DataFrame = {
    def bucketize(df: DataFrame, id: String, vec: String) =
      df.select(col(id), col(vec),
        posexplode(array((0 until tables).map(t =>
          HashExpressions.hyperplaneSig(col(vec), t, planes)): _*)).as(Seq("tbl", "bucket")))
    val qb = bucketize(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv")
    val cb = bucketize(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id", "cv")
    val cand = cb.join(broadcast(qb),
        qb("tbl") === cb("tbl") && qb("bucket") === cb("bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
    val scored = cand.withColumn("cos",
      round(HashExpressions.cosine(col("qv"), col("cv")), 6))
    rankTopK(scored, k)
  }
}
