package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The graft.Metrics observability surface (VERDICT r14 #5): executor-
  * side observe() harvests and driver-side facts land in one queryable
  * map, with NO effect on operator output.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  /** The QueryExecutionListener fires on the listener-bus thread, so a
    * just-finished action's metrics land asynchronously — poll briefly.
    */
  private def awaitMetric(name: String, field: String,
                          timeoutMs: Long = 10000): Long = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var v = Metrics.scalar(name, field)
    while (v.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      v = Metrics.scalar(name, field)
    }
    v.getOrElse(fail(s"metric $name.$field never arrived"))
  }

  test("candidate machinery reports bucket max and candidate counts") {
    Metrics.enable(spark)
    Metrics.clear()
    // two triplicated docs + singletons: known bucket structure
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "the quick brown fox jumps over the lazy dog again"),
      (4L, "completely different text with no overlap at all here now"),
      (5L, "another unrelated document body nothing shared with others x")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.5).collect()
    // identical docs: all 3 pairs surface
    assert(pairs.length == 3)
    // the 3 identical docs share every band bucket; with 16 bands the
    // max bucket has >= 3 members and candidate rows >= 16 bands * 3 pairs
    assert(awaitMetric("d3.buckets", "max_bucket") >= 3L)
    assert(awaitMetric("d3.buckets", "posting_rows") >= 16L * 5)
    assert(awaitMetric("d3.candidates", "n_candidates") >= 16L * 3)
  }

  test("dedupClusters records rounds and convergence driver-side") {
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Dedup.dedupClusters(path, maxIter = 20).collect()
    val rounds = Metrics.scalar("d6", "rounds")
    assert(rounds.exists(r => r >= 1 && r <= 12), s"rounds=$rounds")
    assert(Metrics.get("d6").exists(_("converged") == true))
  }

  test("observe instrumentation does not change operator output") {
    // bit-parity against a hand-computed expectation: the observe nodes
    // ride the plan but the pair set is exactly the unsalted algebra's
    val docs = Seq(
      (10L, "a b c d e f g h i j"),
      (11L, "a b c d e f g h i j"),
      (12L, "z y x w v u t s r q")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", blocks = 4, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L)))
  }

  test("incremental probe records its bucket-prune decision driver-side") {
    // nBuckets = 512: the prune's regime is a corpus-sized bucket count
    // (pruneKeyCap ≈ B·ln4 = 710 here, comfortably above the batch's
    // ≤160 band keys). At small B the same probe must SKIP the InSet —
    // both branches asserted.
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 60)
    val dir = graft.sources.Spool.tempRoot("d11_metrics")
    try {
      Dedup.landMinhashIndex(docs.filter(col("doc_id") < 50), "doc_id", "text",
        n = 3, k = 64, bands = 16, "graft_d11_met", dir, nBuckets = 512)
      Dedup.incrementalMinhashPairs(spark,
        docs.filter(col("doc_id") >= 50), "doc_id", "text",
        "graft_d11_met", threshold = 0.5).collect()
      // 10 batch docs x 16 bands = at most 160 distinct probe band keys
      val bkeys = Metrics.scalar("d11", "probe_bkeys")
        .getOrElse(fail("d11 probe left no probe_bkeys metric"))
      assert(bkeys >= 1 && bkeys <= 160, s"probe_bkeys=$bkeys")
      assert(Metrics.get("d11").exists(_("bucket_pruned") == true))
    } finally {
      Seq("sigs", "bands", "meta").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS graft_d11_met_$s"))
    }
  }

  test("verified-pair volume is observed per family (the loose-threshold density alarm)") {
    // d10's standalone pair list is Θ(n^1.5) at loose τ (gen10: 92.8M
    // rows) — the pairs_out observation is what a cluster operator
    // watches to route loose-τ runs at the bounded consumers (d12/d15)
    // instead of materializing the pair list. One partial aggregate on
    // the result rows; must equal the actual emitted count exactly.
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
    val n = Dedup.semanticDedupPairs(embs, "vec_id", "embedding",
      threshold = 0.2).count()
    assert(n > 0, "no pairs at spec τ — vacuous")
    assert(awaitMetric("d10.pairs_out", "n_pairs") == n,
      s"observed=${Metrics.get("d10.pairs_out")} actual=$n")
  }

  test("incremental probe skips the InSet when the key set covers the buckets") {
    // 8 buckets -> cap = ceil(8·ln4) = 12; a 50-doc batch carries far
    // more band keys, so the prune would scan ~every bucket anyway and
    // the probe must take the unfiltered branch (identical results, no
    // planning tax) and say so in Metrics
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 100)
    val dir = graft.sources.Spool.tempRoot("d11_nocap")
    try {
      Dedup.landMinhashIndex(docs.filter(col("doc_id") < 50), "doc_id", "text",
        n = 3, k = 64, bands = 16, "graft_d11_ncp", dir, nBuckets = 8)
      Dedup.incrementalMinhashPairs(spark,
        docs.filter(col("doc_id") >= 50), "doc_id", "text",
        "graft_d11_ncp", threshold = 0.5).collect()
      val m = Metrics.get("d11").getOrElse(fail("no d11 metrics"))
      assert(m("prune_cap") == 12L, s"cap=${m("prune_cap")}")
      assert(m("bucket_pruned") == false, s"expected the skip branch: $m")
    } finally {
      Seq("sigs", "bands", "meta").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS graft_d11_ncp_$s"))
    }
  }
}
