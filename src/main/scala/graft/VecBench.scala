package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.{Dedup, Similarity}

/** Developer diagnostic for the a10 landed-IVF-PQ cost claims — the
  * vector-search twin of [[IncBench]]/[[SemBench]]: time LAND / PROBE /
  * ABSORB / COMPACT of the frozen-quantizer PQ-code index separately.
  *
  * `runMain graft.VecBench <embsDir> <queryN> <batchN> [nBuckets]`
  *
  * Corpus = the full embeddings table at `embsDir`; queries = the first
  * `queryN` vectors; batch = the first `batchN` vectors re-identified
  * at +10^9 (disjoint ids, real vectors). The centroid count follows
  * the corpus ([[Dedup.ivfCellsFor]] — the d10/d13 sizing rule), so
  * per-probe candidate volume is Θ(corpus·nProbe/nCentroids) at every
  * scale. The compaction leg re-runs the probe before and after
  * `compactIvfPqIndex` — identical result counts on the identical index
  * state (the SimilaritySpec pins bit-parity at sf0.001; this records
  * the invariant plus cost + file counts at bench scale).
  */
object VecBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VecBench <embsDir> <queryN> <batchN> [nBuckets]")
    val (embsDir, queryN, batchN) = (args(0), args(1).toInt, args(2).toInt)
    val nBuckets = if (args.length > 3) args(3).toInt else 32
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm
    val embs = graft.sources.Tables.embeddings(spark, embsDir)
    val nCorpus = embs.count()
    val nCents = Dedup.ivfCellsFor(nCorpus)
    val queries = embs.filter(col("vec_id") < queryN)
    val batch = embs.filter(col("vec_id") < batchN)
      .withColumn("vec_id", col("vec_id") + 1000000000L)
    val dir = graft.sources.Spool.tempRoot("vecbench")
    val t0 = System.nanoTime()
    Similarity.landIvfPqIndex(embs, "vec_id", "embedding",
      nCentroids = nCents, m = 4, kCodes = 16, "graft_vecbench", dir,
      nBuckets = nBuckets)
    val tLand = (System.nanoTime() - t0) / 1e9
    def probe(): (Long, Double, String) = {
      val s = System.nanoTime()
      val df = Similarity.ivfPqProbe(spark, queries, "vec_id", "embedding",
        "graft_vecbench", k = 5, nProbe = 4)
      val n = df.queryExecution.toRdd.count()
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(m => s"""${m.group(1)}, ${m.group(2)}""").getOrElse("null, null")
      (n, (System.nanoTime() - s) / 1e9, sel)
    }
    val (rows1, tProbe, sel1) = probe()
    val prune = Metrics.get("a10").map(m =>
      s""""probe_cids": ${m("probe_cids")}, "bucket_pruned": ${m("bucket_pruned")}""")
      .getOrElse(""""probe_cids": null""")
    val t2 = System.nanoTime()
    Similarity.absorbIvfPqBatch(spark, batch, "vec_id", "embedding", "graft_vecbench")
    val tAbsorb = (System.nanoTime() - t2) / 1e9
    val (preRows, tPre, _) = probe()
    val t3 = System.nanoTime()
    Similarity.compactIvfPqIndex(spark, "graft_vecbench")
    val tCompact = (System.nanoTime() - t3) / 1e9
    val cm = Metrics.get("a10.compact").map(m =>
      s""""codes_files": [${m("codes_files_before")}, ${m("codes_files_after")}]""")
      .getOrElse(""""codes_files": null""")
    val (postRows, tPost, _) = probe()
    println(s"""{"corpus": "$embsDir", "n_corpus": $nCorpus, "n_cents": $nCents, """ +
      s""""n_queries": $queryN, "n_batch": $batchN, "n_buckets": $nBuckets, """ +
      s""""land_sec": ${f"$tLand%.2f"}, "probe_sec": ${f"$tProbe%.2f"}, """ +
      s""""probe_rows": $rows1, "buckets_scanned": [$sel1], $prune, """ +
      s""""absorb_sec": ${f"$tAbsorb%.2f"}, """ +
      s""""compact_sec": ${f"$tCompact%.2f"}, $cm, """ +
      s""""precompact_probe": [$preRows, ${f"$tPre%.2f"}], """ +
      s""""postcompact_probe": [$postRows, ${f"$tPost%.2f"}]}""")
    spark.stop()
  }
}
