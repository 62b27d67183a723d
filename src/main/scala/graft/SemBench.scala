package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.Dedup

/** Developer diagnostic for the d13 batch-proportionality claim — the
  * semantic twin of [[IncBench]]: time LAND / PROBE / ABSORB / COMPACT
  * of the frozen-quantizer embedding index separately.
  *
  * `runMain graft.SemBench <embsDir> <batchN> [nBuckets]`
  *
  * Corpus = the full embeddings table at `embsDir`; batch = the first
  * `batchN` vectors re-identified at +10^9 (disjoint ids, real
  * vectors). The compaction leg probes a SECOND disjoint batch before
  * and after `compactSemanticIndex` — identical pair counts on the
  * identical index state (the spec pins bit-parity at sf0.001; this
  * records the invariant plus cost + file counts at bench scale).
  */
object SemBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SemBench <embsDir> <batchN> [nBuckets]")
    val (embsDir, batchN) = (args(0), args(1).toInt)
    val nBuckets = if (args.length > 2) args(2).toInt else 32
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm
    val embs = graft.sources.Tables.embeddings(spark, embsDir)
    val batch = embs.filter(col("vec_id") < batchN)
      .withColumn("vec_id", col("vec_id") + 1000000000L)
    val dir = graft.sources.Spool.tempRoot("sembench")
    val t0 = System.nanoTime()
    Dedup.landSemanticIndex(embs, "vec_id", "embedding",
      "graft_sembench", dir, nBuckets = nBuckets)
    val tLand = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val df = Dedup.incrementalSemanticPairs(spark, batch, "vec_id", "embedding",
      "graft_sembench", threshold = 0.4)
    val pairs = df.queryExecution.toRdd.count()
    val tProbe = (System.nanoTime() - t1) / 1e9
    val selected = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .map(m => s""""buckets_scanned": ${m.group(1)}, "buckets_total": ${m.group(2)}""")
      .getOrElse(""""buckets_scanned": null""")
    val prune = Metrics.get("d13").map(m =>
      s""""probe_cids": ${m("probe_cids")}, "bucket_pruned": ${m("bucket_pruned")}""")
      .getOrElse(""""probe_cids": null""")
    val t2 = System.nanoTime()
    Dedup.absorbSemanticBatch(spark, batch, "vec_id", "embedding", "graft_sembench")
    val tAbsorb = (System.nanoTime() - t2) / 1e9
    val batch2 = embs.filter(col("vec_id") < batchN)
      .withColumn("vec_id", col("vec_id") + 2000000000L)
    def probe2(): (Long, Double) = {
      val s = System.nanoTime()
      val n = Dedup.incrementalSemanticPairs(spark, batch2, "vec_id", "embedding",
        "graft_sembench", threshold = 0.4).queryExecution.toRdd.count()
      (n, (System.nanoTime() - s) / 1e9)
    }
    val (prePairs, tPre) = probe2()
    val t3 = System.nanoTime()
    Dedup.compactSemanticIndex(spark, "graft_sembench")
    val tCompact = (System.nanoTime() - t3) / 1e9
    val cm = Metrics.get("d13.compact").map(m =>
      s""""assign_files": [${m("assign_files_before")}, ${m("assign_files_after")}], """ +
        s""""vecs_files": [${m("vecs_files_before")}, ${m("vecs_files_after")}]""")
      .getOrElse(""""assign_files": null""")
    val (postPairs, tPost) = probe2()
    // classification leg (d15): verdict fold ≈ probe, measured on the
    // same post-compaction index state as postcompact_probe
    val batch3 = embs.filter(col("vec_id") < batchN)
      .withColumn("vec_id", col("vec_id") + 3000000000L)
    val t4 = System.nanoTime()
    val clsRows = Dedup.incrementalSemanticSurvivors(spark, batch3, "vec_id",
      "embedding", "graft_sembench", threshold = 0.4)
      .queryExecution.toRdd.count()
    val tClassify = (System.nanoTime() - t4) / 1e9
    val nCorpus = embs.count()
    println(s"""{"corpus": "$embsDir", "n_corpus": $nCorpus, "n_batch": $batchN, """ +
      s""""n_buckets": $nBuckets, "land_sec": ${f"$tLand%.2f"}, """ +
      s""""probe_sec": ${f"$tProbe%.2f"}, "absorb_sec": ${f"$tAbsorb%.2f"}, """ +
      s""""pairs": $pairs, $selected, $prune, """ +
      s""""compact_sec": ${f"$tCompact%.2f"}, $cm, """ +
      s""""precompact_probe": [$prePairs, ${f"$tPre%.2f"}], """ +
      s""""postcompact_probe": [$postPairs, ${f"$tPost%.2f"}], """ +
      s""""classify": [$clsRows, ${f"$tClassify%.2f"}]}""")
    spark.stop()
  }
}
