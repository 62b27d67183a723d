package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.Dedup

/** Developer diagnostic for the d11 batch-proportionality claim: time
  * the LAND and PROBE phases of the incremental MinHash index
  * separately (the gate/QBench timings fuse them — the query lands the
  * index at construction).
  *
  * `runMain graft.IncBench <docsDir> <batchN> [nBuckets]`
  *
  * Corpus = the full documents table at `docsDir`; batch = the first
  * `batchN` docs re-identified at +10^9 (disjoint ids, real content —
  * the arriving-data shape). Prints one JSON line with land/probe wall
  * seconds, pair count, and the probe plan's SelectedBucketsCount
  * evidence (index-bucket pruning).
  */
object IncBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IncBench <docsDir> <batchN> [nBuckets]")
    val (docsDir, batchN) = (args(0), args(1).toInt)
    val nBuckets = if (args.length > 2) args(2).toInt else 32
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm
    val docs = graft.sources.Tables.documents(spark, docsDir)
    val batch = docs.filter(col("doc_id") < batchN)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    val dir = graft.sources.Spool.tempRoot("incbench")
    val t0 = System.nanoTime()
    Dedup.landMinhashIndex(docs, "doc_id", "text", n = 3, k = 64, bands = 16,
      "graft_incbench", dir, nBuckets = nBuckets)
    val tLand = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val df = Dedup.incrementalMinhashPairs(spark, batch, "doc_id", "text",
      "graft_incbench", threshold = 0.5)
    val pairs = df.queryExecution.toRdd.count()
    val tProbe = (System.nanoTime() - t1) / 1e9
    val selected = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .map(m => s""""buckets_scanned": ${m.group(1)}, "buckets_total": ${m.group(2)}""")
      .getOrElse(""""buckets_scanned": null""")
    // the probe's bucket-prune decision (InSet vs the 8k literal cap) —
    // the branch taken is scale-dependent, so the bench records it
    val prune = Metrics.get("d11").map(m =>
      s""""probe_bkeys": ${m("probe_bkeys")}, "bucket_pruned": ${m("bucket_pruned")}""")
      .getOrElse(""""probe_bkeys": null""")
    val t2 = System.nanoTime()
    Dedup.absorbMinhashBatch(spark, batch, "doc_id", "text", "graft_incbench")
    val tAbsorb = (System.nanoTime() - t2) / 1e9
    // compaction leg: probe a SECOND disjoint batch against the
    // absorbed index, compact, probe it again — identical pair counts
    // on the identical index state (the sf0.001 spec pins bit-parity;
    // this records the same invariant plus cost + file counts at bench
    // scale, where the compactor's Exchange moves real data).
    val batch2 = docs.filter(col("doc_id") < batchN)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    def probe2(): (Long, Double) = {
      val s = System.nanoTime()
      val n = Dedup.incrementalMinhashPairs(spark, batch2, "doc_id", "text",
        "graft_incbench", threshold = 0.5).queryExecution.toRdd.count()
      (n, (System.nanoTime() - s) / 1e9)
    }
    val (prePairs, tPre) = probe2()
    val t3 = System.nanoTime()
    Dedup.compactMinhashIndex(spark, "graft_incbench")
    val tCompact = (System.nanoTime() - t3) / 1e9
    val cm = Metrics.get("d11.compact").map(m =>
      s""""bands_files": [${m("bands_files_before")}, ${m("bands_files_after")}], """ +
        s""""sigs_files": [${m("sigs_files_before")}, ${m("sigs_files_after")}]""")
      .getOrElse(""""bands_files": null""")
    val (postPairs, tPost) = probe2()
    // classification leg (d14): the keep/drop verdict is the probe plus
    // two broadcast batch-membership joins and a batch-sized aggregate —
    // recorded next to the bare probe (postcompact_probe, same index
    // state) to pin "fold ≈ probe" at bench scale
    val batch3 = docs.filter(col("doc_id") < batchN)
      .withColumn("doc_id", col("doc_id") + 3000000000L)
    val t4 = System.nanoTime()
    val clsRows = Dedup.incrementalSurvivors(spark, batch3, "doc_id", "text",
      "graft_incbench", threshold = 0.5).queryExecution.toRdd.count()
    val tClassify = (System.nanoTime() - t4) / 1e9
    val nCorpus = docs.count()
    println(s"""{"corpus": "$docsDir", "n_corpus": $nCorpus, "n_batch": $batchN, """ +
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
