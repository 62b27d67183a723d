package graft

import graft.engine.GraftSession

/** Developer diagnostic: time named SparkEntry queries in isolation.
  *
  * `runMain graft.QBench q1_pricing_summary,t9_tfidf [reps]` against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1). Set `QBENCH_EXPLAIN=1` to dump
  * each query's formatted physical plan before timing. Not part of the
  * driver gate — Bench.scala is the reported benchmark; this exists so
  * a single query can be profiled without paying the full-suite sweep.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "usage: QBench <name>[,<name>...] [reps]")
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val explain = sys.env.get("QBENCH_EXPLAIN").contains("1")
    val spark = GraftSession.local()
    // QBENCH_SQL_CONF="k=v;k=v" — runtime SQL-conf overrides applied on
    // the live session (GraftSession.builder pins e.g. the broadcast
    // threshold, so -D system properties can't reach past it; the skew
    // diagnostics need to flip such knobs per run)
    sys.env.get("QBENCH_SQL_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/codegen warm
    // Spark's own codegen metrics — deltas per rep attribute how much of
    // a cold first run is one-shot code generation vs real work. The
    // count is a monotonic Counter; the ms figure sums a Dropwizard
    // HISTOGRAM snapshot, whose exponentially-decaying reservoir holds
    // 1028 samples — past ~1028 total compiles in the JVM the delta is
    // approximate (and clamped at 0 below), so treat ms as indicative
    // and the compile COUNT as exact.
    def codegenMs(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    }
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        // toRdd.count(), not count(): count() re-plans through a fresh
        // Aggregate and column-pruning then deletes map-only projections
        // (t12 kernel, a4 quantize) from the timed run entirely — the
        // profile would measure the parquet scan, not the kernel.
        // toRdd materializes every row of the plan as built. (r12 ADVICE.)
        val (c0, ms0) = codegenMs()
        val df = fn(spark, sfDir)
        val cnt = df.queryExecution.toRdd.count()
        val (c1, ms1) = codegenMs()
        println(f"[qbench] $n rep $r: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt " +
          f"codegen=${c1 - c0} compiles/${math.max(ms1 - ms0, 0)}ms")
        // the FINALIZED adaptive plan (AQE decisions — broadcast
        // conversions, skew-join splits marked `skew=true` — only exist
        // post-execution; the pre-run explain above can't show them)
        if (r == reps && sys.env.get("QBENCH_FINAL_PLAN").contains("1"))
          println(s"[qbench-final-plan] $n\n${df.queryExecution.executedPlan}")
      }
    }
    spark.stop()
  }
}
