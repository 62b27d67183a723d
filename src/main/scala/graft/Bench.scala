package graft

import graft.engine.GraftSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // warm up codegen/JIT and the file-index/footer cache of the
    // benchmarked dataset so the first timed query doesn't absorb
    // one-time session costs; every table is touched equally, and no
    // timed query's own plan is pre-compiled
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // events needs the nanos conf; warm through the same loader queries use
    try graft.sources.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }
    // per-query progress on stderr (stdout stays the single JSON line):
    // a run killed mid-way still names every completed query and its
    // elapsed time, so a degraded-host window can't zero the signal
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val t00 = System.nanoTime()
    val results = ordered.zipWithIndex.map { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(
            s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench ${i + 1}%2d/${ordered.size}] $name " +
        f"$sec%.2fs ok=$ok (total ${(System.nanoTime() - t00) / 1e9}%.0fs)")
      (name, sec, ok)
    }
    // a failed query records its time-to-fail but is flagged ok:false and
    // counted in "failed" — a crash must never read as a fast success
    val qs = results.map { case (k, v, ok) => s"""\"$k\":{"sec":$v,"ok":$ok}""" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.size},"failed_queries":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
