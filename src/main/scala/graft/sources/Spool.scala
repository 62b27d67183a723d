package graft.sources

import org.apache.spark.sql.SparkSession

/** Resolution and cleanup of SPOOL directories — the parquet landing
  * zones that truncate iterative lineage (crawl waves, scrape outputs).
  *
  * Executors write the spool and the driver re-reads it, so the path
  * must be visible to every node:
  *
  *  - if the session has a checkpoint directory configured, spools are
  *    allocated under it (that directory is by definition a shared,
  *    cluster-visible filesystem — the same contract Spark's own
  *    checkpointing relies on);
  *  - otherwise, a driver-local temp directory is only correct when the
  *    master is local (executors share the driver's filesystem), so on
  *    any other master the caller MUST supply an explicit shared spool
  *    path — a silent driver-local default would lose executor-written
  *    waves and corrupt the visited-set anti-join.
  *
  * Local temp spools are deleted on JVM exit; checkpoint-dir and
  * caller-supplied spools are the caller's to keep or clean (at scale
  * the spool IS the landed corpus, not a temporary).
  */
object Spool {

  private val tempSpools =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path, java.lang.Boolean]())

  private lazy val cleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempSpools.forEach(p => deleteRecursively(p))
    }, "graft-spool-cleanup"))
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
      finally s.close()
    }
  }

  /** A driver-local temp directory registered for deletion on JVM exit.
    * Only correct on local masters (executors share the driver's
    * filesystem); [[graft.engine.GraftSession]] uses one as the LOCAL
    * session's checkpoint root so iterative operators' reliable-
    * checkpoint branches (e.g. `Dedup.dedupClusters`) engage under the
    * harness exactly as they would against a cluster checkpoint dir.
    */
  def tempRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(
      s"graft_${tag}_${java.util.UUID.randomUUID().toString.take(12)}")
    cleanupHook // register the shutdown hook once
    tempSpools.add(p)
    p.toString
  }

  /** A driver-local temp root on the fastest available filesystem —
    * tmpfs (`/dev/shm`) when present and writable, else the regular temp
    * dir. For transient per-run metadata whose durability is worthless
    * past the JVM (e.g. finite streaming drains' checkpoint WAL: offsets,
    * commits, state-store deltas, rewritten every micro-batch): on tmpfs
    * those writes cost memory bandwidth instead of disk fsyncs, which is
    * the difference between a micro-batch costing milliseconds and
    * hundreds under IO contention. NEVER use for data that must survive
    * the process — same deletion-on-exit contract as [[tempRoot]].
    */
  def fastTempRoot(tag: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
      val p = java.nio.file.Files.createTempDirectory(
        shm, s"graft_${tag}_${java.util.UUID.randomUUID().toString.take(12)}")
      cleanupHook
      tempSpools.add(p)
      p.toString
    } else tempRoot(tag)
  }

  /** A fresh spool directory for `tag`, resolved per the rules above. */
  def dir(spark: SparkSession, tag: String): String = {
    val unique = s"graft_${tag}_${java.util.UUID.randomUUID().toString.take(12)}"
    spark.sparkContext.getCheckpointDir match {
      case Some(ckpt) =>
        // allocate under the cluster-visible checkpoint root; parquet
        // writers create the directory through the Hadoop FS themselves
        s"${ckpt.stripSuffix("/")}/$unique"
      case None =>
        require(spark.sparkContext.master.startsWith("local"),
          s"no checkpoint directory configured and master " +
            s"'${spark.sparkContext.master}' is not local: pass an explicit " +
            "shared spoolDir (a driver-local temp spool would not be visible " +
            "to executors)")
        tempRoot(tag)
    }
  }
}
