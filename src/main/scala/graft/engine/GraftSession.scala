package graft.engine

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the engine (SURVEY.md §4/§5).
  *
  * The knobs that matter at 100 TB, set once:
  *  - AQE on with partition coalescing and skew-join splitting, so the
  *    static shuffle-partition count only has to be roughly right;
  *  - broadcast threshold raised to 64 MB: every dimension in the star
  *    schema (and every roster/bucket dim the engine builds) must
  *    broadcast rather than shuffle the fact side;
  *  - shuffle partitions sized to the core count locally; on a real
  *    cluster this is executors x cores x 2-3, and AQE coalesces down.
  */
object GraftSession {

  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // spark.sql.files.maxPartitionBytes stays at the 128 MB default: at
      // cluster scale that yields memory-safe scan tasks, and AQE
      // coalescing absorbs the small-file end (measured: shrinking it to
      // 2 MB does not move the local benchmark, which is overhead-bound)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Local-master resilience: the executor heartbeats the in-process
      // driver, and on `spark.executor.heartbeat.maxFailures` consecutive
      // misses Spark SELF-KILLS the JVM (ExecutorExitCode 56) — on a
      // contended host whose hypervisor stalls the VM for minutes (CPU
      // steal), a long gate run can die mid-write with shutdown hooks
      // deleting spools under in-flight jobs. Heartbeat loss carries no
      // signal when driver and executor share a JVM, so make the
      // self-kill effectively unreachable and widen the RPC timeout. On
      // a real cluster the deployer's conf overrides these — there the
      // heartbeat IS the liveness contract.
      .config("spark.executor.heartbeatInterval", "30s")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeat.maxFailures", "10000")

  /** Local session as the driver harness runs it. A checkpoint directory
    * is always set (Spool-managed temp root, deleted on JVM exit) so the
    * RELIABLE-checkpoint branches of iterative operators — e.g.
    * `Dedup.dedupClusters`'s every-3-rounds lineage truncation — engage
    * under the harness exactly as they would on a cluster, instead of
    * silently falling back to `localCheckpoint` (which loses data on
    * executor failure). On a real cluster the deployer sets a shared-FS
    * checkpoint dir on the context and this default never applies.
    */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(graft.sources.Spool.tempRoot("ckpt"))
    // harvest the engine's observe() metrics (graft.Metrics) — a cluster
    // deployment calls Metrics.enable on its own session the same way
    graft.Metrics.enable(s)
    s
  }
}
