package graft

/** Pins the session confs the engine's correctness and scale posture
  * rest on — a drift here would not fail any single query's test but
  * would change results (timezone), plans (broadcast threshold, AQE) or
  * resilience (checkpoint dir) everywhere at once.
  */
class GraftSessionSpec extends SparkSpec {

  test("session confs: UTC, AQE + skew join, 64MB broadcast, checkpoint dir set") {
    // UTC: every oracle compares timestamps as epoch values against
    // DuckDB reading the files natively; a local-zone session would skew
    // all NTZ casts
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    // AQE family: the static shuffle-partition count is only "roughly
    // right" BECAUSE coalescing and skew-splitting are on
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
    // 64 MB broadcast threshold: the star-schema dims and bucket dims
    // must broadcast — PlanAuditSpec's BroadcastHashJoin asserts assume it
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong == 64L * 1024 * 1024)
    // reliable-checkpoint branches (d6's every-5-rounds truncation) only
    // engage when a checkpoint dir exists
    assert(spark.sparkContext.getCheckpointDir.nonEmpty,
      "no checkpoint dir: iterative operators would fall back to localCheckpoint")
  }
}
