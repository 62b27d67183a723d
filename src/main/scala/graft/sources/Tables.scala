package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All loaders are plain parquet scans: projection and predicate pushdown
  * are left to Catalyst (verified in `PlanAuditSpec`). At cluster scale the
  * same call reads a partitioned table; nothing here assumes single-file
  * layout.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as a nanos LONG (legacy conf) and
    * surface it as a micros-precision timestamp — truncation, not
    * rounding, matching how every ms/sec-level comparison floors.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // integer division: `/` would promote the ~1e18 ns long to double
    // (53-bit mantissa) and floor to the wrong microsecond for ~12% of
    // ms-aligned values
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
