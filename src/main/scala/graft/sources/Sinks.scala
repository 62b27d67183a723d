package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink side of the engine (reference: deep-field db/models.py SQLite
  * star schema + pages.py:92-116 InsertablePage.update_db).
  *
  * Spark-native posture: columnar partitioned files are the primary sink
  * (what a 100 TB pipeline writes); the JDBC sink covers the reference's
  * relational-database semantics (tested against embedded Derby). The
  * incremental-ingest helper reproduces the "skip pages already in DB"
  * anti-join (same operator as q7).
  */
object Sinks {

  /** Partitioned parquet write — the scale path. `partitionBy` columns
    * become directory partitions so downstream scans prune on them.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** JDBC relational sink (the reference's SQLite role). Executors write
    * batches in parallel — cap with `numPartitions` so the database isn't
    * hammered by hundreds of connections at cluster scale.
    */
  def jdbc(df: DataFrame, url: String, table: String,
           mode: SaveMode = SaveMode.Append, numPartitions: Int = 8,
           batchSize: Int = 1000): Unit =
    df.coalesce(numPartitions).write.mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, new java.util.Properties())

  def readJdbc(spark: org.apache.spark.sql.SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties())

  /** Bucketed managed table: pre-shuffles rows into `nBuckets` by the
    * join key at WRITE time, so every later join/aggregation on that key
    * is exchange-free (the scan exposes the hash partitioning). This is
    * the co-located-join posture for fact⋈fact at 100 TB: pay the
    * shuffle once when the table lands, not on every query.
    */
  def bucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Incremental ingest: keep only rows whose key is not yet in the
    * target (deep-field's exists_in_db skip, bbref_pages.py:58-63), as a
    * left_anti join — the fact side streams through one shuffle (or none
    * when the existing-keys side broadcasts).
    */
  def notYetIngested(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key).distinct(), Seq(key), "left_anti")
}
