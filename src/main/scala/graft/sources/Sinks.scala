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

  /** Idempotent insert-if-absent on a natural key — the reference's
    * update_db semantics (pages.py:97-106 re-runs without duplicating;
    * db/models.py:14-28 enforces unique natural keys): anti-join the
    * incoming batch against the target's existing keys, then append only
    * the remainder. Re-running the same batch is a no-op. The key scan
    * reads one column (broadcast when small), never the incoming fact.
    *
    * Not transactional across concurrent writers — two simultaneous
    * upserts of the same key can both pass the anti-join; the reference
    * is single-writer and so is this guarantee. For concurrent writers
    * keep a DB-side unique constraint as the backstop.
    */
  def jdbcUpsert(df: DataFrame, url: String, table: String, key: String,
                 numPartitions: Int = 8, batchSize: Int = 1000): Unit =
    jdbcUpsert(df, url, table, Seq(key), numPartitions, batchSize)

  /** Composite-natural-key variant (the reference's play table keys on
    * (game, play_num), models.py:79-83).
    */
  def jdbcUpsert(df: DataFrame, url: String, table: String, keys: Seq[String],
                 numPartitions: Int, batchSize: Int): Unit = {
    val spark = df.sparkSession
    val existing =
      try Some(readJdbc(spark, url, table).select(keys.head, keys.tail: _*))
      catch { case _: Exception => None } // table absent: plain insert creates it
    val fresh = existing.map(notYetIngested(df, _, keys)).getOrElse(df)
    jdbc(fresh, url, table, SaveMode.Append, numPartitions, batchSize)
  }

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
    notYetIngested(incoming, existing, Seq(key))

  def notYetIngested(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.head, keys.tail: _*).distinct(), keys, "left_anti")
}
