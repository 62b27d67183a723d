package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Deterministic global corpus shuffle + contiguous shard layout — the
  * step every pretraining data pipeline ends with: order the corpus by
  * a SEEDED pseudo-random key (so training batches are IID but the
  * layout is reproducible run-over-run), then cut the shuffled sequence
  * into fixed-size shards with a contiguous in-shard slot for each doc.
  * The reference's analog is the deterministic insert ordering its
  * star-schema sink relies on (pages.py update_db ordering) — here the
  * same reproducibility contract at corpus scale.
  */
object Sharding {

  /** (doc_id, pos, shard, slot) for every doc: `pos` is the doc's rank
    * in the seeded global shuffle order (fnv61 of "s<seed>|doc_id",
    * doc_id tiebreak), `shard` = pos / shardSize, `slot` = pos %
    * shardSize.
    *
    * The scale problem is CONTIGUOUS global numbering: a row_number
    * over a global ORDER BY is a single-reducer window — the one plan
    * shape that cannot survive 100 TB. Instead:
    *
    *  1. `repartitionByRange` on the shuffle key — Spark's sampled
    *     range exchange, the same distributed-sort primitive a global
    *     `orderBy` uses (deterministic boundaries: the range sampler
    *     is seeded per-partition), each output partition sorted
    *     within;
    *  2. `zipWithIndex` over the sorted partitions — the canonical
    *     two-pass offset scheme (one count job over the partition
    *     sizes, then one map stamping offset+local), imperative
    *     per-partition logic that is RDD-land by design: no second
    *     shuffle, no single reducer, positions contiguous across
    *     partition boundaries because range partitions are globally
    *     ordered.
    *
    * The result is bit-deterministic for a given (corpus, seed,
    * shardSize) — re-running produces the identical layout, which is
    * what makes shard-level training resumption and byte-identical
    * re-materialization possible.
    */
  def shuffleShard(spark: SparkSession, docs: DataFrame, idCol: String,
                   seed: String, shardSize: Int): DataFrame = {
    // pos DIV 0 yields null shards silently, and writeShards would then
    // drop rows into a __HIVE_DEFAULT_PARTITION__ directory — fail fast
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    import spark.implicits._
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = docs
      .select(col(idCol).cast("long").as("doc_id"))
      .withColumn("k", HashExpressions.fnv61(
        concat(lit(s"s$seed|"), col("doc_id").cast("string"))))
      .repartitionByRange(nPart, col("k"), col("doc_id"))
      .sortWithinPartitions("k", "doc_id")
    val pos = sorted.select("doc_id").as[Long].rdd
      .zipWithIndex()
      .toDF("doc_id", "pos")
    pos.select(col("doc_id"), col("pos"),
      expr(s"pos DIV $shardSize").as("shard"),
      pmod(col("pos"), lit(shardSize.toLong)).as("slot"))
  }

  /** Materialize a [[shuffleShard]] layout: join the slot assignment
    * back to the full rows and write ONE slot-ordered parquet file per
    * shard under `dir/shard=<n>/`. Layout-side columns join back by id
    * (broadcast when the assignment is small; at corpus scale both
    * sides hash-join on the id they already carry), the write
    * repartitions BY the shard column so each task owns whole shards —
    * `partitionBy` then emits exactly one file per shard directory, the
    * balanced-output contract (no tiny-file spray, no giant reducer)
    * that makes the layout consumable by a training loader. Slot order
    * inside each file is the shuffle order, so sequential reads replay
    * the global permutation.
    */
  def writeShards(spark: SparkSession, docs: DataFrame, idCol: String,
                  seed: String, shardSize: Int, dir: String): Unit = {
    val layout = shuffleShard(spark, docs, idCol, seed, shardSize)
    docs.withColumn("doc_id", col(idCol).cast("long"))
      .join(layout, Seq("doc_id"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "slot")
      .write.partitionBy("shard").mode("overwrite").parquet(dir)
  }
}
