package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks shared by the query suite and the scrape
  * pipeline. Everything is expressed on the DataFrame API so Catalyst can
  * push, prune, and reorder; none of these helpers materialize or collect.
  *
  * Reference semantics covered here:
  *   - get_or_create dimension build → [[surrogateDim]]
  *     (deep-field bbref_pages.py:337-372 `Team.get_or_create`)
  *   - on-base bitflag encode → [[bitflags]]
  *     (deep-field bbref_pages.py:507-515 `__runners_to_on_base`)
  *   - play_num sequence → [[sequenceNumber]]
  *     (deep-field bbref_pages.py:455-465 `play_num`)
  *   - appearance counters / pitcher-change detection → window lag+cumsum
  *     (deep-field bbref_pages.py:562+ `_PlayerAppearances`)
  */
object Relational {

  /** Distinct natural keys + deterministic dense surrogate ids.
    * `dense_rank over (order by key)` rather than
    * `monotonically_increasing_id` so ids are stable across partitioning
    * and reproducible by any other engine. The single-partition window is
    * fine because a dimension is by definition small; for a dimension too
    * large for one partition use [[surrogateDimLarge]], which produces
    * the identical assignment without the bottleneck.
    */
  def surrogateDim(df: DataFrame, naturalKey: String, idName: String): DataFrame =
    df.select(naturalKey).distinct()
      .withColumn(idName, dense_rank().over(Window.orderBy(col(naturalKey))))

  /** [[surrogateDim]] for dimensions too large for a single-partition
    * window: range-partition the distinct keys so the global sort is
    * spread over `partitions` reducers, then assign
    * `partition offset + local position` via `zipWithIndex` (one extra
    * count-per-partition job, no data movement). Output is value-identical
    * to surrogateDim — dense 1-based ids in natural-key order (emitted as
    * LONG, so a dimension past 2^31 keys cannot silently wrap) — because
    * ids depend only on the global key order, not on where the range
    * boundaries fall. This is the sanctioned RDD exception: the offset
    * arithmetic is genuinely per-partition imperative logic.
    *
    * Persist lifecycle: the distinct keys are persisted only while the
    * two `zipWithIndex` passes run (the per-partition count and the data
    * pass must see identical partition contents), then RELEASED before
    * returning — the interim pin cannot accumulate across calls. What
    * the caller receives is the materialized (key, id) mapping itself,
    * persisted MEMORY_AND_DISK because every consumer joins it at least
    * once (usually several times, dim-style); the caller owns that pin
    * and releases it with a plain `df.unpersist()` when done — the same
    * caller-owned contract as the two-arg starSchema's parsed dataset.
    * This builder is therefore eager (both passes run at call time),
    * which fits its role as a one-shot dimension materialization step.
    *
    * Executor-loss caveat: once the interim pin is released, a lost
    * partition of the returned MEMORY_AND_DISK mapping recomputes
    * through the unpinned distinct/shuffle lineage. That recompute is
    * value-deterministic HERE — and only because of two properties this
    * method maintains on purpose: (1) the rows are DISTINCT on the full
    * sort key, so the within-partition sort is a total order with no
    * ties for a nondeterministic shuffle-fetch order to break, and
    * (2) `zipWithIndex` fixes its per-partition offsets (and the range
    * partitioner its boundaries) when the RDD is created, not per
    * recompute. A variant that sorted on a key prefix, or skipped the
    * distinct, would regenerate DIFFERENT ids on recompute and corrupt
    * every fact row already joined against the lost partition's old ids
    * — such a variant must write the mapping to cluster storage (a
    * [[graft.sources.Spool]] path, as Scraper does with its landed
    * tables) instead of relying on persist. `localCheckpoint` is NOT the
    * hardening here: it trades a deterministic recompute for outright
    * data loss on executor failure.
    */
  def surrogateDimLarge(df: DataFrame, naturalKey: String, idName: String,
                        partitions: Int = 200): DataFrame =
    surrogateDimLarge(df, Seq(naturalKey), idName, partitions)

  /** Composite-natural-key variant (e.g. team keyed on
    * (name, abbreviation)); ids follow the lexicographic key order.
    */
  def surrogateDimLarge(df: DataFrame, naturalKeys: Seq[String], idName: String,
                        partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val keyCols = naturalKeys.map(col)
    val keys = df.select(keyCols: _*).distinct()
      .repartitionByRange(partitions, keyCols: _*)
      .sortWithinPartitions(naturalKeys.head, naturalKeys.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = org.apache.spark.sql.types.StructType(
      keys.schema.fields :+ org.apache.spark.sql.types.StructField(
        idName, org.apache.spark.sql.types.LongType, nullable = false))
    val rows = keys.toDF().rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    val out = spark.createDataFrame(rows, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // run the data pass now: ids are fixed in the mapping
    keys.unpersist(blocking = false)
    out
  }

  /** Resolve a natural key to its surrogate id by broadcast-joining the
    * dimension (dims are small by construction — never shuffle the fact).
    */
  def resolveFk(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key))

  /** Encode boolean conditions into an int bitflag (+1, +2, +4, ...),
    * mirroring the reference's on-base encoding.
    */
  def bitflags(conds: Seq[Column]): Column =
    conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)

  /** Top-k rows per group with a deterministic tie-break ordering. */
  def topKPerGroup(df: DataFrame, partCols: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rnk", row_number().over(Window.partitionBy(partCols: _*).orderBy(order: _*)))
      .filter(col("rnk") <= k)

  /** 0-based sequence number per group (play_num semantics). */
  def sequenceNumber(df: DataFrame, partCols: Seq[Column], order: Seq[Column], name: String): DataFrame =
    df.withColumn(name, row_number().over(Window.partitionBy(partCols: _*).orderBy(order: _*)) - 1)

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same key exceeds `gapMs`. One shuffle on
    * `key`; everything after is within-partition window arithmetic, so the
    * plan scales linearly with events per key.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val tsMs = unix_millis(ts)
    val newSession = when(
      tsMs - lag(tsMs, 1).over(w) > gapMs || lag(tsMs, 1).over(w).isNull, lit(1)
    ).otherwise(lit(0))
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Backward as-of join: for every left row, attach the payload of the
    * most recent right row with the same key and `tsName <= ` the left
    * row's `tsName` (point-in-time enrichment — trades×quotes, event×last
    * state). Spark has no built-in as-of join; the naive formulations are
    * a range join (O(|L|·|R|) per key) or a per-key collect. This is the
    * scalable shape instead: tag the sides, union them, and run ONE
    * window pass per key ordered by (ts, side, tie) carrying
    * `last(payload, ignoreNulls)` — a single hash shuffle on `keys` and a
    * single within-partition sort, linear in |L|+|R| at any scale.
    *
    * Contract: `right`'s columns are `keys ++ tsName ++ payload`, where
    * the payload names must not collide with `left`'s columns (rename
    * before calling — the right-side timestamp is usually wanted in the
    * output, so pass a renamed copy of it as payload too). Ties resolve
    * deterministically: a right row at exactly the left row's timestamp
    * IS visible (<=, not <), and among right rows sharing (key, ts) the
    * greatest `rightTie` wins — `rightTie` must make (keys, ts, rightTie)
    * unique on the right side or the winner (and thus the output) is
    * nondeterministic. The carry is ROW-atomic: the payload travels as
    * one struct, so the output never stitches values from two different
    * right rows — a NULL inside the chosen row's payload is emitted
    * as-is, not skipped in favor of an older row's value.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsName: String, rightTie: Seq[String] = Nil): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == tsName)
    require(payload.nonEmpty, "right side must carry at least one payload column")
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"right payload columns ${payload.mkString(",")} must not collide with left")
    val unioned = left.withColumn("__side", lit(1))
      .unionByName(right.withColumn("__side", lit(0)), allowMissingColumns = true)
    // right rows (side 0) sort before a left row with the same ts, so the
    // carried `last` sees them; rightTie orders right rows within a tie
    val ord = (col(tsName).asc +: col("__side").asc +: rightTie.map(col(_).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pack the payload into ONE struct carried with a single
    // last(ignoreNulls): the struct is non-NULL exactly for right rows
    // (left rows get a NULL struct, which ignoreNulls skips), so the
    // whole payload of the most recent right row arrives atomically
    val packed = when(col("__side") === 0, struct(payload.map(col): _*))
    val carried = unioned.withColumn("__p", last(packed, ignoreNulls = true).over(w))
    payload.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__p").getField(c))
    }.filter(col("__side") === 1).drop("__side", "__p")
  }

  /** Two-stage (salted) aggregation: pre-aggregate on (key, salt) so a
    * skewed key spreads over `salts` reducers before the final combine.
    * Results are identical to a direct groupBy when the partial and final
    * aggregates compose (sum/count/min/max).
    */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column, salt: Column, sumName: String, cntName: String): DataFrame =
    df.withColumn("__salt", salt)
      .groupBy(key, col("__salt"))
      .agg(sum(valueCol).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(key)
      .agg(sum(col("__ps")).as(sumName), sum(col("__pc")).as(cntName))

  /** Per-group percentile summary over `(column, quantile, outName)`
    * specs, with an explicit exact/approximate split:
    *
    *  - `exact = true` — Spark's `percentile`: a TypedImperativeAggregate
    *    whose buffer holds EVERY distinct group value, so per-group state
    *    is O(group cardinality). That is the oracle twin (DuckDB
    *    quantile_cont is the same sort-based definition) and is correct
    *    at verification scale — and it is NOT a 100 TB operator: a hot
    *    group's value set must fit one aggregation buffer.
    *  - `exact = false` — the scale path: `percentile_approx`
    *    (Greenwald–Khanna quantile sketch; rank error bounded by
    *    1/accuracy, buffer bounded by O(accuracy · log n)), same output
    *    shape. Partial aggregation composes, so the map-side combine
    *    rides the scan like any algebraic aggregate.
    *
    * PlanAuditSpec pins that the scale path plans `approx_percentile`
    * and never the exact aggregate, so no 100 TB posture query can
    * silently pick up the unbounded-buffer variant.
    */
  def percentileSummary(df: DataFrame, groupCol: String,
                        specs: Seq[(String, Double, String)],
                        exact: Boolean, accuracy: Int = 10000): DataFrame = {
    val aggs = specs.map { case (c, q, name) =>
      val agg = if (exact) expr(s"percentile($c, $q)")
                else expr(s"percentile_approx($c, $q, $accuracy)")
      round(agg, 4).as(name)
    } :+ count(lit(1)).as("n")
    df.groupBy(groupCol).agg(aggs.head, aggs.tail: _*).orderBy(groupCol)
  }

  /** Exact-money aggregation column: sum in DECIMAL (associativity-exact,
    * so any partialization / AQE re-plan yields the same value), surfaced
    * as DOUBLE for a stable cross-engine compare.
    */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  def dec2(c: Column): Column = c.cast("decimal(18,2)")
}
