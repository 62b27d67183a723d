package graft

import graft.operators.Relational
import graft.sources.Tables

/** The scale path for surrogate-id assignment: surrogateDimLarge must
  * reproduce surrogateDim's dense_rank output exactly while spreading
  * the global sort over range partitions instead of one window
  * partition. Ids are LONG so a dimension past 2^31 keys cannot
  * silently wrap negative.
  */
class SurrogateIdSpec extends SparkSpec {

  test("surrogateDimLarge assigns the identical ids as surrogateDim") {
    val orders = Tables.orders(spark, sfDir)
    val small = Relational.surrogateDim(orders, "o_custkey", "ck_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val large = Relational.surrogateDimLarge(orders, "o_custkey", "ck_id", partitions = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small.nonEmpty)
    assert(large == small)
  }

  test("surrogateDimLarge ids are dense, 1-based longs, in key order") {
    val li = Tables.lineitem(spark, sfDir)
    val ids = Relational.surrogateDimLarge(li, "l_orderkey", "ok_id", partitions = 8)
    assert(ids.schema("ok_id").dataType == org.apache.spark.sql.types.LongType)
    val collected = ids.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(collected.map(_._2).toSeq == (1L to collected.length).toSeq)
    // no single-partition Window in the plan: the sort is range-spread
    val plan = Relational.surrogateDimLarge(li, "l_orderkey", "ok_id", partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("composite-key variant orders ids lexicographically over both keys") {
    import spark.implicits._
    val df = Seq(("b", "x"), ("a", "y"), ("a", "x"), ("b", "w"))
      .toDF("k1", "k2")
    val ids = Relational.surrogateDimLarge(df, Seq("k1", "k2"), "id", partitions = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ids == Map(("a", "x") -> 1L, ("a", "y") -> 2L, ("b", "w") -> 3L, ("b", "x") -> 4L))
  }

  test("surrogateDimLarge pins only the returned mapping, released by unpersist") {
    val li = Tables.lineitem(spark, sfDir)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ids = Relational.surrogateDimLarge(li, "l_orderkey", "ok_id", partitions = 8)
    // the interim distinct-key persist was released inside the builder;
    // what remains pinned is the materialized mapping the caller holds
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.size == 1, s"expected only the mapping pinned, got $during")
    ids.unpersist(blocking = true)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "caller unpersist must release the mapping")
  }

  test("alignedIds keeps stored ids and extends the sequence for new keys") {
    import spark.implicits._
    val stored = Seq(("mays", 7L), ("ruth", 3L)).toDF("name_id", "player_id")
    val corpus = Seq("ruth", "aaron", "mays", "cobb").toDF("name_id")
    val ids = graft.scrape.Entities
      .alignedIds(corpus, Seq("name_id"), "player_id", Some(stored), partitions = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stored ids untouched; new keys continue after max(stored)=7 in key order
    assert(ids == Map("mays" -> 7L, "ruth" -> 3L, "aaron" -> 8L, "cobb" -> 9L))
  }
}
