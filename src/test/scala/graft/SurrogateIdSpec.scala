package graft

import graft.operators.Relational
import graft.sources.Tables

/** The scale path for surrogate-id assignment: surrogateDimLarge must
  * reproduce surrogateDim's dense_rank output exactly while spreading
  * the global sort over range partitions instead of one window
  * partition.
  */
class SurrogateIdSpec extends SparkSpec {

  test("surrogateDimLarge assigns the identical ids as surrogateDim") {
    val orders = Tables.orders(spark, sfDir)
    val small = Relational.surrogateDim(orders, "o_custkey", "ck_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val large = Relational.surrogateDimLarge(orders, "o_custkey", "ck_id", partitions = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(small.nonEmpty)
    assert(large == small)
  }

  test("surrogateDimLarge ids are dense, 1-based, in key order") {
    val li = Tables.lineitem(spark, sfDir)
    val ids = Relational.surrogateDimLarge(li, "l_orderkey", "ok_id", partitions = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    assert(ids.map(_._2).toSeq == (1 to ids.length).toSeq)
    // no single-partition Exchange in the plan: the sort is range-spread
    val plan = Relational.surrogateDimLarge(li, "l_orderkey", "ok_id", partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
