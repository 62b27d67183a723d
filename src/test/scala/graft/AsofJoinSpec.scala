package graft

import graft.operators.Relational

/** Ground truth for the backward as-of join — the boundary and tie cases
  * that distinguish a correct as-of from a plausible-looking one:
  * exact-timestamp visibility (<=, not <), the right-tie winner at an
  * equal timestamp, per-key isolation, and the no-prior-row NULL.
  * The DuckDB LATERAL oracle (q31) is the independent check at sf0.01.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Long, String, Long)],
                  right: Seq[(String, Long, Long, Double)]) = {
    val l = left.toDF("lid", "k", "ts")
    val r = right.toDF("k", "ts", "rid", "rv")
    Relational.asofJoin(l, r, Seq("k"), "ts", Seq("rid"))
      .orderBy("lid")
      .select("lid", "rid", "rv")
      .collect()
      .map(row => (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)),
        if (row.isNullAt(2)) None else Some(row.getDouble(2))))
      .toSeq
  }

  test("asofJoin picks the latest at-or-before right row per key") {
    val out = run(
      left = Seq((1L, "a", 100L), (2L, "a", 250L), (3L, "b", 50L)),
      right = Seq(("a", 90L, 10L, 1.0), ("a", 200L, 11L, 2.0),
        ("a", 300L, 12L, 3.0), ("b", 60L, 20L, 4.0)))
    // lid=1 sees the 90 row (not 200, which is after); lid=2 sees 200
    // (not 300); lid=3 has no right row at-or-before 50 -> NULLs, and
    // never leaks key b's future row or key a's rows
    assert(out == Seq(
      (1L, Some(10L), Some(1.0)),
      (2L, Some(11L), Some(2.0)),
      (3L, None, None)))
  }

  test("asofJoin boundary: a right row AT the left timestamp is visible") {
    val out = run(
      left = Seq((1L, "a", 100L)),
      right = Seq(("a", 100L, 10L, 1.0)))
    assert(out == Seq((1L, Some(10L), Some(1.0))))
  }

  test("asofJoin tie among right rows at one timestamp: greatest rightTie wins") {
    val out = run(
      left = Seq((1L, "a", 100L)),
      right = Seq(("a", 100L, 10L, 1.0), ("a", 100L, 12L, 3.0), ("a", 100L, 11L, 2.0)))
    assert(out == Seq((1L, Some(12L), Some(3.0))))
  }

  test("asofJoin carries the chosen right row ATOMICALLY, NULL payload fields included") {
    // the most recent right row (ts=200) holds rv=NULL: the output must
    // emit that row whole — rid=11 WITH rv NULL — never stitch rid=11
    // with the older row's rv=1.0 (per-column ignoreNulls would)
    val l = Seq((1L, "a", 250L)).toDF("lid", "k", "ts")
    val r = Seq(("a", 90L, 10L, Some(1.0)), ("a", 200L, 11L, None))
      .toDF("k", "ts", "rid", "rv")
    val out = Relational.asofJoin(l, r, Seq("k"), "ts", Seq("rid"))
      .select("lid", "rid", "rv").collect()
    assert(out.length == 1 && out(0).getLong(1) == 11L && out(0).isNullAt(2))
  }

  test("asofJoin fuzz: random keyed timelines with ties match a scalar reference") {
    // randomized (key, ts) timelines with deliberate ts collisions on
    // both sides — the scalar reference applies the documented rule
    // verbatim: latest right at-or-before, ties by greatest rid, None
    // when no prior right row exists
    val rnd = new scala.util.Random(1123)
    val keys = Vector("k1", "k2", "k3")
    val left = (0 until 80).map(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(40).toLong))
    val right = (0 until 60).map(i =>
      (keys(rnd.nextInt(keys.size)), rnd.nextInt(40).toLong, i.toLong, rnd.nextInt(100) / 10.0))
    val got = run(left, right)
    val expected = left.sortBy(_._1).map { case (lid, k, ts) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= ts)
      if (candidates.isEmpty) (lid, None, None)
      else {
        val best = candidates.maxBy(r => (r._2, r._3)) // (ts, rid)
        (lid, Some(best._3), Some(best._4))
      }
    }
    assert(got == expected)
    assert(expected.exists(_._2.isEmpty) && expected.exists(_._2.nonEmpty),
      "fuzz fixture must exercise both the matched and no-prior-row paths")
  }

  test("asofJoin plans one key shuffle and one sort — no range join, no cartesian") {
    val l = Seq((1L, "a", 100L)).toDF("lid", "k", "ts")
    val r = Seq(("a", 90L, 10L, 1.0)).toDF("k", "ts", "rid", "rv")
    val df = Relational.asofJoin(l, r, Seq("k"), "ts", Seq("rid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("hashpartitioning\\(k".r.findAllIn(plan).length == 1,
      s"exactly one key shuffle expected:\n$plan")
  }
}
