package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Randomized scalar-reference fuzz for the relational operators whose
  * contracts are structural (session boundaries, salting invariance,
  * deterministic sampling ranks) — the third correctness leg (SURVEY
  * §6) alongside the DuckDB oracles and the hand-computed specs.
  */
class RelationalFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize fuzz: random per-key timelines match a scalar gap fold") {
    val rnd = new scala.util.Random(606)
    val gapMs = 1000L
    // clustered timestamps so both gap-splits and continuations occur,
    // incl. duplicate timestamps within a key
    val rows = (0 until 200).map { i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong,
        new java.sql.Timestamp(rnd.nextInt(50) * 400L))
    }
    val got = Relational.sessionize(rows.toDF("event_id", "user_id", "ts"),
        col("user_id"), col("ts"), gapMs)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // scalar fold per key over (ts, event_id)-sorted events. Spark's
    // window orders by ts ALONE, so equal-ts rows within a key have an
    // unspecified relative order — but both orders give every equal-ts
    // row the same session id (gap 0 never splits), so the per-event
    // session assignment is still deterministic and comparable.
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      var last = Long.MinValue
      var sid = 0L
      grp.sortBy(r => (r._3.getTime, r._1)).map { case (eid, _, ts) =>
        if (last == Long.MinValue || ts.getTime - last > gapMs) sid += 1
        last = ts.getTime
        eid -> sid
      }
    }.toMap
    assert(got == expected)
    assert(expected.values.toSet.size > 1, "fixture must produce multiple sessions")
  }

  test("salted aggregation fuzz: any salt column leaves sum/count invariant") {
    val rnd = new scala.util.Random(909)
    val rows = (0 until 300).map { i =>
      (i.toLong, s"k${rnd.nextInt(4)}", BigDecimal(rnd.nextInt(10000)) / 100)
    }
    val df = rows.toDF("id", "key", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val plain = df.groupBy("key")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    // salting must be a pure re-bucketing: identical results for a
    // uniform salt, a constant salt (degenerate), and a skewed salt
    Seq(pmod(col("id"), lit(16)), lit(0), pmod(col("id"), lit(2))).foreach { salt =>
      val salted = Relational.saltedSumCount(df, col("key"), col("v"), salt, "s", "n")
        .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(salted == plain, s"salted aggregate diverged under salt $salt")
    }
  }

  test("stratifiedSample fuzz: per-group md5 ranks match a scalar reference") {
    val rnd = new scala.util.Random(4321)
    val rows = (0 until 250).map(i => (i.toLong, s"g${rnd.nextInt(5)}"))
    val quota = 7
    val got = graft.operators.TextAnalysis.stratifiedSample(
        rows.toDF("doc_id", "source"), col("source"), col("doc_id"), quota)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._2).values.flatMap(grp =>
      grp.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(quota)).toSet
    assert(got == expected)
  }
}
