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

  test("window-family fuzz: running sums, top-k, lag flags and sequence numbers match scalar folds") {
    // one random keyed event stream exercises the q8/q9/q10/q11/q20
    // window constructs against scalar per-key folds. The ordering
    // column is a TOTAL order within each key (the q8 rule: every
    // window query orders by a tie-broken column list), values repeat
    // across rows so top-k ties are real and lag sees genuine runs.
    val rnd = new scala.util.Random(8888)
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, // id, key
        Seq("a", "b", "c")(rnd.nextInt(3)), // type
        rnd.nextInt(20).toLong) // qty (repeats => rank ties)
    }
    val df = rows.toDF("id", "key", "typ", "qty")
    val byKey = rows.groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap

    // q8: running sum over rowsBetween(unboundedPreceding, current)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val running = df.withColumn("r", sum("qty").over(wRun))
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val runningRef = byKey.values.flatMap { es =>
      es.scanLeft(((-1L), 0L)) { case ((_, acc), e) => (e._1, acc + e._4) }.drop(1)
    }.toMap
    assert(running == runningRef, "q8 running sum")

    // q9: top-3 per key by (qty desc, id asc) — rank AND membership
    val topk = Relational.topKPerGroup(df, Seq(col("key")),
        Seq(col("qty").desc, col("id").asc), 3)
      .select("key", "id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val topkRef = byKey.flatMap { case (k, es) =>
      es.sortBy(e => (-e._4, e._1)).take(3).zipWithIndex
        .map { case (e, i) => (k, e._1, i + 1) }
    }.toSet
    assert(topk == topkRef, "q9 top-k")

    // q10: lag-change flag (first row of a key is 0)
    val changed = df.withColumn("c",
        when(lag(col("typ"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("id")).isNull, lit(0L))
          .when(lag(col("typ"), 1).over(org.apache.spark.sql.expressions.Window
            .partitionBy("key").orderBy("id")) =!= col("typ"), lit(1L))
          .otherwise(lit(0L)))
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changedRef = byKey.values.flatMap { es =>
      es.zip(None +: es.map(e => Some(e._3))).map { case (e, prev) =>
        e._1 -> (if (prev.exists(_ != e._3)) 1L else 0L)
      }
    }.toMap
    assert(changed == changedRef, "q10 lag change")

    // q11: conditional running count of type 'a'
    val appear = df.withColumn("n",
        sum(when(col("typ") === "a", 1L).otherwise(0L)).over(wRun))
      .select("id", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val appearRef = byKey.values.flatMap { es =>
      es.scanLeft(((-1L), 0L)) { case ((_, acc), e) =>
        (e._1, acc + (if (e._3 == "a") 1L else 0L))
      }.drop(1)
    }.toMap
    assert(appear == appearRef, "q11 appearance counter")

    // q20: 0-based sequence numbers per key
    val seqn = Relational.sequenceNumber(df, Seq(col("key")), Seq(col("id")), "sn")
      .select("id", "sn").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val seqRef = byKey.values.flatMap(es => es.zipWithIndex.map { case (e, i) => e._1 -> i }).toMap
    assert(seqn == seqRef, "q20 sequence number")
    assert(byKey.values.exists(_.size > 10), "fixture must have deep keys")
  }

  // --- grouping constructs (q13 rollup / q14 cube / q32 grouping sets) ------
  //
  // Scalar reference: a grouping construct is exactly the concatenation
  // of one plain GROUP BY per grouping set, with the columns outside the
  // set masked to NULL. The reference computes that multiset directly —
  // including the case the oracle data never exercises: an input key
  // that is ITSELF null produces a (null, …) group row that coexists
  // with the subtotal row of the same shape (they differ only by
  // grouping_id, which the q13/q14/q32 outputs drop), so the comparison
  // must be a multiset, never a set or a map.
  private def groupingRef(rows: Seq[(Option[String], Option[String], Long)],
                          sets: Seq[Seq[Int]]): Map[(Option[String], Option[String]), Seq[(Long, Long)]] =
    sets.flatMap { set =>
      rows.groupBy(r => (if (set.contains(0)) r._1 else None,
          if (set.contains(1)) r._2 else None))
        .map { case (k, grp) => (k, (grp.size.toLong, grp.map(_._3).sum)) }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }

  private def groupingFuzzRows(seed: Int): Seq[(Option[String], Option[String], Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until 300).map { _ =>
      val a = if (rnd.nextInt(10) == 0) None else Some(s"a${rnd.nextInt(3)}")
      val b = if (rnd.nextInt(10) == 0) None else Some(s"b${rnd.nextInt(4)}")
      (a, b, rnd.nextInt(1000).toLong)
    }
  }

  private def collectGrouping(df: org.apache.spark.sql.DataFrame): Map[(Option[String], Option[String]), Seq[(Long, Long)]] =
    df.collect().toSeq
      .map(r => ((Option(r.getString(0)), Option(r.getString(1))),
        (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }

  test("rollup/cube/grouping-sets fuzz: subtotal lattice matches a scalar per-set group-by") {
    val rows = groupingFuzzRows(1313)
    val df = rows.map(r => (r._1.orNull, r._2.orNull, r._3)).toDF("a", "b", "v")
    // rollup(a, b): {(a,b), (a), ()}
    assert(collectGrouping(
      df.rollup("a", "b").agg(count(lit(1)).as("n"), sum("v").as("s"))) ==
      groupingRef(rows, Seq(Seq(0, 1), Seq(0), Seq.empty)), "rollup")
    // cube(a, b): the full lattice
    assert(collectGrouping(
      df.cube("a", "b").agg(count(lit(1)).as("n"), sum("v").as("s"))) ==
      groupingRef(rows, Seq(Seq(0, 1), Seq(0), Seq(1), Seq.empty)), "cube")
    // the q32 shape: ((a,b), (b), ()) — neither a rollup chain nor a cube
    assert(collectGrouping(
      df.groupingSets(Seq(Seq(col("a"), col("b")), Seq(col("b")), Seq.empty),
          col("a"), col("b"))
        .agg(count(lit(1)).as("n"), sum("v").as("s"))) ==
      groupingRef(rows, Seq(Seq(0, 1), Seq(1), Seq.empty)), "groupingSets")
    // the null-key-vs-subtotal collision must actually occur in the fixture
    assert(rows.exists(_._1.isEmpty) && rows.exists(_._2.isEmpty),
      "fixture must contain null input keys")
  }

  test("range-join fuzz: half-open bucket classification matches a scalar scan") {
    // q26's construct: fact ⋈ broadcast(ranges) ON v >= lo AND v < hi.
    // Buckets deliberately OVERLAP (a value can land in two) and leave
    // GAPS (a value can land in none → row drops out of the inner
    // join); a third of the values sit exactly ON a boundary so the
    // >=lo / <hi half-open contract is pinned, not assumed.
    val rnd = new scala.util.Random(2626)
    val bounds = Seq(0L, 100L, 250L, 400L, 700L)
    val ranges = Seq(
      ("r0", 0L, 250L), ("r1", 100L, 400L), // overlap on [100, 250)
      ("r2", 500L, 700L))                   // gap on [400, 500)
    val rows = (0 until 400).map { i =>
      val v = rnd.nextInt(3) match {
        case 0 => bounds(rnd.nextInt(bounds.size))       // exactly on an edge
        case _ => rnd.nextInt(800).toLong
      }
      (i.toLong, v)
    }
    val got = rows.toDF("id", "v")
      .join(broadcast(ranges.toDF("bucket", "lo", "hi")),
        col("v") >= col("lo") && col("v") < col("hi"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = ranges.map { case (b, lo, hi) =>
      val in = rows.filter(r => r._2 >= lo && r._2 < hi)
      (b, in.size.toLong, in.map(_._2).sum)
    }.filter(_._2 > 0).toSet
    assert(got == expected)
    val assigned = rows.count(r => ranges.exists(g => r._2 >= g._2 && r._2 < g._3))
    assert(assigned < rows.size, "fixture must drop some rows (gap)")
    assert(rows.map(r => ranges.count(g => r._2 >= g._2 && r._2 < g._3)).max == 2,
      "fixture must double-assign some rows (overlap)")
  }

  test("rangeBetween fuzz: value-window frames match a scalar peer-inclusive sum") {
    // q28's construct: sum over RANGE BETWEEN -G AND CURRENT ROW per
    // key. The frame is VALUE-based: all peers (equal ordering value)
    // of the current row join its frame — duplicated ordering values
    // are generated on purpose, as are rows exactly G apart (frame
    // edge inclusive on both ends).
    val rnd = new scala.util.Random(2828)
    val G = 10L
    val rows = (0 until 300).map { i =>
      val key = rnd.nextInt(4)
      // coarse grid ⇒ many exact ties and many exactly-G gaps
      val ord = (rnd.nextInt(12) * 5).toLong
      (i.toLong, key, ord, rnd.nextInt(100).toLong)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("ord")).rangeBetween(-G, 0)
    val got = rows.toDF("id", "key", "ord", "v")
      .withColumn("roll", sum("v").over(w))
      .select("id", "roll").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.map { case (id, key, ord, _) =>
      id -> rows.filter(r => r._2 == key && r._3 >= ord - G && r._3 <= ord)
        .map(_._4).sum
    }.toMap
    assert(got == expected)
    assert(rows.groupBy(r => (r._2, r._3)).values.exists(_.size > 1),
      "fixture must contain peer rows")
  }

  test("pivot fuzz: random group×status grids match a scalar per-cell sum (absent cells null)") {
    val rnd = new scala.util.Random(1515)
    val statuses = Seq("F", "O", "X")
    (1 to 3).foreach { trial =>
      // deterministic hole (g0 never draws X) plus random fill — the
      // pivot must surface the empty cell as null, not 0
      val rows = (0 until 150).map { _ =>
        val flag = s"g${rnd.nextInt(4)}"
        val st = statuses(rnd.nextInt(3))
        (flag, if (flag == "g0" && st == "X") "F" else st, rnd.nextInt(1000).toLong)
      }
      val got = rows.toDF("flag", "status", "v")
        .groupBy("flag").pivot("status", statuses).agg(sum("v"))
        .collect()
        .map(r => r.getString(0) ->
          statuses.indices.map(i => if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))))
        .toMap
      val expected = rows.map(_._1).distinct.map { f =>
        f -> statuses.map { st =>
          val cell = rows.filter(r => r._1 == f && r._2 == st).map(_._3)
          if (cell.isEmpty) None else Some(cell.sum)
        }
      }.toMap
      assert(got == expected, s"trial $trial")
      assert(expected.values.exists(_.contains(None)), s"trial $trial: no empty cell exercised")
    }
  }

  test("json-extract fuzz: adversarial props shapes match a scalar extraction reference") {
    val rnd = new scala.util.Random(2222)
    // every shape get_json_object meets in the wild: present key, missing
    // key, string-typed value (long cast → null), nested object value
    // (cast → null), malformed document, null column
    val rows = (0 until 200).map { i =>
      val t = s"t${rnd.nextInt(3)}"
      rnd.nextInt(6) match {
        case 0 | 1 => val v = rnd.nextInt(1000).toLong
          (i.toLong, t, s"""{"k": $v, "pad": ${rnd.nextInt(9)}}""", Some(v))
        case 2 => (i.toLong, t, s"""{"x": ${rnd.nextInt(1000)}}""", None)
        case 3 => (i.toLong, t, s"""{"k": "s${rnd.nextInt(9)}"}""", None)
        case 4 => (i.toLong, t, s"""{"k": {"inner": 1}}""", None)
        case _ => (i.toLong, t, """{broken""", None)
      }
    }
    // the same null-on-mismatch extraction q22 ships (ANSI cast would
    // fail the scan on the string-typed shape)
    val got = rows.map(r => (r._1, r._2, r._3)).toDF("id", "event_type", "props")
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy(_._2).map { case (t, grp) =>
      t -> (grp.flatMap(_._4).sum, grp.size.toLong)
    }
    assert(got == expected)
    assert(rows.exists(_._4.isEmpty) && rows.exists(_._4.isDefined),
      "fixture must mix extractable and null shapes")
  }

  test("time-bucket fuzz: tumbling hourly windows match a scalar epoch floor") {
    val rnd = new scala.util.Random(3333)
    // second-offset draws hug the bucket edges (0 and 3599 inclusive)
    val rows = (0 until 300).map { i =>
      val bucket = rnd.nextInt(8).toLong * 3600L
      val sec = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => 3599L
        case _ => rnd.nextInt(3600).toLong
      }
      (i.toLong, new java.sql.Timestamp((bucket + sec) * 1000L), rnd.nextInt(100).toLong)
    }
    val got = rows.toDF("id", "ts", "v")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .select(unix_timestamp(col("w.start")).as("b"), col("n"), col("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy(r => (r._2.getTime / 1000L) / 3600L * 3600L)
      .map { case (b, grp) => b -> (grp.size.toLong, grp.map(_._3).sum) }
    assert(got == expected)
    assert(rows.exists(_._2.getTime % 3600000L == 0L),
      "fixture must exercise the exact bucket-start edge")
  }
}
