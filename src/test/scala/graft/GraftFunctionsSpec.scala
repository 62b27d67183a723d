package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{GraftFunctions, HashKernels}

class GraftFunctionsSpec extends SparkSpec {

  test("runtime registration: SQL functions match the Column API kernels") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_fnv61('abc') AS h,
        |       graft_simhash64(array('a', 'b', 'c')) AS sh,
        |       graft_fingerprint('the quick brown fox jumps over it', 16) AS fp,
        |       graft_minhash(array('a b c', 'b c d'), 8) AS mh,
        |       graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |       graft_hyperplane_sig(array(0.5F, -0.5F, 1.0F), 0, 4) AS hp
        |""".stripMargin).head()
    assert(r.getAs[Long]("h") ==
      HashKernels.mod61(HashKernels.fnv1a64String("abc")))
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getAs[scala.collection.Seq[Long]]("mh").length == 8)
    val hp = r.getAs[Int]("hp")
    assert(hp >= 0 && hp < 16) // 4 planes → 4-bit bucket id
    // same kernel as the Column API — spot-check one against the bridge
    import org.apache.spark.sql.functions.lit
    val viaColumn = spark.range(1)
      .select(graft.functions.HashExpressions.fnv61(lit("abc")).as("h"))
      .head().getAs[Long]("h")
    assert(r.getAs[Long]("h") == viaColumn)
  }

  test("r13 kernel functions resolve in SQL and match their Column twins") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_char_stats('aab').total AS ct,
        |       graft_ngrams(array('a', 'b', 'c'), 2) AS ng,
        |       graft_ngram_stats(array('a', 'b', 'a', 'b'), 2) AS ns,
        |       graft_lang_scores('the the der').s_en AS sen,
        |       graft_int8_stats(array(1.0F, -0.5F)).q_max AS qmax,
        |       graft_int8_codes(array(1.0F, -0.5F)) AS codes,
        |       graft_long_dot(array(2L, 3L), array(4L, 5L)) AS dot,
        |       graft_sql2(array(1.0F, 0.0F), array(0.0F, 0.0F)) AS sl,
        |       graft_cosine_raw(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS cr,
        |       graft_long_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS eq
        |""".stripMargin).head()
    assert(r.getAs[Long]("ct") == 3L)
    assert(r.getAs[scala.collection.Seq[String]]("ng") == Seq("a b", "b c"))
    assert(r.getAs[org.apache.spark.sql.Row]("ns").getLong(1) == 2L) // distinct
    assert(r.getAs[Long]("sen") == 2L)
    assert(r.getAs[Long]("qmax") == 127L)
    assert(r.getAs[scala.collection.Seq[Long]]("codes") == Seq(127L, -63L))
    assert(r.getAs[Long]("dot") == 23L)
    assert(r.getAs[Double]("sl") == 1.0)
    assert(r.getAs[Double]("cr") == 1.0)
    assert(r.getAs[Long]("eq") == 2L)
  }

  test("graft_ngrams is total on the SQL surface: size < n yields an empty array") {
    // r13 ADVICE: the registered SQL function must not fail the job on
    // an ungated short array. The column twin errors on that branch
    // (descending sequence → non-positive slice start), so internal
    // callers still gate with size >= n; the public surface degrades
    // to zero shingles instead.
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_ngrams(array('a'), 3) AS short,
        |       graft_ngrams(array(), 2) AS empty,
        |       graft_ngrams(array('a', 'b', 'c'), 3) AS exact
        |""".stripMargin).head()
    assert(r.getAs[scala.collection.Seq[String]]("short").isEmpty)
    assert(r.getAs[scala.collection.Seq[String]]("empty").isEmpty)
    assert(r.getAs[scala.collection.Seq[String]]("exact") == Seq("a b c"))
  }

  test("longEqCount mirrors the zip_with+IF twin on null elements and ragged lengths") {
    // r13 review: IF(x = y, …) with a null side takes the ELSE (0), and
    // zip_with pads the shorter array — the twin never returns null for
    // non-null arrays. Evaluate BOTH side by side on the pathological
    // shapes and require equality.
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_long_eq_count(a, b) AS k,
        |       aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1L, 0L)), 0L, (acc, v) -> acc + v) AS t
        |FROM VALUES
        |  (array(1L, NULL, 3L), array(1L, NULL, 3L)),
        |  (array(1L, 2L),       array(1L, 2L, 9L)),
        |  (array(CAST(NULL AS BIGINT)), array(CAST(NULL AS BIGINT))),
        |  (array(1L, 2L, 3L),   array(3L, 2L, 1L))
        |AS v(a, b)""".stripMargin).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1) && r.getLong(0) == r.getLong(1),
        s"kernel/twin diverged: $r")
    }
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 2L, 0L, 1L))
  }

  test("SQL functions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.sql("SELECT graft_fnv61(CAST(id AS STRING)) AS h FROM range(10)")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*graft_fnv61""".r.findFirstIn(plan).isDefined,
      s"graft_fnv61 must stay inside whole-stage codegen:\n$plan")
  }

  test("structural parameters must be integer literals (clear error otherwise)") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("deploy-time extensions: a session created with GraftExtensions resolves the functions") {
    // build a SECOND session over the SAME SparkContext with the
    // extensions applied at creation (the spark.sql.extensions route);
    // clear the cached sessions first or getOrCreate would return the
    // shared harness session untouched, then restore them. A suite
    // whose lazy session init lands inside this clear/restore window
    // would mint its own session instead of reusing the shared one —
    // benign (same context, same GraftSession confs), so the window is
    // not serialized.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master(spark.sparkContext.master)
        .withExtensions(new graft.engine.GraftExtensions)
        .getOrCreate()
      val h = s2.sql("SELECT graft_fnv61('abc') AS h").head().getAs[Long]("h")
      assert(h == HashKernels.mod61(HashKernels.fnv1a64String("abc")))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
