package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational._
import graft.sources.Tables

/** §2.1 relational/analytics core: 27 oracle-checked operators.
  *
  * Oracle-parity rules (SURVEY.md §6):
  *  - money/value aggregates computed in DECIMAL (associativity-exact, so
  *    Spark partial aggregation, AQE re-plans, and DuckDB's parallel sums
  *    all produce the same value), surfaced as DOUBLE;
  *  - integer-ish outputs cast to LONG (DuckDB returns BIGINT);
  *  - every query totally ordered with a unique tie-break, and the oracle
  *    carries the same ORDER BY (with NULLS FIRST where rollup/cube emit
  *    nulls, matching Spark's asc_nulls_first default);
  *  - timestamps surfaced as epoch seconds/millis or formatted strings.
  */
object RelationalSuite {
  type Q = (SparkSession, String) => DataFrame

  private val D = "CAST(1 AS DECIMAL(18,2))" // decimal literal 1 for oracles
  private def dec(c: String) = s"CAST($c AS DECIMAL(18,2))"

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q2_filter_pushdown" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
        .select(
          col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy("o_orderkey")
    }),

    "q3_join_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "q4_broadcast_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p  = Tables.part(s, d)
      val su = Tables.supplier(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .groupBy("p_brand")
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    "q5_multi_join" -> ((s, d) => {
      val c  = Tables.customer(s, d)
      val o  = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    }),

    "q6_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q7_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    "q8_window_running" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .withColumn("running_qty", sum("l_quantity").over(w))
        .drop("l_shipdate")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    "q9_window_rank_topk" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      topKPerGroup(joined, Seq(col("c_mktsegment")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"), col("rnk").cast("long").as("rnk"))
        .orderBy("c_mktsegment", "rnk")
    }),

    "q10_window_lag_change" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val prev = lag(col("event_type"), 1).over(w)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("changed",
          when(prev.isNull, lit(0L)).when(prev =!= col("event_type"), lit(1L)).otherwise(lit(0L)))
        .orderBy("user_id", "event_id")
    }),

    "q11_appearance_counter" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("n_purchases",
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w))
        .orderBy("user_id", "event_id")
    }),

    "q12_distinct_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "q13_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      // DataFrame-API rollup directly after a join trips Spark 4.1's
      // ambiguous-column check (even with aliased columns); the SQL path
      // resolves by name and produces the identical Expand+Aggregate plan.
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .createOrReplaceTempView("q13_base")
      s.sql(
        s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct
           |FROM q13_base GROUP BY ROLLUP(r_name, n_name)
           |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    "q14_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q15_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(moneySum(col("l_quantity")))
        .orderBy("l_returnflag")
    }),

    "q16_surrogate_keys" -> ((s, d) => {
      surrogateDim(Tables.customer(s, d), "c_mktsegment", "segment_id")
        .withColumn("segment_id", col("segment_id").cast("long"))
        .orderBy("segment_id")
    }),

    "q17_fk_resolution" -> ((s, d) => {
      val dim = surrogateDim(Tables.customer(s, d), "c_mktsegment", "segment_id")
        .withColumn("segment_id", col("segment_id").cast("long"))
      resolveFk(Tables.customer(s, d).select("c_custkey", "c_mktsegment"), dim, "c_mktsegment")
        .select("c_custkey", "segment_id")
        .orderBy("c_custkey")
    }),

    "q18_bitflag_encode" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("flags", bitflags(Seq(
          col("l_returnflag") === "R",
          col("l_quantity") > 25.0,
          col("l_discount") > 0.05)).cast("long"))
        .groupBy("flags")
        .agg(count(lit(1)).as("n"))
        .orderBy("flags")
    }),

    "q19_enum_decode" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("status_label",
          when(col("o_orderstatus") === "F", "FINISHED")
            .when(col("o_orderstatus") === "O", "OPEN")
            .otherwise("PENDING"))
        .groupBy("status_label")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy("status_label")
    }),

    "q20_sequence_number" -> ((s, d) => {
      sequenceNumber(Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_orderdate"),
        Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")), "seq")
        .select(col("o_custkey"), col("o_orderkey"), col("seq").cast("long").as("seq"))
        .orderBy("o_custkey", "seq")
    }),

    "q21_sessionize" -> ((s, d) => {
      sessionize(Tables.events(s, d), col("user_id"), col("ts"), 1800000L)
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          moneySum(col("value")).as("sum_value"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"))
        .withColumn("session_id", col("session_id").cast("long"))
        .orderBy("user_id", "session_id")
    }),

    // try_cast, not cast: under ANSI mode a string-typed `k` in one
    // document would fail the whole corpus scan — web-scale JSON always
    // contains type garbage, so the posture is null-on-mismatch (the
    // DuckDB oracle TRY_CASTs identically; fuzz drives the garbage shapes)
    "q22_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .withColumn("avg_k", col("sum_k").cast("double") / col("n"))
        .orderBy("event_type")
    }),

    "q23_time_bucket_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("bucket_s"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_s", "event_type")
    }),

    // exact = true is the oracle twin (DuckDB quantile_cont); the 100 TB
    // posture path is percentileSummary(..., exact = false) — see the
    // operator scaladoc and the PlanAuditSpec pin
    "q24_percentiles" -> ((s, d) => {
      percentileSummary(Tables.lineitem(s, d), "l_returnflag",
        Seq(("l_quantity", 0.5, "med_qty"), ("l_extendedprice", 0.9, "p90_price")),
        exact = true)
    }),

    "q25_conditional_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
          sum(when(col("o_orderpriority") === "1-URGENT", dec2(col("o_totalprice")))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("urgent_rev"),
          count(lit(1)).as("n"))
        .withColumn("urgent_share", col("n_urgent").cast("double") / col("n"))
        .orderBy("o_orderstatus")
    }),

    "q26_range_join_bucket" -> ((s, d) => {
      import s.implicits._
      val ranges = Seq(
        ("low", 0.0, 150000.0),
        ("mid", 150000.0, 350000.0),
        ("high", 350000.0, 1000000.0)).toDF("bucket", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(ranges), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy("bucket")
    }),

    "q28_window_range_frame" -> ((s, d) => {
      // RANGE frame (value-based, not row-based): 30-day rolling spend
      // per customer — peers with the same date all join the frame
      val dateS = unix_timestamp(col("o_orderdate"))
      val w = Window.partitionBy("o_custkey").orderBy(col("date_s"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), dateS.as("date_s"),
          col("o_totalprice"))
        .withColumn("rolling_30d",
          sum(dec2(col("o_totalprice"))).over(w).cast("double"))
        .orderBy("o_custkey", "date_s", "o_orderkey")
    }),

    "q29_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def custsOf(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select("o_custkey").distinct()
      custsOf(1996).intersect(custsOf(1997)).orderBy("o_custkey")
    }),

    "q30_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def custsOf(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select("o_custkey").distinct()
      custsOf(1996).except(custsOf(1997)).orderBy("o_custkey")
    }),

    "q31_asof_join" -> ((s, d) => {
      // point-in-time enrichment: each purchase sees the user's most
      // recent view at-or-before it (backward as-of; ties: same-ts view
      // counts, greatest view_event_id wins)
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
          col("event_id").as("view_event_id"),
          unix_millis(col("ts")).as("view_ts_ms"),
          col("value").as("view_value"))
      asofJoin(purchases, views, Seq("user_id"), "ts_ms", Seq("view_event_id"))
        .withColumn("ms_since_view", col("ts_ms") - col("view_ts_ms"))
        .orderBy("event_id")
    }),

    // arbitrary subtotal selection — the grouping construct rollup/cube
    // can't express: ((status, priority), (priority), ()) is neither a
    // rollup chain nor the full cube lattice. One Expand + one
    // aggregation, same single-shuffle plan family as q13/q14.
    "q32_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q27_skew_salted_agg" -> ((s, d) => {
      saltedSumCount(
        Tables.lineitem(s, d), col("l_returnflag"), dec2(col("l_quantity")),
        pmod(col("l_orderkey"), lit(16)), "sum_qty_dec", "n")
        .select(col("l_returnflag"), col("sum_qty_dec").cast("double").as("sum_qty"), col("n"))
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  (SUM(${dec("l_quantity")}))::DOUBLE AS sum_qty,
         |  (SUM(${dec("l_extendedprice")}))::DOUBLE AS sum_base_price,
         |  (SUM(${dec("l_extendedprice")} * ($D - ${dec("l_discount")})))::DOUBLE AS sum_disc_price,
         |  COUNT(*) AS count_order,
         |  (SUM(${dec("l_quantity")}))::DOUBLE / COUNT(*) AS avg_qty,
         |  (SUM(${dec("l_extendedprice")}))::DOUBLE / COUNT(*) AS avg_price
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_pushdown" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q3_join_agg" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  (SUM(${dec("l_extendedprice")} * ($D - ${dec("l_discount")})))::DOUBLE AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q4_broadcast_join" ->
      s"""SELECT p_brand,
         |  (SUM(${dec("l_quantity")}))::DOUBLE AS sum_qty,
         |  (SUM(${dec("l_extendedprice")}))::DOUBLE AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q5_multi_join" ->
      s"""SELECT n_name,
         |  (SUM(${dec("l_extendedprice")} * ($D - ${dec("l_discount")})))::DOUBLE AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q6_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q7_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q8_window_running" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
        |  SUM(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q9_window_rank_topk" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "q10_window_lag_change" ->
      """SELECT user_id, event_id, event_type,
        |  CASE WHEN prev IS NULL THEN 0 WHEN prev <> event_type THEN 1 ELSE 0 END AS changed
        |FROM (SELECT user_id, event_id, event_type,
        |        LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |      FROM events)
        |ORDER BY user_id, event_id""".stripMargin,

    "q11_appearance_counter" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_purchases
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q12_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q13_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, (SUM(${dec("c_acctbal")}))::DOUBLE AS acct
         |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q14_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, (SUM(${dec("o_totalprice")}))::DOUBLE AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q15_pivot" ->
      s"""SELECT l_returnflag,
         |  (SUM(CASE WHEN l_linestatus = 'F' THEN ${dec("l_quantity")} END))::DOUBLE AS "F",
         |  (SUM(CASE WHEN l_linestatus = 'O' THEN ${dec("l_quantity")} END))::DOUBLE AS "O"
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q16_surrogate_keys" ->
      """SELECT c_mktsegment, DENSE_RANK() OVER (ORDER BY c_mktsegment) AS segment_id
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) ORDER BY segment_id""".stripMargin,

    "q17_fk_resolution" ->
      """WITH dim AS (
        |  SELECT c_mktsegment, DENSE_RANK() OVER (ORDER BY c_mktsegment) AS segment_id
        |  FROM (SELECT DISTINCT c_mktsegment FROM customer))
        |SELECT c.c_custkey, dim.segment_id
        |FROM customer c JOIN dim ON c.c_mktsegment = dim.c_mktsegment
        |ORDER BY c.c_custkey""".stripMargin,

    "q18_bitflag_encode" ->
      """SELECT CAST(
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |  + CASE WHEN l_quantity > 25.0 THEN 2 ELSE 0 END
        |  + CASE WHEN l_discount > 0.05 THEN 4 ELSE 0 END AS BIGINT) AS flags,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY flags ORDER BY flags""".stripMargin,

    "q19_enum_decode" ->
      s"""SELECT CASE WHEN o_orderstatus = 'F' THEN 'FINISHED'
         |           WHEN o_orderstatus = 'O' THEN 'OPEN'
         |           ELSE 'PENDING' END AS status_label,
         |  COUNT(*) AS n, (SUM(${dec("o_totalprice")}))::DOUBLE AS total
         |FROM orders GROUP BY status_label ORDER BY status_label""".stripMargin,

    "q20_sequence_number" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS seq
        |FROM orders ORDER BY o_custkey, seq""".stripMargin,

    "q21_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL THEN 1
         |         WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (
         |  SELECT user_id, event_id, value,
         |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
         |  (SUM(${dec("value")}))::DOUBLE AS sum_value,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
         |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q22_json_extract" ->
      """SELECT event_type, CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n,
        |  SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::DOUBLE / COUNT(*) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q23_time_bucket_agg" ->
      s"""SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS bucket_s, event_type,
         |  COUNT(*) AS n, (SUM(${dec("value")}))::DOUBLE AS sum_value
         |FROM events GROUP BY bucket_s, event_type ORDER BY bucket_s, event_type""".stripMargin,

    "q24_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q25_conditional_agg" ->
      s"""SELECT o_orderstatus,
         |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
         |  (SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN ${dec("o_totalprice")}
         |            ELSE CAST(0 AS DECIMAL(18,2)) END))::DOUBLE AS urgent_rev,
         |  COUNT(*) AS n,
         |  SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) AS urgent_share
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q26_range_join_bucket" ->
      s"""SELECT bucket, COUNT(*) AS n, (SUM(${dec("o_totalprice")}))::DOUBLE AS total
         |FROM orders
         |JOIN (VALUES ('low', 0.0, 150000.0), ('mid', 150000.0, 350000.0), ('high', 350000.0, 1000000.0))
         |  AS r(bucket, lo, hi)
         |  ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q27_skew_salted_agg" ->
      s"""SELECT l_returnflag, (SUM(${dec("l_quantity")}))::DOUBLE AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_window_range_frame" ->
      s"""SELECT o_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS date_s, o_totalprice,
         |  (SUM(${dec("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)::BIGINT
         |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW))::DOUBLE AS rolling_30d
         |FROM orders ORDER BY o_custkey, date_s, o_orderkey""".stripMargin,

    "q29_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin,

    "q30_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin,

    // the as-of semantics spelled out imperatively: latest view per
    // purchase via LATERAL top-1 — same <= boundary, same
    // (ts desc, event_id desc) tie-break as the union-window operator
    "q31_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
        |           FROM events WHERE event_type = 'purchase'),
        |     r AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id AS view_event_id, value AS view_value
        |           FROM events WHERE event_type = 'view')
        |SELECT l.event_id, l.user_id, l.ts_ms, l.value,
        |       v.view_event_id, v.ts_ms AS view_ts_ms, v.view_value,
        |       l.ts_ms - v.ts_ms AS ms_since_view
        |FROM l LEFT JOIN LATERAL (
        |  SELECT * FROM r WHERE r.user_id = l.user_id AND r.ts_ms <= l.ts_ms
        |  ORDER BY r.ts_ms DESC, r.view_event_id DESC LIMIT 1) v ON true
        |ORDER BY l.event_id""".stripMargin,

    "q32_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, (SUM(${dec("o_totalprice")}))::DOUBLE AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  )
}
