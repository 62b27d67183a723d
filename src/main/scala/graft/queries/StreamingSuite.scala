package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** §2.4 Structured Streaming operators, all oracle-checked. st2's
  * streamed output is gap-closed sessions plus watermark-timed-out
  * sessions — a deterministic, SQL-expressible set (see
  * EventStreams.sessionize).
  */
object StreamingSuite {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "st1_stream_window_agg" -> ((s, d) => {
      EventStreams.windowedAgg(s, d).orderBy("bucket_s", "event_type")
    }),
    "st2_stream_sessionize" -> ((s, d) => {
      EventStreams.sessionize(s, d).orderBy("user_id", "session_id")
    }),
    "st3_stream_static_join" -> ((s, d) => {
      EventStreams.streamStaticJoin(s, d).orderBy("c_mktsegment")
    }),
    "st4_stream_dedup" -> ((s, d) => {
      EventStreams.streamDedupCount(s, d).orderBy("event_type")
    }),
    "st5_stream_stream_join" -> ((s, d) => {
      EventStreams.streamStreamJoin(s, d).orderBy("user_id")
    }),
    "st6_stream_upsert_sink" -> ((s, d) => {
      EventStreams.streamUpsertSink(s, d).orderBy("user_id")
    }),
    "st7_session_window" -> ((s, d) => {
      EventStreams.sessionWindowAgg(s, d).orderBy("user_id", "start_ms")
    }),
    // transformWithState (the Spark 4 arbitrary-state API) + RocksDB:
    // a per-user running ordinal whose counter state spans micro-batches
    "st8_stream_ordinal" -> ((s, d) => {
      EventStreams.runningOrdinal(s, d).orderBy("user_id", "ordinal")
    }),
    // continuous-ingest dedup: land the corpus index once, then each
    // arriving micro-batch probes it for near-dup pairs and is absorbed
    // so later arrivals pair against it (foreachBatch probe -> absorb)
    "st9_stream_incremental_dedup" -> ((s, d) => {
      graft.streaming.DocStreams.streamIncrementalDedup(s, d)
        .orderBy("id_a", "id_b")
    }),
    // the embedding twin: frozen-centroid semantic index landed once,
    // each arriving micro-batch assigns/probes/absorbs (foreachBatch)
    "st10_stream_semantic_dedup" -> ((s, d) => {
      graft.streaming.DocStreams.streamSemanticDedup(s, d)
        .orderBy("id_a", "id_b")
    }),
    // the st9 loop folded into the ingest decision (d14 per micro-
    // batch): each arriving doc classified against the index as of its
    // arrival — dup iff it near-dups a landed doc, an earlier arrival,
    // or a smaller-id batch mate — then absorbed
    "st11_stream_incremental_survivors" -> ((s, d) => {
      graft.streaming.DocStreams.streamIncrementalSurvivors(s, d)
        .orderBy("doc_id")
    }),
    // the embedding twin (d15 per micro-batch over the st10 loop)
    "st12_stream_semantic_survivors" -> ((s, d) => {
      graft.streaming.DocStreams.streamSemanticSurvivors(s, d)
        .orderBy("vec_id")
    }),
    // d16/d17's boilerplate stage as continuous ingest: each arrival
    // cleaned against the segment-df state as of its arrival (the
    // keep-first rule in arrival order), then its df deltas absorbed
    "st13_stream_line_dedup" -> ((s, d) => {
      graft.streaming.DocStreams.streamLineDedup(s, d)
        .orderBy("doc_id")
    }),
    // continuous vector ingest over the LANDED a10 IVF-PQ index: each
    // arriving micro-batch gets its ADC top-k against the index as of
    // its arrival (frozen quantizer), then absorbs so later arrivals
    // probe it (foreachBatch probe -> verdict spool -> absorb)
    "st14_stream_vector_ingest" -> ((s, d) => {
      graft.streaming.DocStreams.streamIvfPqIngest(s, d)
        .orderBy("vec_id", "rank")
    })
  )

  private def dec(c: String) = s"CAST($c AS DECIMAL(18,2))"

  val oracles: Map[String, String] = Map(
    "st1_stream_window_agg" ->
      s"""SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS bucket_s, event_type,
         |  COUNT(*) AS n, (SUM(${dec("value")}))::DOUBLE AS sum_value
         |FROM events GROUP BY bucket_s, event_type ORDER BY bucket_s, event_type""".stripMargin,

    // Streaming semantics in SQL: sessionize by the 30-min gap, then keep
    // sessions either CLOSED by a later session of the same user or TIMED
    // OUT by the final watermark (max event ts - 2h); Spark's event-time
    // timeout fires on timeoutTimestamp < watermark, hence the strict <.
    "st2_stream_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |wm AS (SELECT MAX(ts_ms) - 7200000 AS w FROM e),
        |flagged AS (
        |  SELECT user_id, ts_ms,
        |    CASE WHEN LAG(ts_ms) OVER win IS NULL THEN 1
        |         WHEN ts_ms - LAG(ts_ms) OVER win > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms)),
        |sess AS (
        |  SELECT user_id, ts_ms,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    COUNT(*) AS n_events, MIN(ts_ms) AS first_ts_ms, MAX(ts_ms) AS last_ts_ms,
        |    MAX(CAST(session_id AS BIGINT)) OVER (PARTITION BY user_id) AS max_sess
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, session_id, n_events, first_ts_ms, last_ts_ms
        |FROM agg, wm
        |WHERE session_id < max_sess OR last_ts_ms + 1800000 < w
        |ORDER BY user_id, session_id""".stripMargin,

    "st3_stream_static_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, (SUM(${dec("value")}))::DOUBLE AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "st4_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "st5_stream_stream_join" ->
      s"""SELECT v.user_id, COUNT(*) AS n_pairs,
         |  (SUM(CAST(p.value AS DECIMAL(18,2))))::DOUBLE AS sum_value
         |FROM events v JOIN events p
         |  ON v.user_id = p.user_id
         | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
         |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
         |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    // Built-in session_window in append mode emits exactly the sessions
    // whose END (last event + 30-min gap) the final watermark
    // (max event ts - 2h) passed — unlike st2 there is no "closed by a
    // later session" emission path; the state store holds a closed-but-
    // unexpired session until the watermark reaches its end.
    "st7_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |wm AS (SELECT MAX(ts_ms) - 7200000 AS w FROM e),
        |flagged AS (
        |  SELECT user_id, ts_ms,
        |    CASE WHEN LAG(ts_ms) OVER win IS NULL THEN 1
        |         WHEN ts_ms - LAG(ts_ms) OVER win > 1800000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms)),
        |sess AS (
        |  SELECT user_id, ts_ms,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, MIN(ts_ms) AS start_ms,
        |    MAX(ts_ms) + 1800000 AS end_ms, COUNT(*) AS n_events
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, start_ms, end_ms, n_events
        |FROM agg, wm WHERE end_ms < w
        |ORDER BY user_id, start_ms""".stripMargin,

    // the sink receives every micro-batch twice; equality with the
    // plain distinct count is the exactly-once guarantee under test
    "st6_stream_upsert_sink" ->
      """SELECT user_id, COUNT(DISTINCT event_id) AS n_rows
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // one drain = one micro-batch, whose per-key rows the processor
    // numbers in (ts_ms, event_id) order — exactly ROW_NUMBER
    "st8_stream_ordinal" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY epoch_ms(ts), event_id) AS BIGINT) AS ordinal
        |FROM events ORDER BY user_id, ordinal""".stripMargin,

    // the d3 MinHash algebra over ALL documents, restricted to pairs
    // involving an arrival (doc_id % 5 >= 3): each pair is emitted by
    // exactly one micro-batch — the one processing its later-arriving
    // member — so the drained union equals this set whatever the
    // chunk order
    "st9_stream_incremental_dedup" ->
      graft.queries.DocumentSuite.minhashPairsSql(
        "id_a % 5 >= 3 OR id_b % 5 >= 3"),

    // the frozen-centroid d10 algebra (centroids from the landed
    // vec_id % 5 < 3 slice) restricted to pairs involving an arrival —
    // each emitted by exactly one micro-batch, the one processing its
    // later-arriving member, so the drained union is chunk-order-free
    "st10_stream_semantic_dedup" ->
      graft.queries.DocumentSuite.semanticPairsSql("WHERE vec_id % 5 < 3",
        "id_a % 5 >= 3 OR id_b % 5 >= 3"),

    // the arrival-ordered earlier-fold over the st9 pair algebra: each
    // arrival's verdict depends only on the landed corpus, earlier
    // chunks (doc_id % ArrivalChunks, mtime-pinned order), and smaller-id chunk
    // mates — so the drained stream equals this single SQL fold
    "st11_stream_incremental_survivors" ->
      graft.queries.DocumentSuite.streamSurvivorsSql,

    // the embedding twin over the st10 frozen-centroid pair algebra
    "st12_stream_semantic_survivors" ->
      graft.queries.DocumentSuite.streamSemanticSurvivorsSql,

    // the arrival-ordered segment fold (keep-first in arrival order)
    "st13_stream_line_dedup" ->
      graft.queries.DocumentSuite.streamLineDedupSql,

    // the frozen-quantizer a10 ADC algebra folded over arrival order:
    // each arrival's top-k among landed vectors and strictly earlier
    // chunks (batch mates are not yet in the index when a chunk probes)
    "st14_stream_vector_ingest" ->
      graft.queries.DocumentSuite.streamIvfPqVerdictsSql
  )
}
