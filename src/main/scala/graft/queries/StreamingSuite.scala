package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** §2.4 Structured Streaming operators. st1 is oracle-checked (the
  * streaming result must equal the batch aggregation); st2 is rows-only
  * (closed sessions — checked against batch sessionize in StreamingSpec).
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
    })
  )

  private def dec(c: String) = s"CAST($c AS DECIMAL(18,2))"

  val oracles: Map[String, String] = Map(
    "st1_stream_window_agg" ->
      s"""SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS bucket_s, event_type,
         |  COUNT(*) AS n, (SUM(${dec("value")}))::DOUBLE AS sum_value
         |FROM events GROUP BY bucket_s, event_type ORDER BY bucket_s, event_type""".stripMargin,

    "st3_stream_static_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, (SUM(${dec("value")}))::DOUBLE AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "st4_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
