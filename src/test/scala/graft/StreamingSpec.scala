package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  test("st1: streaming windowed agg equals the batch aggregation") {
    val streamed = EventStreams.windowedAgg(spark, sfDir)
      .orderBy("bucket_s", "event_type").collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_s"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket_s", "event_type").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("st2: streamed closed sessions match batch sessionize") {
    val streamed = EventStreams.sessionize(spark, sfDir)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))
    assert(streamed.nonEmpty)

    // batch ground truth: same gap rule; drop each user's LAST session
    // (still open at end-of-stream, so the streaming side never emits it)
    val batch = Relational.sessionize(Tables.events(spark, sfDir), col("user_id"), col("ts"), 1800000L)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("max_sess",
        max("session_id").over(org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("session_id") < col("max_sess"))
      .select("user_id", "session_id", "n_events")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))

    assert(streamed.toSet == batch.toSet,
      s"streamed=${streamed.length} batch=${batch.length}")
  }
}
