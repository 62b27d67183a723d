package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pins the loader contracts in [[graft.sources.Tables]] — above all the
  * events.ts physical-type normalization, whose failure mode is a silent
  * 1000x timestamp scale error (ADVICE r10).
  */
class TablesSpec extends SparkSpec {

  test("normalizeEventTs truncates a nanos LONG ts to micros") {
    import spark.implicits._
    // 2025-01-01T00:00:00.123456789Z — the trailing 789 ns must truncate,
    // not round (matching how every downstream ms/sec comparison floors)
    val out = Tables.normalizeEventTs(Seq(1735689600123456789L).toDF("ts"))
    assert(out.schema("ts").dataType.typeName == "timestamp")
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == 1735689600123456L)
  }

  test("normalizeEventTs raises on a non-nanos INT64 ts instead of scaling it 1000x") {
    import spark.implicits._
    // the same instant encoded as MILLIS: under the old behavior this
    // would silently become 1970-01-21; now it must fail loudly
    val e = intercept[Exception] {
      Tables.normalizeEventTs(Seq(1735689600123L).toDF("ts")).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("nanos"), s"unexpected error chain:\n$chain")
  }

  test("events loader surfaces ts as a micros timestamp at gate scale") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    // plausibility: every testdata generation puts events in 2020-2030
    val (lo, hi) = (1577836800L, 1893456000L)
    val r = ev.agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts")))).head
    assert(r.getLong(0) >= lo && r.getLong(1) <= hi,
      s"events.ts outside the plausible window: ${r.getLong(0)}..${r.getLong(1)}")
  }
}
