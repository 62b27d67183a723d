package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-gate contracts added in round 10 — no Spark session,
  * so the suite is effectively free.
  *
  * The gate order is load-bearing: the driver's Verify/Bench window is
  * wall-clock-bounded, and round 9 lost 12 green CORRECTNESS rows
  * because the alphabetical order ran the expensive scrape/streaming
  * tail before the sub-10-second text queries. A future operator whose
  * key slips into the wrong family would silently re-create that
  * failure mode.
  */
class GateOrderSpec extends AnyFunSuite {

  test("gateOrder is a permutation of its input") {
    val names = SparkEntry.queries.keys.toSeq
    assert(SparkEntry.gateOrder(names).sorted == names.sorted)
  }

  test("every cheap-family query precedes the heavy scrape + streaming tail") {
    val ordered = SparkEntry.gateOrder(SparkEntry.queries.keys)
    val pos = ordered.zipWithIndex.toMap
    val heavy = Set("s4_game_meta_parse", "s5_play_parse",
      "s6_star_schema_build", "s7_player_stats") ++
      ordered.filter(_.startsWith("st"))
    val cheap = ordered.filterNot(heavy)
    assert(cheap.nonEmpty && heavy.nonEmpty)
    assert(cheap.map(pos).max < heavy.map(pos).min,
      s"a heavy query runs before a cheap one: ${ordered.mkString(", ")}")
    val nStream = ordered.count(_.startsWith("st"))
    assert(ordered.takeRight(nStream).forall(_.startsWith("st")),
      "the streaming drains must run last (most micro-batch overhead under contention)")
    // s7 aggregates over the memoized star build: after s6 it reuses the
    // landed tables; before s6 it pays the full parse+build cost itself
    assert(pos("s6_star_schema_build") < pos("s7_player_stats"),
      "s7 must follow s6 to reuse the shared star build")
  }

  test("every query is oracle-checked — full DuckDB coverage, no rows-only keys") {
    // r11 closed the last gap: s8's multi-wave crawl replays as a
    // maxWaves-bounded unrolled BFS union (ScrapeSuite.s8OracleSql), so
    // a new operator shipping without an oracle is a regression, not a
    // declaration.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"undeclared rows-only queries: $noOracle")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle SQL without a query: $orphaned")
  }

  test("fastTempRoot allocates a writable dir, on tmpfs when available") {
    val dir = graft.sources.Spool.fastTempRoot("gatespec")
    val p = java.nio.file.Paths.get(dir)
    assert(java.nio.file.Files.isDirectory(p) && java.nio.file.Files.isWritable(p))
    if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      assert(dir.startsWith("/dev/shm/"),
        s"tmpfs available but fastTempRoot chose $dir")
  }
}
