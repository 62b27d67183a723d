package graft

import graft.engine.GraftSession
import graft.scrape.Entities
import graft.sources.HtmlSource

/** Diagnostic main (VERDICT r10, next-round task 3): attribute the
  * s4/s5 wall-clock growth vs the r07 baseline by splitting the SHARED
  * single-pass game-page extractor from each query's own tail. Since
  * round 9 the extractor runs once per session (ScrapeSuite.parsed
  * memoizes it) and s4 absorbs that cost for the family, so a per-query
  * bench number conflates "the parse got slower" with "s4 now pays the
  * family's parse". This prints the split as one JSON line for
  * bench/BENCH_r{N}_host.txt.
  */
object ParseAttrib {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    def sec[A](f: => A): Double =
      { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    // same session warmup as Bench so JIT/codegen one-time costs don't
    // land on the parse number
    spark.range(1000000).selectExpr("sum(id)").collect()
    val pages = HtmlSource.pages(spark, graft.queries.ScrapeSuite.FixtureDir)
    val parsed = Entities.parsedGames(pages).cache()
    val parseSec = sec(parsed.count()) // the shared mapPartitions extractor
    val s4Sec = sec(Entities.gameStar(Entities.gamesMeta(parsed))
      .orderBy("game_name_id").collect())
    val s5Sec = sec(Entities.resolvePlays(Entities.rawPlays(parsed), Entities.rosters(parsed))
      .orderBy("game_name_id", "play_num").collect())
    println(f"""{"parse_pass_sec":$parseSec%.2f,"s4_tail_sec":$s4Sec%.2f,"s5_tail_sec":$s5Sec%.2f}""")
    spark.stop()
  }
}
