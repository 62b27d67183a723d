package graft.scrape

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{PageRetriever, Sinks}

/** The reference's end-to-end entry point, re-expressed on the engine's
  * tested pieces (deep-field scraper.py:46-60 `scrape_year`: season →
  * schedule URL → `ScrapeNode.scrape(crawl_delay)` → relational DB):
  *
  *   1. seed one schedule URL per season,
  *   2. [[Crawl.crawlAndFetch]] expands schedule → games → players,
  *      fetching every wave through a [[PageRetriever]] (cache-first,
  *      crawl-delay rate limit — the reference's politeness contract),
  *   3. [[Entities.starSchema]] builds venue/team/player/game/play,
  *   4. [[Sinks.jdbcUpsert]] lands each table insert-if-absent on its
  *      natural key, in dependency order (players before games before
  *      plays — pages.py:92-116 update_db), so re-running a season is a
  *      no-op exactly like the reference's exists_in_db skip.
  */
object Scraper {

  /** Natural keys per star table (db/models.py:14-83 unique indexes). */
  val NaturalKeys: Map[String, Seq[String]] = Map(
    "venue" -> Seq("name"),
    "team" -> Seq("name", "abbreviation"),
    "player" -> Seq("name_id"),
    "game" -> Seq("game_name_id"),
    "play" -> Seq("game_id", "play_num"))

  /** Dependency order for relational insert (children first). */
  val InsertOrder: Seq[String] = Seq("venue", "team", "player", "game", "play")

  def scheduleUrl(year: Int): String =
    s"${BBRefParse.BaseUrl}/leagues/MLB/$year-schedule.shtml"

  /** Scrape seasons end-to-end; returns the built star-schema tables.
    * When `jdbcUrl` is set, each table is also upserted idempotently.
    */
  def scrapeSeasons(spark: SparkSession, years: Seq[Int],
                    mk: () => PageRetriever,
                    jdbcUrl: Option[String] = None): Map[String, DataFrame] = {
    val pages = Crawl.crawlAndFetch(spark, years.map(scheduleUrl), mk)
    val tables = Entities.starSchema(pages)
    for (url <- jdbcUrl; table <- InsertOrder)
      Sinks.jdbcUpsert(tables(table), url, table, NaturalKeys(table), 8, 1000)
    tables
  }
}
