package graft

import java.nio.file.{Files, Paths}

import graft.queries.ScrapeSuite
import graft.scrape.{BBRefParse, Scraper}
import graft.sources.{HtmlSource, PageRetriever, Sinks}

/** Serializable fixture-backed stand-in for the web: schedules are
  * synthesized to link two real fixture games; game/player pages are
  * served from the reference fixture tree; anything else gets an empty
  * page (the 404 stand-in — parsers skip malformed pages).
  */
object ScraperSpecFixtures {
  def fetch(url: String): String = {
    val nameId = BBRefParse.nameIdOf(url)
    if (nameId.contains("schedule"))
      """<html><body>
        |<p class="game"><em><a href="/boxes/WAS/WAS201710120.shtml">g1</a></em></p>
        |<p class="game"><em><a href="/boxes/OAK/OAK201903200.shtml">g2</a></em></p>
        |</body></html>""".stripMargin
    else {
      val sub = if (nameId.matches(HtmlSource.GameIdRe)) "GamePage" else "PlayerPage"
      val p = Paths.get(ScrapeSuite.FixtureDir, sub, nameId + ".shtml")
      if (Files.isRegularFile(p)) Files.readString(p) else "<html></html>"
    }
  }
}

class ScraperSpec extends SparkSpec {

  test("scrapeSeasons: schedule seed -> rate-limited crawl -> star schema -> idempotent DB") {
    val cacheDir = Files.createTempDirectory("graft_scrape_cache").toString
    val jdbc = s"jdbc:derby:${Files.createTempDirectory("derby-scrape")}/graftdb;create=true"
    val mk = () => new PageRetriever(cacheDir, ScraperSpecFixtures.fetch, 0L)

    val tables = Scraper.scrapeSeasons(spark, Seq(2020), mk, Some(jdbc))
    assert(tables("game").count() == 2L)
    assert(tables("play").count() > 100L)
    val first = Scraper.InsertOrder
      .map(t => t -> Sinks.readJdbc(spark, jdbc, t).count()).toMap
    assert(first("game") == 2L && first("play") > 100L && first("player") > 0L)

    // re-run with a fetcher that refuses the network: every page must be
    // served from the cache the first crawl populated (cache-first
    // contract), and every upsert must be a no-op (update_db idempotence)
    val offline = () => new PageRetriever(cacheDir,
      _ => sys.error("offline: cache must serve every page"), 0L)
    Scraper.scrapeSeasons(spark, Seq(2020), offline, Some(jdbc))
    val second = Scraper.InsertOrder
      .map(t => t -> Sinks.readJdbc(spark, jdbc, t).count()).toMap
    assert(second == first)
  }
}
