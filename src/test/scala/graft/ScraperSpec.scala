package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.queries.ScrapeSuite
import graft.scrape.{BBRefParse, Scraper}
import graft.sources.{HtmlSource, PageRetriever, Sinks}

/** Serializable fixture-backed stand-in for the web: schedules are
  * synthesized to link fixture games; game/player pages are served from
  * the reference fixture tree; anything else gets an empty page (the 404
  * stand-in — parsers skip malformed pages). Every fetched URL is
  * recorded (local[*] runs executors in-JVM, so the queue sees them all).
  */
object ScraperSpecFixtures {
  val Game1 = "WAS201710120"
  val Game2 = "OAK201903200"

  def gameLink(id: String): String =
    s"""<p class="game"><em><a href="/boxes/${id.take(3)}/$id.shtml">$id</a></em></p>"""

  def schedule(gameIds: String*): String =
    s"<html><body>${gameIds.map(gameLink).mkString}</body></html>"

  val fetched = new ConcurrentLinkedQueue[String]()
  @volatile var scheduleGames: Seq[String] = Seq(Game1, Game2)

  def fetch(url: String): String = {
    fetched.add(url)
    val nameId = BBRefParse.nameIdOf(url)
    if (nameId.contains("schedule")) schedule(scheduleGames: _*)
    else serveFixture(nameId)
  }

  def serveFixture(nameId: String): String = {
    val sub = if (nameId.matches(HtmlSource.GameIdRe)) "GamePage" else "PlayerPage"
    val p = Paths.get(ScrapeSuite.FixtureDir, sub, nameId + ".shtml")
    if (Files.isRegularFile(p)) Files.readString(p) else "<html></html>"
  }

  /** Offline fetcher: schedules are legitimately re-fetched on every run
    * (is_cachable=False semantics) so they are served; any other fetch
    * means the cache failed to serve a page it should have.
    */
  def offlineFetch(url: String): String = {
    fetched.add(url)
    val nameId = BBRefParse.nameIdOf(url)
    if (nameId.contains("schedule")) schedule(scheduleGames: _*)
    else sys.error(s"offline: cache must serve every non-schedule page, got $nameId")
  }
}

class ScraperSpec extends SparkSpec {
  import ScraperSpecFixtures._

  test("scrapeSeasons: schedule seed -> rate-limited crawl -> star schema -> idempotent DB") {
    val cacheDir = Files.createTempDirectory("graft_scrape_cache").toString
    val jdbc = s"jdbc:derby:${Files.createTempDirectory("derby-scrape")}/graftdb;create=true"
    scheduleGames = Seq(Game1, Game2)
    val mk = () => new PageRetriever(cacheDir, ScraperSpecFixtures.fetch, 0L)

    val tables = Scraper.scrapeSeasons(spark, Seq(2020), mk, Some(jdbc))
    assert(tables("game").count() == 2L)
    assert(tables("play").count() > 100L)
    val first = Scraper.InsertOrder
      .map(t => t -> Sinks.readJdbc(spark, jdbc, t).count()).toMap
    assert(first("game") == 2L && first("play") > 100L && first("player") > 0L)

    // re-run with a fetcher that serves ONLY the schedule (which must be
    // re-fetched every run — is_cachable=False) and refuses everything
    // else: every game/player page must come from the cache the first
    // crawl populated, and every upsert must be a no-op (update_db
    // idempotence). A cache miss would surface as an empty page -> empty
    // star tables -> count mismatch.
    fetched.clear()
    Scraper.scrapeSeasons(spark, Seq(2020),
      () => new PageRetriever(cacheDir, offlineFetch, 0L), Some(jdbc))
    val second = Scraper.InsertOrder
      .map(t => t -> Sinks.readJdbc(spark, jdbc, t).count()).toMap
    assert(second == first)
    val refetched = fetched.asScala.map(BBRefParse.nameIdOf).toSet
    assert(refetched == Set("2020-schedule"),
      s"offline re-run must re-fetch exactly the schedule, got $refetched")
  }

  test("re-scraping a grown season discovers the newly played game") {
    val cacheDir = Files.createTempDirectory("graft_scrape_grow").toString
    val jdbc = s"jdbc:derby:${Files.createTempDirectory("derby-grow")}/graftdb;create=true"
    // mid-season: the schedule lists one played game
    scheduleGames = Seq(Game1)
    val mk = () => new PageRetriever(cacheDir, ScraperSpecFixtures.fetch, 0L)
    val t1 = Scraper.scrapeSeasons(spark, Seq(2020), mk, Some(jdbc))
    assert(t1("game").count() == 1L)
    assert(Sinks.readJdbc(spark, jdbc, "game").count() == 1L)

    // the season progresses: the SAME schedule URL now lists a new game.
    // Because schedules are never served from cache, the re-scrape sees
    // the grown schedule and crawls + upserts the new game and its
    // roster — the reference's actual re-scrape behavior (scraper.py:58).
    scheduleGames = Seq(Game1, Game2)
    val t2 = Scraper.scrapeSeasons(spark, Seq(2020), mk, Some(jdbc))
    assert(t2("game").count() == 2L)
    val games = Sinks.readJdbc(spark, jdbc, "game")
    assert(games.count() == 2L)
    assert(games.filter(org.apache.spark.sql.functions.col("game_name_id") === Game2).count() == 1L)
    // plays of the new game landed too, keyed to its surrogate id
    val g2id = games.filter(org.apache.spark.sql.functions.col("game_name_id") === Game2)
      .collect().head.getAs[Long]("game_id")
    assert(Sinks.readJdbc(spark, jdbc, "play")
      .filter(org.apache.spark.sql.functions.col("game_id") === g2id).count() > 0L)
  }

  test("scrapeSeasons surfaces fetch failures and leaves nothing pinned") {
    val cacheDir = Files.createTempDirectory("graft_scrape_fail").toString
    val flaky: String => String = u => {
      val nid = BBRefParse.nameIdOf(u)
      if (nid.contains("schedule")) schedule(Game1, Game2)
      else if (nid == Game2) sys.error("HTTP 503")
      else serveFixture(nid)
    }
    var warned = List.empty[String]
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tables = Scraper.scrapeSeasons(spark, Seq(2020),
      () => new PageRetriever(cacheDir, flaky, 0L), None, None, m => warned ::= m)
    // the parse cache and every id-mapping pin were released: the tables
    // live in the spool, not in executor storage
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"scrapeSeasons leaked pinned RDDs: $leaked")
    // the flaky page is in the returned ledger AND was warned about —
    // never silently dropped from the season
    val fails = tables("fetch_failures").collect()
    assert(fails.map(_.getString(0)).toSeq == Seq(Game2))
    assert(warned.exists(m => m.contains(Game2) && m.contains("503")))
    assert(warned.exists(_.contains("1 page(s) failed")))
    // the healthy game still scraped in full
    assert(tables("game").count() == 1L)
    assert(tables("play").count() > 50L)
  }

  test("a fetched-but-malformed game page lands in the parse_failures ledger") {
    val cacheDir = Files.createTempDirectory("graft_scrape_malformed").toString
    // Game2's page FETCHES fine but carries no scorebox — the reference's
    // MissingPlayDataError shape ("missing play data, skipping",
    // nodes.py:43-47). It must be reported, not silently dropped.
    val malformed: String => String = u => {
      val nid = BBRefParse.nameIdOf(u)
      if (nid.contains("schedule")) schedule(Game1, Game2)
      else if (nid == Game2) "<html><body>no scorebox here</body></html>"
      else serveFixture(nid)
    }
    var warned = List.empty[String]
    val tables = Scraper.scrapeSeasons(spark, Seq(2020),
      () => new PageRetriever(cacheDir, malformed, 0L), None, None, m => warned ::= m)
    // the fetch succeeded, so the fetch ledger is clean...
    assert(!tables("fetch_failures").collect().map(_.getString(0)).contains(Game2))
    // ...but the parse ledger names the page with its reason
    val pf = tables("parse_failures").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pf.exists { case (nid, err) =>
      nid == Game2 && err.contains("missing play data") }, s"ledger: ${pf.toSeq}")
    assert(warned.exists(m => m.contains(Game2) && m.contains("failed to parse")))
    // the healthy game still scraped in full
    assert(tables("game").count() == 1L)
    assert(tables("play").count() > 50L)
  }

  test("ledger warnings are capped: first 20 rows, then a remainder summary") {
    import spark.implicits._
    // a 25-row ledger (a layout change that broke every page) must warn
    // 20 rows + "and 5 more" + the total — never one line per failure
    val ledger = (1 to 25).map(i => (f"page$i%02d", s"boom $i"))
      .toDF("name_id", "err")
    var warned = List.empty[String]
    Scraper.warnLedger(ledger, m => warned ::= m, "broke", t => s"total $t")
    val rows = warned.count(_.contains("broke"))
    assert(rows == Scraper.WarnedLedgerRows, s"warned $rows row lines")
    assert(warned.exists(_.contains("and 5 more")))
    assert(warned.exists(_.contains("total 25")))
    // an empty ledger warns nothing at all
    warned = Nil
    Scraper.warnLedger(ledger.limit(0), m => warned ::= m, "broke", t => s"total $t")
    assert(warned.isEmpty)
  }

  test("entry contract: years outside the reference bounds are rejected") {
    val mk = () => new PageRetriever("/nonexistent", _ => "<html></html>", 0L)
    intercept[IllegalArgumentException] {
      Scraper.scrapeSeasons(spark, Seq(1890), mk, None)
    }
    intercept[IllegalArgumentException] {
      Scraper.scrapeSeasons(spark, Seq(java.time.Year.now.getValue + 1), mk, None)
    }
  }

  test("entry contract: negative crawl delay rejected, impolite delay warned") {
    intercept[IllegalArgumentException](Scraper.checkedDelayMs(-1L))
    var warned = List.empty[String]
    assert(Scraper.checkedDelayMs(1000L, m => warned ::= m) == 1000L)
    assert(warned.exists(_.contains("HIGHLY RECOMMENDED")))
    warned = Nil
    assert(Scraper.checkedDelayMs(5000L, m => warned ::= m) == 5000L)
    assert(warned.isEmpty)
  }
}
