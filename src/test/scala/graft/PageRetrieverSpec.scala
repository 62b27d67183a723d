package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HtmlSource, PageRetriever}

/** Reference semantics under test: cache-first retrieval, fetch-on-miss
  * with cache insert, and the crawl delay between consecutive fetches
  * (deep-field scraping/pages.py:118-312, BBREF_CRAWL_DELAY).
  */
class PageRetrieverSpec extends AnyFunSuite {

  private def tmpCache(): String =
    Files.createTempDirectory("graft_cache").toString

  private class Fake(delayMs: Long, cacheDir: String,
                     pages: Map[String, String] = Map.empty) {
    var now = 0L
    val fetched = ArrayBuffer.empty[(Long, String)] // (time, url)
    val sleeps = ArrayBuffer.empty[Long]
    val retriever = new PageRetriever(
      cacheDir,
      url => { fetched += ((now, url)); pages.getOrElse(url, s"<html>$url</html>") },
      delayMs,
      clock = () => now,
      sleep = d => { sleeps += d; now += d })
  }

  test("cache hit never calls fetch and never sleeps") {
    val dir = tmpCache()
    Files.write(Paths.get(dir, "vendipa01.shtml"),
      "<html>cached</html>".getBytes(StandardCharsets.UTF_8))
    val f = new Fake(3000, dir)
    val html = f.retriever.page("https://example.test/players/v/vendipa01.shtml")
    assert(html == "<html>cached</html>")
    assert(f.fetched.isEmpty && f.sleeps.isEmpty)
  }

  test("miss fetches once, inserts into the cache, then hits") {
    val dir = tmpCache()
    val f = new Fake(3000, dir)
    val url = "https://example.test/boxes/WAS/WAS201710120.shtml"
    val first = f.retriever.page(url)
    val second = f.retriever.page(url)
    assert(first == second)
    assert(f.fetched.map(_._2) == Seq(url)) // second call served from cache
    assert(Files.isRegularFile(Paths.get(dir, "WAS201710120.shtml")))
  }

  test("consecutive misses honor the crawl delay") {
    val f = new Fake(3000, tmpCache())
    f.retriever.page("https://example.test/a01.shtml")
    f.retriever.page("https://example.test/b01.shtml")
    f.retriever.page("https://example.test/c01.shtml")
    // first fetch immediate; each later fetch waits out the full delay
    assert(f.sleeps == Seq(3000L, 3000L))
    assert(f.fetched.map(_._1) == Seq(0L, 3000L, 6000L))
  }

  test("schedule pages are never served from cache but still write through") {
    val dir = tmpCache()
    // a stale schedule sits in the cache (yesterday's standings)
    Files.write(Paths.get(dir, "2020-schedule.shtml"),
      "<html>stale</html>".getBytes(StandardCharsets.UTF_8))
    val f = new Fake(3000, dir,
      Map("https://example.test/leagues/MLB/2020-schedule.shtml" -> "<html>grown</html>"))
    val url = "https://example.test/leagues/MLB/2020-schedule.shtml"
    // is_cachable=False (scraper.py:58): the fetch happens despite the hit
    assert(f.retriever.page(url) == "<html>grown</html>")
    assert(f.fetched.map(_._2) == Seq(url))
    // write-through: the cache now holds the fresh copy for offline reads
    assert(new String(Files.readAllBytes(Paths.get(dir, "2020-schedule.shtml")),
      StandardCharsets.UTF_8) == "<html>grown</html>")
    // and a SECOND retrieval fetches again — schedules are always live
    f.retriever.page(url)
    assert(f.fetched.size == 2)
    // schedule fetches still honor the crawl delay
    assert(f.sleeps == Seq(3000L))
  }

  test("cache-first ordering: hit between misses consumes no delay slot") {
    val dir = tmpCache()
    Files.write(Paths.get(dir, "hit01.shtml"),
      "<html>hit</html>".getBytes(StandardCharsets.UTF_8))
    val f = new Fake(3000, dir)
    f.retriever.page("https://example.test/miss01.shtml")
    f.retriever.page("https://example.test/hit01.shtml") // cache, no slot
    f.retriever.page("https://example.test/miss02.shtml")
    assert(f.fetched.map(_._2).forall(_.contains("miss")))
    assert(f.sleeps == Seq(3000L)) // only the second miss waited
  }
}

/** Spark-side plumbing: per-partition retriever over a URL set. */
class RetrieveIntegrationSpec extends SparkSpec {
  test("retrieve serves cached pages and fetches misses through mapPartitions") {
    val dir = Files.createTempDirectory("graft_cache_it").toString
    Files.write(Paths.get(dir, "vendipa01.shtml"),
      "<html>cached page</html>".getBytes(StandardCharsets.UTF_8))
    val urls = Seq(
      "https://example.test/players/v/vendipa01.shtml",  // pre-cached
      "https://example.test/boxes/WAS/WAS201710120.shtml") // miss -> fetch
    val df = HtmlSource.retrieve(spark, urls,
      () => new PageRetriever(dir, u => s"<html>fetched $u</html>", 0L))
    val rows = df.collect().map(r =>
      r.getAs[String]("name_id") ->
        (r.getAs[String]("page_type"), r.getAs[String]("html"))).toMap
    assert(rows("vendipa01") == (("PlayerPage", "<html>cached page</html>")))
    assert(rows("WAS201710120")._1 == "GamePage")
    assert(rows("WAS201710120")._2.startsWith("<html>fetched"))
    // the miss was inserted into the shared cache directory
    assert(Files.isRegularFile(Paths.get(dir, "WAS201710120.shtml")))
  }

  test("derived per-retriever delay preserves the global politeness budget") {
    // E parallel retrievers each waiting delay*E keep the aggregate rate
    // at one request per delay — the polite default the checked Scraper
    // entry point now applies instead of documenting as a footnote
    val e = spark.sparkContext.defaultParallelism
    assert(e > 1, "spec needs a parallel master to be meaningful")
    assert(PageRetriever.derivedDelayMs(spark, 3000L) == 3000L * e)
    // the budget survives the politeness check path end to end
    assert(PageRetriever.derivedDelayMs(spark,
      graft.scrape.Scraper.checkedDelayMs(5000L)) == 5000L * e)
  }

  test("one throwing fetch yields a failure row, not a dead crawl") {
    val dir = Files.createTempDirectory("graft_cache_fail").toString
    val urls = Seq(
      "https://example.test/boxes/WAS/WAS201710120.shtml",
      "https://example.test/boxes/BAD/BAD000000000.shtml", // fetcher throws
      "https://example.test/players/v/vendipa01.shtml")
    val df = HtmlSource.retrieve(spark, urls,
      () => new PageRetriever(dir, u => {
        if (u.contains("BAD")) sys.error("HTTP 503")
        s"<html>fetched $u</html>"
      }, 0L))
    val rows = df.collect().map(r => r.getAs[String]("name_id") ->
      ((r.getAs[Boolean]("ok"), r.getAs[String]("html"), r.getAs[String]("err")))).toMap
    assert(rows.size == 3)
    // the N-1 healthy pages landed in full
    assert(rows("WAS201710120")._1 && rows("WAS201710120")._2.startsWith("<html>fetched"))
    assert(rows("vendipa01")._1)
    // the flaky page became a reportable ledger row instead of a task
    // failure (which after retries would have killed the whole crawl)
    val (ok, html, err) = rows("BAD000000000")
    assert(!ok && html.isEmpty && err.contains("HTTP 503"))
  }
}
