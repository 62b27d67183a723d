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
}
