package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.scrape.BBRefParse

object PageRetriever {
  /** Schedule pages are never SERVED from cache: a live season's schedule
    * grows as games are played, so re-scraping must re-fetch it to
    * discover new games — the reference constructs the schedule link with
    * `is_cachable=False` (deep-field scraper.py:58, honored by
    * pages.py:29,150). Game and player pages are immutable once written
    * and stay cache-first.
    */
  val DefaultCachable: String => Boolean =
    nameId => !nameId.toLowerCase.contains("schedule")

  /** Per-retriever delay honoring a GLOBAL politeness budget: with one
    * retriever per partition slot ([[HtmlSource.retrieve]] runs up to
    * `defaultParallelism` concurrently), E retrievers each waiting
    * `delayMs * E` keep the aggregate request rate at one per `delayMs`
    * — the same budget the reference's single process honors. This is
    * the default the entry point uses ([[graft.scrape.Scraper]]'s
    * checked overload), so the polite path is what you get unless you
    * deliberately construct retrievers yourself.
    */
  def derivedDelayMs(spark: org.apache.spark.sql.SparkSession,
                     globalDelayMs: Long): Long =
    globalDelayMs * math.max(1, spark.sparkContext.defaultParallelism)
}

/** Cache-first page retrieval with a crawl-delay rate limit on misses —
  * the reference's `_PageRetriever` / `_WebHandler` / `HtmlCache`
  * (deep-field scraping/pages.py:118-312): look in the file cache
  * first, call the fetcher only on a miss, never start two fetches
  * closer than `delayMs` apart (the reference sleeps out
  * `BBREF_CRAWL_DELAY = 3.0` seconds between requests,
  * pages.py:175-186), and insert the fetched page into the cache so the
  * next retrieval is a hit (pages.py:158-163).
  *
  * Non-cachable pages (schedules, by [[PageRetriever.DefaultCachable]])
  * skip the cache READ but still write through: the fetched page lands
  * in the cache so offline analysis ([[HtmlSource.pages]],
  * [[graft.scrape.Crawl.frontier]]) sees the freshest copy, while the
  * next live retrieval re-fetches regardless.
  *
  * The fetcher, clock and sleep are injectable: the sandbox has no
  * network, so tests drive a fixture-backed fake and verify the
  * cache-first ordering and the honored delay against a fake clock.
  *
  * Scale posture: construct one retriever per executor/partition via
  * [[HtmlSource.retrieve]] — the token bucket then bounds the fetch
  * rate PER RETRIEVER. The reference is a single process, so its delay
  * is a global budget; to honor the same global budget from E parallel
  * retrievers, pass `delayMs * E`.
  */
final class PageRetriever(
    cacheDir: String,
    fetch: String => String,
    delayMs: Long,
    clock: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep,
    cachable: String => Boolean = PageRetriever.DefaultCachable) {

  // end of the current crawl-delay slot; fetches queue behind it
  private var nextSlot = 0L

  private def cachePath(nameId: String) = Paths.get(cacheDir, nameId + ".shtml")

  /** Cached HTML for a name_id, if present (HtmlCache.find_html). */
  def cached(nameId: String): Option[String] = {
    val p = cachePath(nameId)
    if (Files.isRegularFile(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  /** Atomic cache insert: write to a temp file in the cache directory,
    * then rename over the target. A task killed mid-write can therefore
    * never leave a truncated page that later runs would serve as a valid
    * cache hit — the rename either happened completely or not at all.
    */
  private def insert(nameId: String, html: String): Unit = {
    val dir = Paths.get(cacheDir)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, nameId + ".", ".tmp")
    Files.write(tmp, html.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, cachePath(nameId),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The page for a URL: a cache hit on a cachable page wins (no fetch,
    * no delay); a miss — or any non-cachable page — waits for the next
    * crawl-delay slot, fetches, and (re)inserts the page into the cache.
    */
  def page(url: String): String = {
    val nameId = BBRefParse.nameIdOf(url)
    val hit = if (cachable(nameId)) cached(nameId) else None
    hit.getOrElse {
      synchronized {
        val now = clock()
        if (now < nextSlot) sleep(nextSlot - now)
        nextSlot = math.max(now, nextSlot) + delayMs
      }
      val html = fetch(url)
      insert(nameId, html)
      html
    }
  }
}
