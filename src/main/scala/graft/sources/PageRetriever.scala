package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.scrape.BBRefParse

/** Cache-first page retrieval with a crawl-delay rate limit on misses —
  * the reference's `_PageRetriever` / `_WebHandler` / `HtmlCache`
  * (deep-field scraping/pages.py:118-312): look in the file cache
  * first, call the fetcher only on a miss, never start two fetches
  * closer than `delayMs` apart (the reference sleeps out
  * `BBREF_CRAWL_DELAY = 3.0` seconds between requests,
  * pages.py:175-186), and insert the fetched page into the cache so the
  * next retrieval is a hit (pages.py:158-163).
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
    sleep: Long => Unit = Thread.sleep) {

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

  /** The page for a URL: cache hit wins (no fetch, no delay); a miss
    * waits for the next crawl-delay slot, fetches, and inserts the page
    * into the cache.
    */
  def page(url: String): String = {
    val nameId = BBRefParse.nameIdOf(url)
    cached(nameId).getOrElse {
      synchronized {
        val now = clock()
        if (now < nextSlot) sleep(nextSlot - now)
        nextSlot = math.max(now, nextSlot) + delayMs
      }
      val html = fetch(url)
      Files.createDirectories(Paths.get(cacheDir))
      Files.write(cachePath(nameId), html.getBytes(StandardCharsets.UTF_8))
      html
    }
  }
}
