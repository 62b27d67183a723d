package graft.scrape

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive crawl frontier over an HTML cache — the reference's
  * ScrapeNode DFS (deep-field scraping/nodes.py:9-58: schedule pages
  * link to games, games link to the players on their rosters; children
  * are visited before the parent inserts, and pages already in the DB
  * are skipped).
  *
  * Spark re-expression: breadth-first waves instead of a driver DFS.
  * Each wave extracts links from the pages fetched in the previous wave
  * (distributed flatMap), anti-joins out every id already requested (the
  * skip-existing semantics — the same operator as q7 / Sinks.
  * notYetIngested), and serves the remainder from the cache. The driver
  * loop only tests the per-wave emptiness, so the number of Spark jobs
  * is bounded by the link-graph depth (2 for schedule→game→player), not
  * by data volume — at 100 TB of cached pages each wave is one anti-join
  * plus one semi-join on `name_id`.
  */
object Crawl {

  /** name_ids linked FROM the given pages: schedule → game boxscores
    * (bbref_pages.py:90-104 SchedulePage.get_links), game → roster
    * player pages (bbref_pages.py:228-232 get_page_suffixes). Player
    * pages are leaves (nodes.py: no children).
    */
  def linkedIds(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val fromSchedules = pages.filter(col("page_type") === "SchedulePage")
      .select("html").as[String]
      .flatMap(h => BBRefParse.scheduleLinks(h).map(BBRefParse.nameIdOf))
    val fromGames = Entities.parsedGames(pages)
      .flatMap(_.roster.map(_.nameId))
    fromSchedules.union(fromGames).toDF("name_id").distinct()
  }

  /** Canonical URL of a discovered name_id, by page-type convention
    * (games under /boxes/<home>/, players under /players/<initial>/ —
    * the same shapes the reference's BBRefLink classifies,
    * bbref_pages.py:65-75).
    */
  def urlOf(nameId: String): String =
    if (nameId.matches(graft.sources.HtmlSource.GameIdRe))
      s"${BBRefParse.BaseUrl}/boxes/${nameId.take(3)}/$nameId.shtml"
    else
      s"${BBRefParse.BaseUrl}/players/${nameId.head}/$nameId.shtml"

  /** Frontier expansion driven by a LIVE fetcher instead of a static
    * cache: each wave's undiscovered ids are retrieved through
    * [[graft.sources.HtmlSource.retrieve]] (cache-first, rate-limited)
    * and then expanded in turn. Returns every page fetched.
    *
    * The per-wave id list passes through the driver (`collect`) —
    * deliberately: a crawl is throughput-bound by the politeness delay
    * (seconds per page), so a wave is at most a few thousand id strings
    * and the reference's own frontier is driver-resident too
    * (nodes.py:9-58). Page BODIES never touch the driver.
    */
  def crawlAndFetch(spark: org.apache.spark.sql.SparkSession, seedUrls: Seq[String],
                    mk: () => graft.sources.PageRetriever, maxWaves: Int = 8): DataFrame = {
    var wave = graft.sources.HtmlSource.retrieve(spark, seedUrls, mk).cache()
    var all = wave
    var visited = wave.select("name_id")
    var depth = 0
    var expanding = true
    while (expanding && depth < maxWaves) {
      depth += 1
      val freshIds = linkedIds(wave)
        .join(visited, Seq("name_id"), "left_anti")
        .collect().map(_.getString(0)).sorted
      if (freshIds.isEmpty) expanding = false
      else {
        wave = graft.sources.HtmlSource.retrieve(spark, freshIds.map(urlOf), mk).cache()
        all = all.unionByName(wave)
        visited = visited.union(wave.select("name_id"))
      }
    }
    all
  }

  /** Expand the frontier from the cache's schedule pages. Returns the
    * crawl ledger `(name_id, depth, in_cache)`: every page some wave
    * requested, the wave that first discovered it, and whether the cache
    * could serve it. Ids with `in_cache = false` are exactly the to-visit
    * list a live fetcher ([[graft.sources.PageRetriever]]) would pull
    * from the web; here they contribute no further links.
    */
  def frontier(cache: DataFrame, maxWaves: Int = 8): DataFrame = {
    val ledgerCols = Seq("name_id", "depth", "in_cache").map(col)
    var ledger = cache.filter(col("page_type") === "SchedulePage")
      .select(col("name_id"), lit(0).as("depth"), lit(true).as("in_cache"))
    var wave = cache.join(ledger.select("name_id"), Seq("name_id"), "left_semi")
    var depth = 0
    var expanding = true
    while (expanding && depth < maxWaves) {
      depth += 1
      // to-visit = links ⟕anti⟕ already-requested
      val fresh = linkedIds(wave)
        .join(ledger.select("name_id"), Seq("name_id"), "left_anti")
        .join(cache.select(col("name_id"), lit(true).as("in_cache")), Seq("name_id"), "left")
        .select(col("name_id"), lit(depth).as("depth"),
          coalesce(col("in_cache"), lit(false)).as("in_cache"))
        .cache() // truncate the iterative lineage, as in d6 label propagation
      if (fresh.isEmpty) {
        fresh.unpersist()
        expanding = false
      } else {
        ledger = ledger.union(fresh)
        wave = cache.join(fresh.filter(col("in_cache")).select("name_id"),
          Seq("name_id"), "left_semi")
      }
    }
    ledger.select(ledgerCols: _*)
  }
}
