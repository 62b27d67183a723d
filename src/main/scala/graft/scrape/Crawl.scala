package graft.scrape

import org.apache.spark.sql.{DataFrame, SaveMode}
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
  *
  * Wave materialization: each wave is appended to a parquet SPOOL
  * directory as soon as it lands and every later reference (the visited
  * set, the returned corpus / ledger) reads the spool, not the wave's
  * lineage. Two properties follow: (a) nothing stays pinned in executor
  * storage once the crawl returns — a deep crawl does not accumulate
  * cached blocks for the whole job — and (b) a recomputation can never
  * re-fire the fetcher (the fetch lineage dies at the spool write),
  * which matters now that schedule pages are fetch-always.
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

  // default spools resolve through Spool: under the checkpoint dir when
  // one is configured (cluster-visible), else a driver-local temp dir
  // (local master only — executors share the filesystem) deleted on JVM
  // exit. A caller-supplied spoolDir is the caller's to keep/clean and
  // must be cluster-visible; at scale it IS the landed corpus.

  /** Frontier expansion driven by a LIVE fetcher instead of a static
    * cache: each wave's undiscovered ids are retrieved through
    * [[graft.sources.HtmlSource.retrieve]] (cache-first, rate-limited)
    * and then expanded in turn. Returns every page fetched, including
    * failure rows (`ok = false`) — a flaky page is skipped and reported,
    * never retried and never fatal (nodes.py:41-47 catches per link).
    *
    * The per-wave id list passes through the driver (`collect`) —
    * deliberately: a crawl is throughput-bound by the politeness delay
    * (seconds per page), so a wave is at most a few thousand id strings
    * and the reference's own frontier is driver-resident too
    * (nodes.py:9-58). Page BODIES never touch the driver: they flow
    * executor → spool parquet. The spool dir (caller-supplied via
    * `spoolDir`, else a temp dir) backs the returned DataFrame, so it
    * must outlive the caller's reads; at scale it IS the landed corpus.
    */
  def crawlAndFetch(spark: org.apache.spark.sql.SparkSession, seedUrls: Seq[String],
                    mk: () => graft.sources.PageRetriever, maxWaves: Int = 8,
                    spoolDir: Option[String] = None): DataFrame = {
    val spool = spoolDir.getOrElse(graft.sources.Spool.dir(spark, "crawl"))
    var urls = seedUrls
    var wavesLeft = maxWaves + 1 // the seed wave plus maxWaves expansions
    while (urls.nonEmpty && wavesLeft > 0) {
      wavesLeft -= 1
      val wave = graft.sources.HtmlSource.retrieve(spark, urls, mk).cache()
      // land the wave first: the ONLY action that runs the fetch lineage
      wave.write.mode(SaveMode.Append).parquet(spool)
      val visited = spark.read.parquet(spool).select("name_id")
      val freshIds = linkedIds(wave.filter(col("ok")))
        .join(visited, Seq("name_id"), "left_anti")
        .collect().map(_.getString(0)).sorted
      wave.unpersist(blocking = true)
      urls = freshIds.map(urlOf).toSeq
    }
    spark.read.parquet(spool)
  }

  /** Expand the frontier from the cache's schedule pages. Returns the
    * crawl ledger `(name_id, depth, in_cache)`: every page some wave
    * requested, the wave that first discovered it, and whether the cache
    * could serve it. Ids with `in_cache = false` are exactly the to-visit
    * list a live fetcher ([[graft.sources.PageRetriever]]) would pull
    * from the web; here they contribute no further links.
    *
    * Each wave's fresh ledger slice is appended to a parquet spool and
    * every later reference (the already-requested anti-join, the next
    * wave's semi-join, the returned ledger) reads the spool: iterative
    * lineage is truncated at the files, so no per-wave cache() is ever
    * pinned — the ledger is id/depth/flag metadata, a few bytes per page
    * even when the page corpus is 100 TB.
    */
  def frontier(cache: DataFrame, maxWaves: Int = 8,
               spoolDir: Option[String] = None): DataFrame = {
    val spark = cache.sparkSession
    val spool = spoolDir.getOrElse(graft.sources.Spool.dir(spark, "frontier"))
    val ledger = () => spark.read.parquet(spool)
    cache.filter(col("page_type") === "SchedulePage")
      .select(col("name_id"), lit(0).as("depth"), lit(true).as("in_cache"))
      // depth-0 seed (written even when empty: pins the schema). Append:
      // the parquet writer creates the spool dir if needed, and a
      // caller-supplied spool is required to start empty.
      .write.mode(SaveMode.Append).parquet(spool)
    var depth = 0
    var expanding = ledger().limit(1).count() > 0
    while (expanding && depth < maxWaves) {
      depth += 1
      val wave = cache.join(
        ledger().filter(col("depth") === depth - 1 && col("in_cache")).select("name_id"),
        Seq("name_id"), "left_semi")
      // to-visit = links ⟕anti⟕ already-requested
      val fresh = linkedIds(wave)
        .join(ledger().select("name_id"), Seq("name_id"), "left_anti")
        .join(cache.select(col("name_id"), lit(true).as("in_cache")), Seq("name_id"), "left")
        .select(col("name_id"), lit(depth).as("depth"),
          coalesce(col("in_cache"), lit(false)).as("in_cache"))
      fresh.write.mode(SaveMode.Append).parquet(spool)
      expanding = ledger().filter(col("depth") === depth).limit(1).count() > 0
    }
    ledger()
  }
}
