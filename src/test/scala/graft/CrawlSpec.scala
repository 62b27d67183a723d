package graft

import org.apache.spark.sql.functions._

import graft.queries.ScrapeSuite
import graft.scrape.{Crawl, Entities}
import graft.sources.HtmlSource

class CrawlSpec extends SparkSpec {

  private def gameLink(id: String) =
    s"""<p class="game"><em><a href="/boxes/${id.take(3)}/$id.shtml">$id</a></em></p>"""

  test("frontier expands schedule -> games -> roster players and builds the star schema") {
    import spark.implicits._
    // a schedule seed linking two real fixture games; the cache holds the
    // fixture game + player pages but NO other schedule
    val sched = Seq(("2020-schedule", "SchedulePage",
      s"<html><body>${gameLink("WAS201710120")}${gameLink("OAK201903200")}</body></html>"))
      .toDF("name_id", "page_type", "html")
    val fixture = HtmlSource.pages(spark, ScrapeSuite.FixtureDir)
      .filter(col("page_type") =!= "SchedulePage")
    val cache = sched.unionByName(fixture).cache()

    val ledger = Crawl.frontier(cache).cache()

    // wave 0: the seed; wave 1: exactly the two linked games, both served
    val d0 = ledger.filter(col("depth") === 0).collect()
    assert(d0.map(_.getAs[String]("name_id")).toSeq == Seq("2020-schedule"))
    val d1 = ledger.filter(col("depth") === 1).collect()
    assert(d1.map(_.getAs[String]("name_id")).toSet ==
      Set("WAS201710120", "OAK201903200"))
    assert(d1.forall(_.getAs[Boolean]("in_cache")))

    // wave 2: the games' roster players — cache hits where a fixture
    // player page exists, to-visit rows where it doesn't
    val d2 = ledger.filter(col("depth") === 2).collect()
      .map(r => r.getAs[String]("name_id") -> r.getAs[Boolean]("in_cache")).toMap
    assert(d2("jayjo02"))                       // WAS fixture player page
    assert(d2.contains("gordode01") && !d2("gordode01")) // OAK roster, no page
    assert(d2.values.exists(identity) && d2.values.exists(!_))
    assert(ledger.filter(col("depth") >= 3).isEmpty) // players are leaves

    // end-to-end: the star schema materializes from the crawled,
    // cache-served pages alone (the reference's update_db over the DFS)
    val crawled = cache.join(
      ledger.filter(col("in_cache")).select("name_id"), Seq("name_id"), "left_semi")
    val tables = Entities.starSchema(crawled)
    assert(tables("game").count() == 2L)
    assert(tables("play").count() > 100L)
    assert(tables("play").join(tables("game"), Seq("game_id"), "left_anti").count() == 0)

    ledger.unpersist(); cache.unpersist()
  }

  test("crawlAndFetch: failure-isolated, and nothing stays pinned after return") {
    val cacheDir = java.nio.file.Files.createTempDirectory("graft_crawl_hyg").toString
    val sched = s"<html><body>${gameLink("WAS201710120")}${gameLink("OAK201903200")}</body></html>"
    val fetch: String => String = u => {
      val nid = graft.scrape.BBRefParse.nameIdOf(u)
      if (nid.contains("schedule")) sched
      else if (nid == "OAK201903200") sys.error("HTTP 503") // one flaky page
      else ScraperSpecFixtures.serveFixture(nid)
    }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val crawlSpool = java.nio.file.Files.createTempDirectory("graft_crawl_sp").toString + "/corpus"
    val pages = Crawl.crawlAndFetch(spark,
      Seq("https://example.test/leagues/MLB/2020-schedule.shtml"),
      () => new graft.sources.PageRetriever(cacheDir, fetch, 0L),
      spoolDir = Some(crawlSpool))
    // the de-drivered frontier landed per wave under the underscore-
    // hidden dir (wave 0 = seed, 1 = games, 2 = rosters) and corpus
    // reads of the spool never pick the frontier files up
    assert(new java.io.File(s"$crawlSpool/_frontier/w1").isDirectory)
    assert(new java.io.File(s"$crawlSpool/_frontier/w2").isDirectory)
    assert(pages.columns.toSet == Set("name_id", "page_type", "html", "ok", "err"))
    // the flaky game is a reportable failure row; the healthy game's
    // subtree (page + its roster players) was still crawled in full
    assert(pages.filter(!col("ok")).collect()
      .map(_.getAs[String]("name_id")).toSeq == Seq("OAK201903200"))
    // wave caches were released: the crawl pinned nothing it didn't unpin
    // (the corpus lives in the spool, so recompute can never re-fetch)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"crawl leaked pinned RDDs: $leaked")
    val parsed = Entities.parsedGames(pages.filter(col("ok")))
    val tables = Entities.starSchema(pages.filter(col("ok")), parsed)
    assert(tables("game").count() == 1L)
    assert(tables("play").count() > 50L)
  }

  test("crawl frontier never collects: urlOfCol ≡ urlOf, and no driver-side collect in the loop") {
    import spark.implicits._
    // the codegen URL column must agree with its scalar twin on every
    // id shape (game ids, player ids with digits/dots/apostrophes)
    val ids = Seq("WAS201710120", "OAK201903200", "jayjo02", "o'neipa01",
      "d.arnau01", "gordode01")
    val got = ids.toDF("name_id")
      .select(col("name_id"), Crawl.urlOfCol(col("name_id")).as("url"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    ids.foreach(id => assert(got(id) == Crawl.urlOf(id), id))
    // ...and the inverse rule: the wave semi-join's codegen name_id must
    // agree with the scalar BBRefParse.nameIdOf the fetcher stamps on
    // landed rows, INCLUDING the edge URL shapes where the old ad-hoc
    // regexp diverged (trailing slash, query string) — a divergence here
    // is a silent under-crawl (r17 ADVICE)
    val urls = ids.map(Crawl.urlOf) ++ Seq(
      "https://example.test/players/j/jayjo02.shtml/",   // trailing slash
      "https://example.test/players/j/",                  // dir-style seed
      "https://example.test/leagues/MLB/2019-schedule.shtml?utm=x", // query string
      "https://example.test/boxes/WAS/WAS201710120.html", // .html variant
      "https://example.test/plain", "relative/path.shtml")
    val gotIds = urls.toDF("url")
      .select(col("url"), Crawl.nameIdOfCol(col("url")).as("name_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach(u =>
      assert(gotIds(u) == graft.scrape.BBRefParse.nameIdOf(u), u))
    // the no-collect contract (r16 VERDICT #4): the crawlAndFetch loop's
    // frontier stays executor-side — pin it at the source so a future
    // "just collect the wave" regression fails a test, not a review
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/scrape/Crawl.scala")), "UTF-8")
    val body = src.substring(src.indexOf("def crawlAndFetch"))
    val loop = body.substring(0, body.indexOf("\n  def "))
    assert(!loop.contains(".collect("),
      "crawlAndFetch must not collect the frontier to the driver")
  }

  test("frontier scans the wholetext HTML corpus exactly once") {
    import java.nio.file._
    // a PRIVATE copy of the fixture tree: other suites scan FixtureDir
    // concurrently in this shared JVM, so the scan counter filters on a
    // path only this test reads
    val src = Paths.get(ScrapeSuite.FixtureDir)
    val dst = Files.createTempDirectory("graft_scanonce")
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    val token = dst.getFileName.toString

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.text.TextFileFormat
    def textScans(p: SparkPlan): Int = {
      val self = p match {
        case f: FileSourceScanExec
            if f.relation.fileFormat.isInstanceOf[TextFileFormat] &&
              f.relation.location.rootPaths.exists(_.toString.contains(token)) => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      self + kids.map(textScans).sum
    }
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.CountDownLatch(1)
    val marker = 987654321L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        scans.addAndGet(textScans(qe.executedPlan))
        if (qe.executedPlan.toString.contains(marker.toString)) done.countDown()
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val ledger = Crawl.frontier(HtmlSource.pages(spark, dst.toString))
      assert(ledger.count() > 0)
      // bus-order drain marker: the listener bus is FIFO, so once this
      // execution is observed every frontier execution has been counted
      spark.range(marker, marker + 1).collect()
      assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "listener bus did not drain")
      assert(scans.get() == 1,
        s"frontier should scan the HTML corpus exactly once, saw ${scans.get()} scans")
    } finally {
      spark.listenerManager.unregister(listener)
      graft.sources.Spool.deleteRecursively(dst)
    }
  }

  test("frontier with a caller-supplied spoolDir: graph lands under it, hidden from ledger reads") {
    // the cluster-master escape hatch: no checkpoint dir, caller supplies
    // the spool — the link graph must inherit that path (not a separately
    // resolved temp dir) and stay invisible to parquet reads of the spool
    import org.apache.spark.sql.functions.col
    val spool = java.nio.file.Files.createTempDirectory("graft_fr_spool").toString + "/ledger"
    val sched = Seq(("2020-schedule", "SchedulePage",
      s"<html><body>${gameLink("WAS201710120")}</body></html>"))
    val cache = {
      import spark.implicits._
      sched.toDF("name_id", "page_type", "html")
    }.unionByName(HtmlSource.pages(spark, ScrapeSuite.FixtureDir)
      .filter(col("page_type") =!= "SchedulePage"))
    val ledger = Crawl.frontier(cache, spoolDir = Some(spool))
    assert(new java.io.File(s"$spool/_graph").isDirectory,
      "link graph should land under the caller's spool")
    // the ledger read (plain parquet over the spool) must not pick up the
    // underscore-hidden graph files: schema stays (name_id, depth, in_cache)
    assert(ledger.columns.toSet == Set("name_id", "depth", "in_cache"))
    assert(ledger.filter(col("depth") === 1).collect()
      .map(_.getAs[String]("name_id")).toSeq == Seq("WAS201710120"))
    assert(ledger.filter(col("depth") === 2).count() > 0) // roster wave
    graft.sources.Spool.deleteRecursively(
      java.nio.file.Paths.get(spool).getParent)
  }

  test("linkRankFromGraph matches an independently computed fixed-point reference") {
    import spark.implicits._
    // synthetic graph in linkGraph shape: a cycle (a->b->c->a... via c->a),
    // a dangling leaf (d), and a target absent from the cache (e)
    val graph = Seq(
      ("a", "SchedulePage", Option.empty[String]),
      ("a", "SchedulePage", Some("b")),
      ("a", "SchedulePage", Some("c")),
      ("b", "GamePage", None),
      ("b", "GamePage", Some("c")),
      ("b", "GamePage", Some("d")),
      ("b", "GamePage", Some("e")),
      ("c", "GamePage", None),
      ("c", "GamePage", Some("a")),
      ("d", "PlayerPage", None)
    ).toDF("name_id", "page_type", "linked_id")
    val got = Crawl.linkRankFromGraph(graph, iters = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent reference: the same fixed-point recurrence in plain
    // Scala Longs (floor division on non-negative values, like both
    // engines' integer div)
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d",
      "b" -> "e", "c" -> "a")
    val nodes = Seq("a", "b", "c", "d", "e")
    val n = nodes.size
    val odeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = (15L * Crawl.RankScale / 100L) / n
    var r = nodes.map(_ -> Crawl.RankScale / n).toMap
    for (_ <- 1 to 10) {
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / odeg(src) }.sum
      }
      r = nodes.map(v => v -> (base + 85L * inc.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == r)
    // rank-mass invariants: total never exceeds the injected mass (leaf
    // mass leaks, it is never created), every node keeps at least the
    // teleport floor, and the cycle hub outranks the leaf
    assert(got.values.sum <= Crawl.RankScale)
    assert(got.values.forall(_ >= base))
    assert(got("a") > got("d"))
  }

  test("linkRankFromGraph matches the reference on randomized graphs (seeded)") {
    import spark.implicits._
    // deterministic seed, same style as the parse fuzz: varying density,
    // dst-only targets, dangling leaves, disconnected nodes — either the
    // engine's recurrence equals the plain-Scala fixed point on every
    // graph shape or the failing edge list prints
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 4) {
      val presence = (0 until 3 + rnd.nextInt(10)).map(i => s"p$i")
      val targets = presence ++ (0 until 1 + rnd.nextInt(3)).map(i => s"x$i")
      val edges = (for {
        s <- presence; t <- targets
        if s != t && rnd.nextDouble() < 0.25
      } yield (s, t)).distinct
      val graph = (presence.map(p => (p, "GamePage", Option.empty[String])) ++
        edges.map { case (s, t) => (s, "GamePage", Option(t)) })
        .toDF("name_id", "page_type", "linked_id")
      val got = Crawl.linkRankFromGraph(graph, iters = 10).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      val nodes = (presence ++ edges.map(_._2)).distinct
      val n = nodes.size
      val odeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val base = (15L * Crawl.RankScale / 100L) / n
      var r = nodes.map(_ -> Crawl.RankScale / n).toMap
      for (_ <- 1 to 10) {
        val inc = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _) => r(src) / odeg(src) }.sum
        }
        r = nodes.map(v => v -> (base + 85L * inc.getOrElse(v, 0L) / 100L)).toMap
      }
      assert(got == r, s"trial $trial: engine != reference on edges $edges")
    }
  }

  test("linkRank (cache entry point) spools the graph itself and agrees with the core") {
    import spark.implicits._
    // a tiny standalone cache: one schedule linking one fixture game
    val cache = Seq(("2020-schedule", "SchedulePage",
      s"<html><body>${gameLink("WAS201710120")}</body></html>"))
      .toDF("name_id", "page_type", "html")
      .unionByName(HtmlSource.pages(spark, ScrapeSuite.FixtureDir)
        .filter(col("name_id") === "WAS201710120"))
    val viaCache = Crawl.linkRank(cache).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaGraph = Crawl.linkRankFromGraph(Crawl.linkGraph(cache)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaCache == viaGraph && viaCache.nonEmpty)
    // the game page (linked by the schedule AND carrying the roster
    // out-links) must outrank the schedule seed nothing links to
    assert(viaCache("WAS201710120") > viaCache("2020-schedule"))
  }

  test("frontier over the raw fixture corpus records schedule links as to-visit") {
    val ledger = ScrapeSuite.queries("s8_crawl_frontier")(spark, sfDir).cache()
    assert(ledger.filter(col("depth") === 0).count() == 1L) // 2016-schedule
    // the 2016 schedule's games are not among the fixture pages: every
    // wave-1 id is a cache miss, so expansion stops there
    val d1 = ledger.filter(col("depth") === 1)
    assert(d1.count() > 2000L)
    assert(d1.filter(col("in_cache")).isEmpty)
    assert(ledger.filter(col("depth") >= 2).isEmpty)
    ledger.unpersist()
  }
}
