package graft

import org.apache.spark.sql.functions._

import graft.queries.ScrapeSuite
import graft.scrape.{BBRefParse, Entities}
import graft.sources.HtmlSource

/** Ground truth below is read directly from the fixture HTML (values
  * cross-checked by hand against the pages), mirroring the reference's
  * tests/scraping/test_pages.py scenarios.
  */
class ScrapeSpec extends SparkSpec {

  private lazy val pages = HtmlSource.pages(spark, ScrapeSuite.FixtureDir).cache()
  private lazy val parsed = Entities.parsedGames(pages).cache()

  override def afterAll(): Unit = {
    parsed.unpersist()
    pages.unpersist()
    ScrapeSuite.clear(spark)
    super.afterAll()
  }

  test("s1: link classification by name_id") {
    val types = pages.select("name_id", "page_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("WAS201710120") == "GamePage")
    assert(types("2016-schedule") == "SchedulePage")
    assert(types("vendipa01") == "PlayerPage")
    assert(types("sabatc.01") == "PlayerPage") // dot inside the id
    assert(types("jimend'01") == "PlayerPage") // apostrophe inside the id
    assert(types.values.count(_ == "GamePage") == 13)
  }

  test("s2: schedule page yields boxscore links, skipping previews") {
    val links = ScrapeSuite.queries("s2_schedule_links")(spark, sfDir)
      .select("game_url").collect().map(_.getString(0)).toSet
    val base = BBRefParse.BaseUrl
    assert(links.contains(s"$base/boxes/KCA/KCA201604030.shtml"))
    assert(links.contains(s"$base/boxes/ANA/ANA201604040.shtml"))
    assert(links.contains(s"$base/boxes/TBA/TBA201604040.shtml"))
    assert(!links.contains(s"$base/leagues/MLB/2016-schedule.shtml"))
    assert(!links.contains(s"$base/boxes/BOS/BOS201708270.shtml"))
    assert(links.forall(!_.contains("/previews/")))
  }

  test("s3: player pages parse name and handedness") {
    val players = Entities.playerRows(pages).collect()
      .map(p => p.nameId -> p).toMap
    assert(players("vendipa01").name == "Pat Venditte")
    assert(players("vendipa01").bats == 0)   // LEFT
    assert(players("vendipa01").throwsHand == 2) // BOTH
    assert(players("jeterde01").name == "Derek Jeter")
    assert(!players.contains("malformed_arod")) // malformed page skipped
  }

  test("s4: game meta, teams, venue resolve to star rows") {
    val star = Entities.gameStar(Entities.gamesMeta(parsed))
    val was = star.filter(col("game_name_id") === "WAS201710120").collect().head
    assert(was.getAs[String]("date") == "2017-10-12")
    assert(was.getAs[String]("local_start_time") == "20:08")
    assert(was.getAs[Int]("time_of_day") == 1)  // NIGHT
    assert(was.getAs[Int]("field_type") == 1)   // GRASS
    // venue id joins back to "Nationals Park"
    val venues = Entities.venueDim(Entities.gamesMeta(parsed)).collect()
      .map(r => r.getAs[Long]("venue_id") -> r.getAs[String]("name")).toMap
    assert(venues(was.getAs[Long]("venue_id")) == "Nationals Park")
    val teams = Entities.teamDim(Entities.gamesMeta(parsed)).collect()
      .map(r => r.getAs[Long]("team_id") -> (r.getAs[String]("name"), r.getAs[String]("abbreviation"))).toMap
    assert(teams(was.getAs[Long]("away_team_id")) == ("Chicago Cubs", "CHC"))
    assert(teams(was.getAs[Long]("home_team_id")) == ("Washington Nationals", "WSN"))
  }

  test("s4: roster tables keep away and home sides apart (OAK201903200)") {
    val r = Entities.rosters(parsed)
      .filter(col("game_name_id") === "OAK201903200")
      .collect().map(x => (x.getAs[String]("side"), x.getAs[String]("name_id")))
    val away = r.filter(_._1 == "away").map(_._2).toSet
    val home = r.filter(_._1 == "home").map(_._2).toSet
    assert(Set("gordode01", "hanigmi01", "bruceja01", "strichu01").subsetOf(away))
    assert(Set("laurera01", "chapmma01", "piscost01", "trivilo01").subsetOf(home))
    assert((away & Set("laurera01", "chapmma01")).isEmpty)
  }

  test("s5: plays transform and resolve FKs (WAS201710120)") {
    val plays = Entities.resolvePlays(Entities.rawPlays(parsed), Entities.rosters(parsed))
      .filter(col("game_name_id") === "WAS201710120")
      .orderBy("play_num").collect()
    assert(plays.length == 97)
    val p0 = plays.head
    assert(p0.getAs[Int]("inning_half") == 0)
    assert(p0.getAs[Int]("start_outs") == 0)
    assert(p0.getAs[Int]("start_on_base") == 0)
    assert(p0.getAs[String]("desc") == "Double to RF (Line Drive)")
    assert(p0.getAs[String]("pitch_ct") == "2,(0-1) CX")
    assert(p0.getAs[String]("batter_name_id") == "jayjo02")
    assert(p0.getAs[String]("pitcher_name_id") == "gonzagi01")
    val p28 = plays(28)
    assert(p28.getAs[Int]("inning_half") == 4)
    assert(p28.getAs[Int]("start_outs") == 1)
    assert(p28.getAs[Int]("start_on_base") == 3) // FIRST | SECOND
    assert(p28.getAs[String]("batter_name_id") == "almoral01")
    assert(p28.getAs[String]("pitcher_name_id") == "gonzagi01")
  }

  test("s5: father/son same-name batters disambiguate (SEA199105260)") {
    val plays = Entities.resolvePlays(Entities.rawPlays(parsed), Entities.rosters(parsed))
      .filter(col("game_name_id") === "SEA199105260")
      .orderBy("play_num").collect()
    assert(plays.length == 87)
    val byNum = plays.map(p => p.getAs[Int]("play_num") -> p.getAs[String]("batter_name_id")).toMap
    // roster: griffke02 renders "Ken Griffey Jr.", griffke01 "Ken Griffey";
    // collision keeps both unstripped, so play names match exactly
    assert(byNum(9) == "griffke01")
    assert(byNum(26) == "griffke01")
    assert(byNum(48) == "griffke01")
    assert(byNum(84) == "griffke02")
  }

  test("s4: roster tables anchor on placeholder divs, ignoring decoy comments") {
    // an early comment that LOOKS like a batting table but has no
    // placeholder div in front of it — the pre-anchoring parser would
    // have taken it as the away roster and mis-sided every FK
    val decoy =
      """<!-- decoy batting <table><tbody>
        |<tr><th data-append-csv="fakeaa01" data-stat="player"><a href="/players/f/fakeaa01.shtml">Fake Guy</a></th></tr>
        |</tbody></table> -->""".stripMargin
    def btable(id: String, nameId: String, name: String) =
      s"""<div class="placeholder"></div>
         |<!-- <table id="$id" class="stats_table"><tbody>
         |<tr><th data-append-csv="$nameId" data-stat="player"><a href="/players/x/$nameId.shtml">$name</a></th></tr>
         |</tbody></table> -->""".stripMargin
    val html =
      s"""<html><body>
         |<div class="scorebox">
         |<a href="/teams/AAA/2020.shtml">Away Team</a>
         |<a href="/teams/HHH/2020.shtml">Home Team</a>
         |<div class="scorebox_meta"><div>Monday, April 6, 2020</div></div>
         |</div>
         |$decoy
         |${btable("AwayTeambatting", "awaypl01", "Away Player")}
         |${btable("HomeTeambatting", "homepl01", "Home Player")}
         |</body></html>""".stripMargin
    val pg = BBRefParse.parseGame("TST202004060", html).get
    assert(pg.roster.map(r => (r.side, r.nameId)) ==
      Seq(("away", "awaypl01"), ("home", "homepl01")))
  }

  test("s6: end-to-end star schema builds with resolved numeric FKs") {
    val tables = Entities.starSchema(pages, parsed)
    val counts = tables.map { case (n, df) => n -> df.count() }
    assert(counts("game") == 13L)
    assert(counts("player") == 46L) // 47 fixture pages minus the malformed one
    assert(counts("play") > 1000L)
    assert(counts("venue") > 0 && counts("team") > 0)
    // FK integrity: every play's game_id exists in the game table
    val plays = tables("play"); val games = tables("game")
    assert(plays.join(games, Seq("game_id"), "left_anti").count() == 0)
    // batter ids resolve against the player dim whenever that player's
    // page is among the fixtures (roster membership is wider than the
    // fixture player set, so nulls are allowed but joins must be valid)
    val p = tables("player")
    assert(plays.filter(col("batter_id").isNotNull)
      .join(p, plays("batter_id") === p("player_id"), "left_anti").count() == 0)
  }

  test("s7: player stats aggregate over the built star schema") {
    val stats = ScrapeSuite.queries("s7_player_stats")(spark, sfDir).collect()
    assert(stats.nonEmpty)
    val byName = stats.map(r => r.getAs[String]("name") -> r).toMap
    // Jon Jay led off WAS201710120 with a double; he must have PAs there
    assert(byName.contains("Jon Jay"))
    assert(byName("Jon Jay").getAs[Long]("plate_appearances") >= 4L)
    assert(stats.forall(_.getAs[Long]("plate_appearances") > 0L))
  }

  test("s5: same-name pitchers cycle ids on pitcher change (BAL200705070)") {
    val plays = Entities.resolvePlays(Entities.rawPlays(parsed), Entities.rosters(parsed))
      .filter(col("game_name_id") === "BAL200705070")
      .orderBy("play_num").collect()
    // Cleveland roster lists two "Roberto Hernandez": carmofa01 (starter
    // row) then hernaro01. Reference algorithm: appearance counter 0 on
    // first lookup -> first roster id; increments when the pitcher
    // changes -> cycles to the second id.
    val cle = plays.filter(_.getAs[Int]("inning_half") % 2 == 1) // b-half: away pitches
      .map(p => p.getAs[Int]("play_num") -> p.getAs[String]("pitcher_name_id"))
    val first = cle.head._2
    assert(Set("carmofa01", "hernaro01").contains(first))
    // every b-half play resolves to one of the two ids or another CLE pitcher
    assert(cle.forall(p => p._2 != null))
    // the resolved pitcher id changes at some point in the game (the relief
    // appearance cycles the counter)
    assert(cle.map(_._2).distinct.size >= 2)
  }

  test("an unexpected parser exception becomes a ledger row, not a job abort") {
    // The Either channel carries EXPECTED malformations; this page
    // instead passes every shape probe and then blows up inside
    // java.time (a date div whose first word ends in "day," but is not a
    // date) — before r11 that uncaught throw killed the whole parse job,
    // where the reference skips the one link (nodes.py:41-47).
    import spark.implicits._
    val html =
      """<div class="scorebox">
        |<a href="/teams/AAA/2024.shtml">Alpha</a>
        |<a href="/teams/BBB/2024.shtml">Beta</a>
        |<div class="scorebox_meta"><div>Funday, Garbage 99, 20XX</div></div>
        |</div>""".stripMargin
    val crash = Seq(("AAA202400001", "GamePage", html)).toDF("name_id", "page_type", "html")
    val att = Entities.gameAttempts(crash).collect()
    assert(att.length == 1 && att(0).game.isEmpty)
    assert(att(0).err.exists(_.contains("unexpected parse error")),
      s"expected an unexpected-error ledger row, got: ${att(0).err}")
  }
}
