package graft.scrape

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.scrape.BBRefParse._

/** Spark pipeline from parsed pages to the reference's star schema:
  * dimension get_or_create, FK resolution, and the appearance-counter
  * disambiguation — all as joins and window functions (one shuffle per
  * key), never a driver-side loop.
  *
  * Reference semantics: deep-field bbref_pages.py — Team/Venue
  * get_or_create (337-372), name→id lookup via roster tables (307-324),
  * _PlayerAppearances lag/cumsum disambiguation (706-761).
  */
object Entities {

  /** Parse all game pages once; reused by meta/roster/play extractors. */
  def parsedGames(pages: DataFrame): Dataset[ParsedGame] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.filter(col("page_type") === "GamePage")
      .select("name_id", "html").as[(String, String)]
      .flatMap { case (nid, html) => parseGame(nid, html) }
  }

  def playerRows(pages: DataFrame): Dataset[PlayerRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.filter(col("page_type") === "PlayerPage")
      .select("name_id", "html").as[(String, String)]
      .flatMap { case (nid, html) => parsePlayer(nid, html) }
  }

  def gamesMeta(parsed: Dataset[ParsedGame]): DataFrame =
    parsed.select(col("meta.*"))

  def rosters(parsed: Dataset[ParsedGame]): DataFrame =
    parsed.select(col("meta.nameId").as("game_name_id"), explode(col("roster")).as("r"))
      .select(col("game_name_id"), col("r.side"), col("r.idx"), col("r.name"), col("r.nameId").as("name_id"))

  def rawPlays(parsed: Dataset[ParsedGame]): DataFrame =
    parsed.select(col("meta.nameId").as("game_name_id"), explode(col("plays")).as("p"))
      .select(col("game_name_id"), col("p.*"))

  /** get_or_create analog: distinct natural keys + deterministic dense
    * surrogate ids (same construction as q16).
    */
  def venueDim(games: DataFrame): DataFrame =
    games.filter(col("venue").isNotNull).select(col("venue").as("name")).distinct()
      .withColumn("venue_id", dense_rank().over(Window.orderBy("name")).cast("long"))

  def teamDim(games: DataFrame): DataFrame =
    games.select(col("awayTeam.*")).union(games.select(col("homeTeam.*")))
      .distinct()
      .withColumn("team_id",
        dense_rank().over(Window.orderBy("name", "abbreviation")).cast("long"))

  /** Game star rows with venue/team surrogate FKs resolved by broadcast
    * joins (dims are small by construction).
    */
  def gameStar(games: DataFrame): DataFrame = {
    val v = venueDim(games)
    val t = teamDim(games)
    games
      .join(broadcast(v), games("venue") === v("name"), "left")
      .join(broadcast(t.as("away")),
        col("awayTeam.name") === col("away.name") &&
          col("awayTeam.abbreviation") === col("away.abbreviation"))
      .join(broadcast(t.as("home")),
        col("homeTeam.name") === col("home.name") &&
          col("homeTeam.abbreviation") === col("home.abbreviation"))
      .select(
        col("nameId").as("game_name_id"), col("date"),
        col("localStartTime").as("local_start_time"),
        col("timeOfDay").as("time_of_day"), col("fieldType").as("field_type"),
        col("venue_id"),
        col("away.team_id").as("away_team_id"),
        col("home.team_id").as("home_team_id"))
  }

  /** The reference's full update_db pipeline (pages.py:92-116,
    * nodes.py ScrapeNode DFS): players insert before games before plays,
    * expressed as dependency-ordered DataFrame construction — player dim
    * first, then game star rows, then plays with numeric FKs resolved
    * through broadcast dim joins. Returns every output table.
    *
    * Convenience form: parses (and caches) the game pages itself. When a
    * parsed dataset already exists — e.g. one shared across several
    * queries in a session — pass it to the two-arg overload instead so
    * the corpus is parsed exactly once; the caller then owns unpersist.
    */
  def starSchema(pages: DataFrame): Map[String, DataFrame] =
    starSchema(pages, parsedGames(pages).cache())

  /** As above, but over an externally-parsed (ideally cached) game
    * dataset — the parse is the dominant cost of the scrape pipeline, so
    * sharing it across s4/s5/s6/s7 halves the suite's work.
    */
  def starSchema(pages: DataFrame, parsed: Dataset[ParsedGame]): Map[String, DataFrame] = {
    val games = gamesMeta(parsed)
    val playerDim = playerRows(pages).toDF("name_id", "name", "bats", "throws")
      .withColumn("player_id",
        org.apache.spark.sql.functions.dense_rank()
          .over(Window.orderBy("name_id")).cast("long"))
    val venues = venueDim(games)
    val teams = teamDim(games)
    val gameStarDf = gameStar(games)
      .withColumn("game_id",
        org.apache.spark.sql.functions.dense_rank()
          .over(Window.orderBy("game_name_id")).cast("long"))
    val plays = resolvePlays(rawPlays(parsed), rosters(parsed))
      .join(broadcast(gameStarDf.select("game_name_id", "game_id")), Seq("game_name_id"))
      .join(broadcast(playerDim.select(col("name_id").as("batter_name_id"),
        col("player_id").as("batter_id"))), Seq("batter_name_id"), "left")
      .join(broadcast(playerDim.select(col("name_id").as("pitcher_name_id"),
        col("player_id").as("pitcher_id"))), Seq("pitcher_name_id"), "left")
      .select("game_id", "play_num", "inning_half", "start_outs", "start_on_base",
        "desc", "pitch_ct", "batter_id", "pitcher_id")
    Map("venue" -> venues, "team" -> teams, "player" -> playerDim,
      "game" -> gameStarDf, "play" -> plays)
  }

  /** Spark regexp twin of [[BBRefParse.stripName]] (same Java regexes). */
  def stripNameCol(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(c, " \\w\\.", ""), " [J|S]r\\.", "")

  /** Resolve play batter/pitcher names to roster name_ids, reproducing
    * the reference's appearance-counter algorithm with window functions:
    *
    *  - side of each player from the inning half (t-batter=away, ...)
    *  - play name resolves to the roster name as-is when present, else
    *    stripped (the KeyError fallback in __player_to_id)
    *  - batter appearance number = count of that name's prior plate
    *    appearances on that side (row_number - 1)
    *  - pitcher appearance number increments only on pitcher CHANGE:
    *    flag plays whose raw pitcher differs from the next play's
    *    (lead), then cumulative-sum flags over prior plays of the same
    *    resolved name/side
    *  - id = roster ids for the name, in roster order, cycled modulo
    *    (assume a subsequent appearance cycles to the next id)
    *
    * Single shuffle per window key; roster side is broadcast.
    */
  def resolvePlays(rawPlays: DataFrame, rosters: DataFrame): DataFrame = {
    val idsByName = rosters.groupBy("game_name_id", "side", "name")
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("name_id")))),
        s => s.getField("name_id")).as("ids"))
      .withColumn("n_ids", size(col("ids")))

    val sided = rawPlays
      .withColumn("batter_side",
        when(substring(col("inning"), 1, 1) === "t", "away").otherwise("home"))
      .withColumn("pitcher_side",
        when(substring(col("inning"), 1, 1) === "t", "home").otherwise("away"))

    // resolve to roster names: exact if present, else stripped
    def resolveName(df: DataFrame, nameCol: String, sideCol: String, out: String): DataFrame = {
      val names = rosters.select(col("game_name_id").as("__rg"),
        col("side").as("__rs"), col("name").as("__rn")).distinct()
      df.join(broadcast(names),
          col("game_name_id") === col("__rg") &&
            col(sideCol) === col("__rs") && col(nameCol) === col("__rn"), "left")
        .withColumn(out, coalesce(col("__rn"), stripNameCol(col(nameCol))))
        .drop("__rg", "__rs", "__rn")
    }

    val named = resolveName(
      resolveName(sided, "batter", "batter_side", "batter_res"),
      "pitcher", "pitcher_side", "pitcher_res")

    val gameOrder = Window.partitionBy("game_name_id").orderBy("playNum")
    val batterW = Window.partitionBy("game_name_id", "batter_side", "batter_res").orderBy("playNum")
    val pitcherW = Window.partitionBy("game_name_id", "pitcher_side", "pitcher_res").orderBy("playNum")

    val withAppear = named
      .withColumn("batter_appear", row_number().over(batterW) - 1)
      .withColumn("__pchange",
        when(lead(col("pitcher"), 1).over(gameOrder).isNotNull &&
          lead(col("pitcher"), 1).over(gameOrder) =!= col("pitcher"), 1).otherwise(0))
      .withColumn("pitcher_appear",
        coalesce(sum(col("__pchange")).over(
          pitcherW.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))

    def attachId(df: DataFrame, sideCol: String, nameCol: String, appearCol: String, out: String): DataFrame = {
      val ids = idsByName
        .withColumnRenamed("game_name_id", "__g").withColumnRenamed("side", "__s")
        .withColumnRenamed("name", "__n")
      df.join(broadcast(ids),
          col("game_name_id") === col("__g") && col(sideCol) === col("__s") &&
            col(nameCol) === col("__n"), "left")
        .withColumn(out,
          element_at(col("ids"), (col(appearCol) % col("n_ids")).cast("int") + 1))
        .drop("__g", "__s", "__n", "ids", "n_ids")
    }

    val resolved = attachId(
      attachId(withAppear, "batter_side", "batter_res", "batter_appear", "batter_name_id"),
      "pitcher_side", "pitcher_res", "pitcher_appear", "pitcher_name_id")

    resolved.select(
      col("game_name_id"),
      col("playNum").as("play_num"),
      expr("2 * (CAST(substring(inning, 2) AS INT) - 1) + IF(substring(inning, 1, 1) = 't', 0, 1)")
        .as("inning_half"),
      col("outs").as("start_outs"),
      expr("IF(substring(onBase,1,1)<>'-',1,0) + IF(substring(onBase,2,1)<>'-',2,0) + IF(substring(onBase,3,1)<>'-',4,0)")
        .as("start_on_base"),
      col("desc"), col("pitchCt").as("pitch_ct"),
      col("batter_name_id"), col("pitcher_name_id"))
  }
}
