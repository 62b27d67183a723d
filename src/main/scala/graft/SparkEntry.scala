package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.{DocumentSuite, RelationalSuite, ScrapeSuite, StreamingSuite}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every suite's operators; `oracleSql` carries the
  * DuckDB-equivalent SQL for each hash-checked key (rows-only operators
  * are present in `queries` but absent here).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalSuite.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalSuite.queries ++ DocumentSuite.queries ++ ScrapeSuite.queries ++
      StreamingSuite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalSuite.oracles ++ DocumentSuite.oracles ++ ScrapeSuite.oracles ++
      StreamingSuite.oracles

  /** Gate execution order: cost-ASCENDING, so a wall-clock-limited driver
    * run truncates only the most expensive tail instead of losing cheap
    * green rows (round 9 lost 12 sub-10-second CORRECTNESS rows - the t
    * family plus st7 - because the alphabetical order ran the
    * scrape+streaming tail first). Family ranks from measured per-query
    * cost (r07-r09 bench logs): text t (0.1-10 s), then relational q,
    * dedup d, ANN a, multimodal m, cheap scrape s1/s2/s3/s8, heavy
    * scrape s4/s5/s6/s7 (the full-corpus parse + star build), and last
    * the streaming st drains (micro-batch scheduling, the part most
    * amplified by a contended host). Within a family, numeric order
    * keeps the sequence deterministic. s7 belongs to the HEAVY family
    * despite being a cheap aggregation: it consumes the memoized star
    * build, so running it after s6 reuses the landed tables (~1 s),
    * while running it in the cheap group forces it to pay the whole
    * parse + build + land cost itself (measured 90 s at sf-independent
    * fixture scale in the first r10 bench).
    */
  def gateOrder(names: Iterable[String]): Seq[String] = {
    val heavyScrape = Set("s4_game_meta_parse", "s5_play_parse",
      "s6_star_schema_build", "s7_player_stats")
    def rank(n: String): (Int, Int) = {
      val fam =
        if (n.startsWith("st")) 7
        else if (n.startsWith("t")) 0
        else if (n.startsWith("q")) 1
        else if (n.startsWith("d")) 2
        else if (n.startsWith("a")) 3
        else if (n.startsWith("m")) 4
        else if (heavyScrape(n)) 6
        else 5 // s1, s2, s3, s8, s9
      (fam, "\\d+".r.findFirstIn(n).map(_.toInt).getOrElse(0))
    }
    names.toSeq.sortBy(rank)
  }
}
