package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML cache directory → DataFrame(name_id, page_type, html).
  *
  * Spark-native replacement for the reference's file cache
  * (deep-field scraping/pages.py:118-312 HtmlCache): one row per page
  * file via the built-in `wholetext` text source, so a 100 TB cache fans
  * out across executors on file boundaries with no custom input format.
  * Page type is classified with native regexps on the name_id
  * (bbref_pages.py:65-75), evaluated inside codegen.
  */
object HtmlSource {

  val GameIdRe = "^[A-Z0-9]{3}[0-9]{9}$"
  val PlayerIdRe = "^[\\w\\.']+\\d\\d$"

  /** Page type from a name_id, as a codegen'd column expression. */
  def classifyCol(nameId: Column): Column =
    when(regexp_like(nameId, lit(GameIdRe)), "GamePage")
      .when(regexp_like(nameId, lit(PlayerIdRe)), "PlayerPage")
      .when(nameId.contains("schedule"), "SchedulePage")
      .otherwise("unknown")

  def pages(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.shtml")
      .text(dir)
    val file = regexp_extract(input_file_name(), "([^/]+)$", 1)
    val nameId = regexp_replace(file, "\\.s?html$", "")
    raw.select(
      nameId.as("name_id"),
      classifyCol(nameId).as("page_type"),
      col("value").as("html"))
  }

  /** Distributed retrieval through [[PageRetriever]]: one retriever per
    * partition (per-executor cache directory + rate limiter — see the
    * retriever's scaladoc for the global-budget arithmetic), so the
    * fetch-on-miss path runs where the data lands and the driver never
    * touches a page body. `mk` is the only thing shipped to executors.
    *
    * Per-page failure isolation (the reference catches and logs per-link
    * exceptions so one bad page never aborts a season, nodes.py:41-47):
    * a throwing fetch yields a row with `ok = false`, an empty body and
    * the error message in `err` instead of failing the task — which
    * after Spark's retries would re-fetch the partition's earlier pages
    * each attempt and then kill the whole crawl job. Callers filter on
    * `ok` before parsing and report the failures from the ledger.
    */
  def retrieve(spark: SparkSession, urls: Seq[String],
               mk: () => PageRetriever): DataFrame = {
    import spark.implicits._
    val nPart = math.max(1, math.min(urls.size, spark.sparkContext.defaultParallelism))
    retrieveDf(spark.createDataset(urls).toDF("url").repartition(nPart), mk)
  }

  /** [[retrieve]] over a DataFrame frontier (one `url` column) — the
    * de-drivered wave shape (r16 VERDICT): frontier rows flow
    * spool → mapPartitions → spool without ever passing through the
    * driver, so a wave can be page-volume-proportional while the driver
    * holds only the wave counter. Partitioning follows the input (a
    * spooled frontier fans out on its files).
    */
  def retrieveDf(urls: DataFrame, mk: () => PageRetriever): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(col("url")).as[String]
      .mapPartitions { it =>
        val r = mk()
        it.map { u =>
          val nameId = graft.scrape.BBRefParse.nameIdOf(u)
          scala.util.Try(r.page(u)) match {
            case scala.util.Success(html) => (nameId, html, true, null: String)
            case scala.util.Failure(e) =>
              (nameId, "", false, s"${e.getClass.getName}: ${e.getMessage}")
          }
        }
      }
      .toDF("name_id", "html", "ok", "err")
      .select(col("name_id"), classifyCol(col("name_id")).as("page_type"),
        col("html"), col("ok"), col("err"))
  }
}
