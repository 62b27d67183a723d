package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      when(regexp_like(nameId, lit(GameIdRe)), "GamePage")
        .when(regexp_like(nameId, lit(PlayerIdRe)), "PlayerPage")
        .when(file.contains("schedule"), "SchedulePage")
        .otherwise("unknown").as("page_type"),
      col("value").as("html"))
  }
}
