package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

// temporary debug - will be deleted
class ScratchDebug extends SparkSpec {
  test("debug bucketed write file counts") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("id").withColumn("v", col("id") * 2)
    val dir = graft.sources.Spool.tempRoot("scratch_bkt")
    spark.sql("DROP TABLE IF EXISTS scratch_bkt")
    val rep = df.repartition(8, col("id"))
    graft.sources.Sinks.bucketed(rep, "scratch_bkt", "id", 8, path = Some(s"$dir/t"))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t"))
    val names = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
    } finally files.close()
    println(s"FILE COUNT = ${names.size}")
    names.sorted.foreach(println)
    rep.explain("formatted")
    spark.sql("DROP TABLE IF EXISTS scratch_bkt")
  }
}
