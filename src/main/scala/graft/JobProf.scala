package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.engine.GraftSession

/** Developer diagnostic: run one SparkEntry query with a job listener
  * and print every Spark job's wall time, call site and description —
  * the attribution tool for queries whose cost is a SUM OF SMALL JOBS
  * (the streaming ingest loops, the landed-index builders) where a
  * stage-level view hides the fixed per-job scheduling floor.
  *
  * `runMain graft.JobProf <query> [reps]` against `SPARK_GRAFT_SF_DIR`
  * (default sf0.1). Not part of the driver gate.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "usage: JobProf <name> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = GraftSession.local()
    spark.range(1000000).selectExpr("sum(id)").collect()

    final case class JobRec(start: Long, site: String, desc: String)
    val open = new ConcurrentHashMap[Int, JobRec]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, String)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties.getProperty("callSite.short")).getOrElse("?")
        val desc = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        open.put(e.jobId, JobRec(System.nanoTime(), site, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = open.remove(e.jobId)
        if (r != null)
          done.add((e.jobId, (System.nanoTime() - r.start) / 1e9, r.site, r.desc))
      }
    }
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    (1 to reps).foreach { r =>
      done.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      // give the listener bus a beat to drain stragglers before reading
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq.sortBy(_._1)
      println(f"[jobprof] $name rep $r: total $total%.2fs rows=$cnt jobs=${jobs.size} jobSum=${jobs.map(_._2).sum}%.2fs")
      jobs.foreach { case (id, sec, site, desc) =>
        val d = if (desc.length > 60) desc.take(57) + "..." else desc
        println(f"[jobprof]   job $id%4d $sec%6.3fs  $site%-40s $d")
      }
    }
    spark.stop()
  }
}
