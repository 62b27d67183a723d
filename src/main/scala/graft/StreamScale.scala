package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.engine.GraftSession
import graft.streaming.EventStreams

/** Large-state streaming drive (r14): run the st2/st7/st8 UN-drained
  * plans on RocksDB against a multi-file, time-ordered event arrival
  * sequence and report per-batch latency and state-store growth.
  *
  * `runMain graft.StreamScale <genDir> [nFiles]` — splits the dir's
  * events into `nFiles` time-range files (the realistic landed-log
  * layout: each micro-batch ingests one arrival, the watermark advances
  * between batches, eviction actually happens), then drives each plan
  * with Trigger.AvailableNow + maxFilesPerTrigger=1 into a noop sink and
  * prints one JSON line per query from StreamingQueryProgress:
  * batch durations, final state rows, state memory, rows emitted.
  * The gate's one-shot drain (Bench/Verify) can't observe any of this —
  * its single batch never exercises watermark movement or eviction.
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamScale <genDir> [nFiles]")
    val src = args(0)
    val nFiles = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local()
    // the large-state posture: every drive on RocksDB
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // recentProgress is ring-buffered (default 100); size it to the run
    // or nFiles > ~100 silently truncates the per-batch evidence this
    // tool exists to record
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (nFiles + 8).toString)

    // --- arrival sequence: nFiles time-ordered event files -----------------
    val work = Files.createTempDirectory("graft_streamscale").toString
    val ev = spark.read.parquet(s"$src/events.parquet").cache()
    val Array(tsMin, tsMax) = ev.agg(min(unix_micros(col("ts").cast("timestamp"))),
      max(unix_micros(col("ts").cast("timestamp")))).head().toSeq.map(_.asInstanceOf[Long]).toArray
    val span = (tsMax - tsMin) / nFiles + 1
    (0 until nFiles).foreach { i =>
      val lo = tsMin + i * span
      val hi = lo + span
      GenData.writeSingleParquetFile(f"$work/events_$i%03d.parquet")(
        ev.filter(unix_micros(col("ts").cast("timestamp")) >= lo &&
          unix_micros(col("ts").cast("timestamp")) < hi))
    }
    val nKeys = ev.select(countDistinct("user_id")).head().getLong(0)
    ev.unpersist()

    // --- drive each plan, one arrival file per micro-batch -----------------
    def drive(name: String, plan: DataFrame): String = {
      val cp = Files.createTempDirectory(s"graft_ss_cp_$name").toString
      val t0 = System.nanoTime()
      val q = plan.writeStream.format("noop").outputMode(OutputMode.Append())
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      // data batches only: AvailableNow emits a final no-data planning batch
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val durs = progs.map(_.batchDuration)
      val rowsOut = progs.flatMap(p => Option(p.sink)).map(_.numOutputRows).sum
      val stateOps = progs.flatMap(_.stateOperators)
      val lastState = progs.lastOption.map(_.stateOperators).getOrElse(Array())
      def j(xs: Seq[Long]) = xs.mkString("[", ",", "]")
      s""""$name":{"wall_s":${f"$wall%.2f"},"batches":${progs.length},""" +
        s""""batch_ms":${j(durs.toSeq)},""" +
        s""""rows_out":$rowsOut,""" +
        s""""state_rows_final":${lastState.map(_.numRowsTotal).sum},""" +
        s""""state_rows_evicted_total":${stateOps.map(_.numRowsRemoved).sum},""" +
        s""""state_mem_bytes_final":${lastState.map(_.memoryUsedBytes).sum}}"""
    }

    val parts = Seq(
      drive("st2_sessionize", EventStreams.sessionizePlan(spark, work, Some(1))),
      drive("st7_session_window", EventStreams.sessionWindowAggPlan(spark, work, Some(1))),
      drive("st8_ordinal", EventStreams.runningOrdinalPlan(spark, work, Some(1))))
    println(s"""{"src":"$src","n_files":$nFiles,"n_keys":$nKeys,""" +
      s""""provider":"rocksdb",${parts.mkString(",")}}""")
    spark.stop()
  }
}
