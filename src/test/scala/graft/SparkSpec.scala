package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — built through THE SAME
  * [[graft.engine.GraftSession.builder]] the Verify/Bench gates use
  * (smaller core count), so every plan a spec audits forms under the
  * gate's confs: 64 MB broadcast threshold, AQE family, UTC, local-mode
  * heartbeat hardening, and a reliable checkpoint dir (the branch
  * iterative operators take on a cluster). Before r11 this trait
  * hand-rolled a session that silently diverged (default 10 MB
  * broadcast threshold), so plan audits were passing under confs the
  * gate never runs; GraftSessionSpec now pins the parity.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = graft.engine.GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(graft.sources.Spool.tempRoot("ckpt"))
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session is shared across suites in one JVM; don't stop it here
    super.afterAll()
  }
}
