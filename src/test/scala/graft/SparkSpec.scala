package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs; mirrors the Verify/Bench configs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // same local-mode hardening as GraftSession.builder: without it a
    // hypervisor-stall burst makes the in-process executor miss enough
    // heartbeats that Spark System.exit(56)s the whole test JVM
    .config("spark.executor.heartbeatInterval", "30s")
    .config("spark.network.timeout", "600s")
    .config("spark.executor.heartbeat.maxFailures", "10000")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session is shared across suites in one JVM; don't stop it here
    super.afterAll()
  }
}
