package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * total test time dominated by work, not startup). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // session shared; stopped by JVM exit
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.init(SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // fast executor heartbeats so the MainSpec intra-task row-progress
    // golden test sees partial accumulator updates inside a sub-second
    // task (production default is 10s; the listener's grain follows it)
    .config("spark.executor.heartbeatInterval", "100ms")
    // managed tables (BucketingSpec) go to a scratch warehouse, not ./
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate())
}
