package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev harness: dump `.explain("formatted")` for named queries to files.
  * Usage: runMain graft.PlanDump <dataDir> <outDir> [q1,q2,...] [suffix]
  * Used to commit plans/rNN/<query>_before.txt / _after.txt evidence —
  * the optimization judge checks plan-shape claims (Exchange count, join
  * strategy, PushedFilters) against these files without running Spark.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <dataDir> <outDir> [names] [suffix]")
    val dir = args(0)
    val out = args(1)
    val names =
      if (args.length > 2 && args(2) != "all")
        args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val suffix = if (args.length > 3) args(3) else ""
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // ADVICE r18: mirror Bench.scala's env parameterization (a hardcoded
    // local[8] dumped plan shapes that need not match the bench
    // configuration), and refuse to ride a pre-existing session, whose
    // getOrCreate would silently ignore master/conf — the dump must
    // record plans under the settings it claims.
    require(SparkSession.getActiveSession.isEmpty &&
        SparkSession.getDefaultSession.isEmpty,
      "PlanDump needs a fresh JVM: an existing SparkSession would make " +
        "getOrCreate silently ignore the master/conf settings")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // provenance header: the effective settings the plans were dumped under
    val header = s"-- PlanDump master=${spark.sparkContext.master} " +
      s"shuffle.partitions=${spark.conf.get("spark.sql.shuffle.partitions")} " +
      s"dataDir=$dir\n"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, s"$n$suffix.txt"), header + txt)
      System.err.println(s"[plandump] wrote $out/$n$suffix.txt")
    }
    spark.stop()
  }
}
