package graft

import org.apache.spark.sql.SparkSession

/** Dev plan-audit harness (not part of the library surface; the timing
  * twin is [[Scratch]]): prints the executed physical plan of any declared
  * queries —
  *   sbt 'runMain graft.Probe d_span_coverage t_mix_weights'
  * Reading these regularly is how plan regressions (lost pushdown, a
  * surprise CartesianProduct, a missing partial agg) get caught before
  * they cost anything.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      println(s"==== $q ====")
      println(SparkEntry.queries(q)(s, sf)
        .queryExecution.executedPlan.toString.take(12000))
    }
  }
}
