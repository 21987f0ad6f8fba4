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
    // SPARK_GRAFT_EXEC=1: run the query first and print the FINAL adaptive
    // plan — the only way to see AQE's runtime exchange/stage reuse, which
    // the pre-execution string hides.
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    for (q <- args) {
      println(s"==== $q ====")
      val df = SparkEntry.queries(q)(s, sf)
      if (exec) df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
  }
}
