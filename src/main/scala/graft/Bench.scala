package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first timed query otherwise absorbs session init
    // (codegen compiler, parquet footer cache, broadcast infra) — ~5s of
    // constant cost unrelated to any query's plan.
    try {
      SparkEntry.queries("q5_star_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full computation of every output column —
      // count() would let Catalyst prune the projections being measured.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      // A failed query must not masquerade as a fast one: report -1.
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // strip quotes/backslashes AND all control chars — strict JSON parsers
    // reject raw control bytes, which codegen/parser error messages carry
    val errJson = errors.reverse
      .map { case (k, m) => "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200) + "\"" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
