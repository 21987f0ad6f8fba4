package graft

import org.apache.spark.sql.SparkSession

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q5_star_join")(spark, d).write.format("noop").mode("overwrite").save()
    for (q <- Seq("d_ngram_jaccard")) {
      val fn = SparkEntry.queries(q)
      time(q)(fn(spark, d).write.format("noop").mode("overwrite").save())
      time(q + " (2nd)")(fn(spark, d).write.format("noop").mode("overwrite").save())
      time(q + " (3rd)")(fn(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
