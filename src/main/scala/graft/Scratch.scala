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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup
    SparkEntry.queries("q5_star_join")(spark, d).write.format("noop").mode("overwrite").save()
    for (q <- Seq("t_fingerprint", "q_asof_join", "q_range_join", "d_simhash_pairs",
                  "d_minhash_lsh")) {
      val fn = SparkEntry.queries(q)
      time(q)(fn(spark, d).write.format("noop").mode("overwrite").save())
      time(q + " (2nd)")(fn(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
