package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import graft.ops._

    for (q <- Seq("d_ngram_jaccard", "d_minhash_lsh", "s_cosine_topk", "t_ngram_freq",
                  "d_simhash_pairs", "q5_star_join")) {
      val fn = SparkEntry.queries(q)
      time(q)(fn(spark, d).write.format("noop").mode("overwrite").save())
      time(q + " (2nd)")(fn(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
