package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (not part of the library surface): times any
  * declared queries at sf0.1 with a warmed session —
  *   sbt 'runMain graft.Scratch q5_star_join d_ngram_jaccard'
  * No args = the historically hot set.
  */
object Scratch {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("d_ngram_jaccard", "d_minhash_lsh", "d_simhash_pairs", "s_cosine_topk")
    SparkEntry.queries("q5_star_join")(spark, d).write.format("noop").mode("overwrite").save()
    for (q <- qs; fn = SparkEntry.queries(q)) {
      time(q)(fn(spark, d).write.format("noop").mode("overwrite").save())
      time(q + " (warm)")(fn(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
