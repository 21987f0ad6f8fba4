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
    import Tables._

    // warmup
    SparkEntry.queries("q5_star_join")(spark, d).write.format("noop").mode("overwrite").save()

    val docShs = documents(spark, d)
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      .select(col("doc_id"), expr(
        """array_distinct(CASE WHEN size(toks) >= 3 THEN
              transform(sequence(1, size(toks) - 2),
                i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
                            ' ', element_at(toks, i + 2)))
            ELSE array() END)""").as("shs"))
    time("docShs")(println(docShs.count()))
    time("docShs again")(println(docShs.count()))
    val postings = docShs.select(col("doc_id"), explode(col("shs")).as("sh"))
    time("postings")(println(postings.count()))
    val groups = postings.groupBy("sh").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
    time("groups")(println(groups.count()))
    val pairs = groups
      .select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
    time("pairs")(println(pairs.count()))
    val inter = pairs.groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    time("inter")(println(inter.count()))
    time("full")(
      DedupOps.ngramJaccard(spark, d).write.format("noop").mode("overwrite").save())
    time("full again")(
      DedupOps.ngramJaccard(spark, d).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
