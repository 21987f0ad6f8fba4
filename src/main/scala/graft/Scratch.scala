package graft

import org.apache.spark.sql.SparkSession

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = SparkEntry.queries("q_sessionize")(spark, d).queryExecution.executedPlan.toString
    println("Window nodes: " + plan.linesIterator.count(_.trim.startsWith("Window")))
    println("Sort nodes: " + plan.linesIterator.count(_.trim.contains("Sort ")))
    println("Exchange nodes: " + plan.linesIterator.count(_.contains("Exchange")))
    spark.stop()
  }
}
