package graft

import org.apache.spark.sql.SparkSession
import graft.zip.{ZipExtract, ZipToParquetConfig}

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = ZipToParquetConfig(inputs = Seq("/tmp/zipbench/*.zip"),
      output = "/tmp/zipbench_out", singleFile = false)
    time("extract+hash+write (multi)")(ZipExtract.run(spark, cfg))
    time("extract+hash+write again")(ZipExtract.run(spark, cfg))
    time("extract singleFile")(
      ZipExtract.run(spark, cfg.copy(singleFile = true, output = "/tmp/zipbench_out1")))
    time("names only (count)")(
      println(ZipExtract.entries(spark,
        cfg.copy(includeBody = false, includeHash = false)).count()))
    time("dsv2 names only (count)")(
      println(spark.read.format("zip").load("/tmp/zipbench/*.zip")
        .select("name").count()))
    val n = spark.read.parquet("/tmp/zipbench_out").count()
    println(s"[scratch] rows written: $n")
    spark.stop()
  }
}
