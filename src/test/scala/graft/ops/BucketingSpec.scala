package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketing scale story, proven on the physical plan: co-bucketed
  * fact tables join (and then aggregate on the join key) with ZERO
  * exchanges — the layout pays the shuffle once at write time. */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("compaction rewrites a fragmented dataset into the target file count") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/d"
    // 16 tiny files — the per-archive / per-micro-batch ingest pattern
    (1 to 1000).toDF("v").repartition(16).write.mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles == 16)
    val n = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(n == 1)
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles == 1)
    assert(spark.read.parquet(out).as[Int].collect().sorted.toSeq == (1 to 1000))
  }

  test("partitionBy layout prunes partitions at the scan") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    Tables.documents(spark, sf).write.partitionBy("lang").mode("overwrite").parquet(out)
    val df = spark.read.parquet(out).filter(col("lang") === "en").select("doc_id")
    val plan = df.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory pruning —
    // non-matching partitions are never listed, let alone read), not in
    // DataFilters/PushedFilters
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter not pruned to partitions:\n${plan.take(1500)}")
    assert(df.count() ==
      Tables.documents(spark, sf).filter(col("lang") === "en").count())
  }

  test("incremental-near manifest persisted BUCKETED by shingle: the " +
      "probe join plans with NO exchange on the manifest side, and the " +
      "persisted-path report equals the inline recompute row for row " +
      "(r16 verdict ask #5 — the production shape the scaladoc promises)") {
    val conf = spark.conf
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val docs = Tables.documents(spark, sf)
      val history = docs.filter(col("doc_id") < 400)
      val batch = docs.filter(col("doc_id") >= 400)
      // ingest-time: materialize the manifest ONCE, bucketed by shingle
      Bucketing.writeBucketed(DedupOps.nearManifest(history),
        "near_manifest", "sh", 4)
      val probe = DedupOps.incrementalNearProbeAgainst(
        spark.table("near_manifest"), batch)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"),
        s"manifest scan is not bucketed:\n${plan.take(3000)}")
      // exactly ONE exchange — the batch side shuffling to the bucket
      // partitioning; a second would mean the persisted manifest is
      // being re-shuffled, the cost the bucketed layout exists to kill
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"manifest side still shuffles:\n${plan.take(3000)}")
      // and the persisted-path report IS the gate query's answer
      val persisted = DedupOps.incrementalNearReport(probe)
        .orderBy("doc_id").collect().toSeq
      val inline = DedupOps.incrementalNear(spark, sf)
        .collect().toSeq
      assert(persisted == inline,
        "persisted-manifest probe diverged from the inline recompute")
    } finally {
      prev.foreach { case (k, v) => conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS near_manifest")
    }
  }

  test("co-bucketed join + key aggregation plans with no shuffle") {
    val conf = spark.conf
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, sf), "li_bucketed",
        "l_orderkey", 4)
      Bucketing.writeBucketed(Tables.orders(spark, sf), "ord_bucketed",
        "o_orderkey", 4)
      val joined = Bucketing.cobucketJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(3000)}")
      // and the result is the same as the shuffled join's
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      assert(joined.orderBy("l_orderkey").collect().toSeq ==
        expected.orderBy("l_orderkey").collect().toSeq)
    } finally {
      prev.foreach { case (k, v) => conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
