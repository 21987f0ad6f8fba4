package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Z-order layout: the point is multi-column skipping, so the test
  * measures it — mean per-file min/max span (what a stats pruner sees) on
  * BOTH z-columns for the z-ordered layout vs a linear sort, on the same
  * data and file count. */
class SkippingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("z-order clusters both dimensions; linear sort only one") {
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val zOut = s"$dir/z"
    val linOut = s"$dir/lin"
    val n = Skipping.zorderWrite(spark, sf, zOut, nFiles = 8)
    assert(n == 8, s"expected 8 z-ordered files, got $n")
    // linear baseline: same file count, sorted on user_id only
    Tables.events(spark, sf)
      .repartitionByRange(8, org.apache.spark.sql.functions.col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linOut)

    val zUser = Skipping.meanFileSpan(spark, zOut, "user_id")
    val zValue = Skipping.meanFileSpan(spark, zOut, "value")
    val linUser = Skipping.meanFileSpan(spark, linOut, "user_id")
    val linValue = Skipping.meanFileSpan(spark, linOut, "value")

    // linear sort: near-perfect on its own column, poor on the other
    assert(linUser < 0.3, s"linear user span $linUser")
    // z-order: BOTH columns substantially clustered — strictly better than
    // linear on the non-sorted column, bounded on both
    assert(zValue < linValue,
      s"z-order value span $zValue not better than linear $linValue")
    assert(zUser < 0.6, s"z-order user span $zUser")
    assert(zValue < 0.6, s"z-order value span $zValue")
  }

  test("partitionedWrite prunes day partitions at file-listing time") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_part").toFile
    out.deleteOnExit()
    val n = Skipping.partitionedWrite(spark, sf, out.getAbsolutePath)
    assert(n >= 28 && n <= 31, s"expected ~30 day partitions, got $n")
    val filtered = spark.read.parquet(out.getAbsolutePath)
      .filter(col("day").between("2024-01-10", "2024-01-12"))
    // the filter must reach the source as a PARTITION filter (pruned at
    // listing), not a data filter evaluated per row after IO
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      s"day predicate not in PartitionFilters:\n${plan.take(1500)}")
    // runtime truth: only the 3 matching partition dirs contribute files
    val days = filtered.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
      .flatMap(_.split("/").find(_.startsWith("day=")))
      .toSet
    assert(days == Set("day=2024-01-10", "day=2024-01-11", "day=2024-01-12"),
      s"scanned partitions: $days")
    // and the pruned read returns exactly the source rows in range
    val want = Tables.events(spark, sf)
      .filter(to_date(col("ts")).between("2024-01-10", "2024-01-12")).count()
    assert(filtered.count() == want)
  }

  test("e_zorder z-values are consistent with their bucket ids") {
    val rows = Skipping.eZorder(spark, sf).collect()
    assert(rows.length == 10000)
    rows.take(500).foreach { r =>
      val (ux, vx, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      var expected = 0L
      for (i <- 0 until Skipping.ZBits) {
        expected += (((ux >> i) & 1L) << (2 * i)) + (((vx >> i) & 1L) << (2 * i + 1))
      }
      assert(z == expected, s"event ${r.getLong(0)}: z=$z expected=$expected")
    }
  }
}
