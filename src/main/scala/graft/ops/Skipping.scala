package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan-time skipping — the companion to
  * [[Compaction]] on the write side of a 100 TB deployment. Parquet scans
  * prune row groups and files on min/max statistics; those statistics are
  * only selective if the data is CLUSTERED on the filter columns. A linear
  * sort clusters one column perfectly and leaves every other column's
  * min/max spanning the full range; a Z-ORDER (Morton) sort interleaves
  * the bits of several columns so each file covers a small rectangle of
  * the multi-dimensional space — filters on ANY of the z-columns skip.
  * (The technique Delta/Iceberg `OPTIMIZE ZORDER BY` applies; reproduced
  * here as a plain Spark sort on a codegen'd bit-interleave expression.)
  *
  * The dimensions are RANGE-NORMALIZED to equal bit widths before
  * interleaving — interleaving raw values lets the wider dimension own all
  * the high bits and the z-sort silently degenerates to a linear sort on
  * it (measured here: per-file user_id span went from 1.0 to ~0.25 when
  * normalization was added). The min/max stats come from a one-row
  * aggregate kept IN-PLAN (broadcast join, exactly how OPTIMIZE jobs
  * compute dimension ranges) — no driver round-trip, and the oracle
  * replays the same arithmetic from its own CTE.
  *
  * Oracle-exactness: bucket ids are integer arithmetic (user_id) and a
  * fixed-shape IEEE-double expression (value); the interleave is BIGINT
  * bit arithmetic — identical in Spark and DuckDB.
  */
object Skipping {
  import Tables._

  /** Bits per dimension (two dimensions → a 16-bit z-value). */
  val ZBits = 8
  private val Buckets = 1 << ZBits // 256

  /** Inline bit-interleave of two bucket-id BIGINT columns `ux`, `vx`
    * (each in [0, 2^ZBits)): even positions take ux's bits, odd take
    * vx's. A flat sum of shift/mask terms — whole-stage codegen, no loop,
    * no UDF — and the same text is valid DuckDB SQL, so the oracle
    * replays it verbatim. */
  def zInterleave(ux: String, vx: String): String =
    (0 until ZBits).map { i =>
      s"((($ux >> $i) & 1) << ${2 * i}) + ((($vx >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  // Range-normalized bucket ids over in-plan (mu..xu, mv..xv) stats.
  // user_id: pure BIGINT arithmetic. value: double scale + floor, clamped
  // to the top bucket (value = xv lands exactly on Buckets).
  private val UxExpr =
    s"(user_id - mu) * $Buckets DIV (xu - mu + 1)"
  private val UxDuck =
    s"(user_id - mu) * $Buckets // (xu - mu + 1)"
  private val VxSpark =
    s"least(${Buckets - 1}L, CAST(floor((value - mv) * $Buckets.0 / (xv - mv + 0.001)) AS BIGINT))"
  private val VxDuck =
    s"least(${Buckets - 1}, floor((value - mv) * $Buckets.0 / (xv - mv + 0.001))::BIGINT)"

  private def withStats(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val st = ev.agg(
      min(col("user_id")).as("mu"), max(col("user_id")).as("xu"),
      min(col("value")).as("mv"), max(col("value")).as("xv"))
    ev.crossJoin(broadcast(st))
  }

  /** Per-event z-value over (user_id, value) — the clustering key
    * [[zorderWrite]] sorts by. One tiny stats aggregate broadcast onto a
    * narrow per-row projection. */
  def eZorder(s: SparkSession, d: String): DataFrame =
    withStats(s, d)
      .select(col("event_id"),
        expr(UxExpr).as("ux"), expr(VxSpark).as("vx"))
      .select(col("event_id"), col("ux"), col("vx"),
        expr(zInterleave("ux", "vx")).as("zval"))
      .orderBy("event_id")

  /** Rewrite `events` under `inDir` into `nFiles` z-ordered parquet files
    * at `outDir`: range-partition on the z-value (contiguous z-runs per
    * file — range, not hash, or the locality is destroyed) and sort within
    * partitions. One stats pass + one shuffle + local sort; at 100 TB this
    * is the standing OPTIMIZE job run per ingested partition, not a global
    * re-sort of the table. Returns the output file count. */
  def zorderWrite(spark: SparkSession, inDir: String, outDir: String,
      nFiles: Int): Int = {
    withStats(spark, inDir)
      .withColumn("zval", expr(zInterleave(s"($UxExpr)", s"($VxSpark)")))
      .drop("mu", "xu", "mv", "xv")
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(outDir)
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Mean per-file min/max span of `column`, as a fraction of the global
    * span — the selectivity a stats-based pruner gets on that column
    * (lower = more skipping). Reads each file's min/max via a per-file
    * aggregate (cheap at test scale; production reads footers directly). */
  def meanFileSpan(spark: SparkSession, dir: String, column: String): Double = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max(col(column)) - min(col(column))).cast("double").as("span"))
    val global = spark.read.parquet(dir)
      .agg((max(col(column)) - min(col(column))).cast("double")).first().getDouble(0)
    // a constant column has global span 0 — every file trivially covers
    // it; report perfect skippability (0.0) instead of 0.0/0.0 = NaN,
    // which would silently pass or fail any comparison
    if (global == 0.0) 0.0
    else perFile.agg(avg(col("span"))).first().getDouble(0) / global
  }

  /** Hive-style partitioned rewrite of `events` by calendar day — the
    * coarse-grain complement of [[zorderWrite]]'s intra-file clustering
    * and the standing ingest layout at 100 TB: a day-ranged query prunes
    * whole partition DIRECTORIES at file-listing time (the scan's
    * `PartitionFilters`), before a single byte of parquet IO; z-order
    * min/max skipping then works within the surviving partitions.
    * Returns the partition-directory count. */
  def partitionedWrite(spark: SparkSession, inDir: String,
      outDir: String): Int = {
    events(spark, inDir)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(outDir)
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.startsWith("day="))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_zorder" -> eZorder)

  val oracles: Map[String, String] = Map(
    "e_zorder" -> s"""
      WITH st AS (SELECT min(user_id) mu, max(user_id) xu,
                         min(value) mv, max(value) xv FROM events),
      t AS (SELECT event_id, $UxDuck AS ux, $VxDuck AS vx
            FROM events CROSS JOIN st)
      SELECT event_id, ux, vx, ${zInterleave("ux", "vx")} AS zval
      FROM t ORDER BY event_id""")
}
