package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the deployment-side answer to the fact⋈fact
  * shuffles called out in the join queries' scale notes (RelationalOps
  * q3/q5: "bucket both by orderkey in a real deployment to eliminate it").
  *
  * Writing both join sides bucketed (and sorted) by the join key gives
  * every future join/aggregation on that key a shuffle-free plan: Spark
  * reads co-numbered buckets task-aligned, so a sort-merge join needs no
  * Exchange on either side and a groupBy on the key needs none after the
  * join. At 100 TB this converts the dominant repeated cost (re-shuffling
  * the fact tables per query) into a one-time layout cost at ingest.
  *
  * Bucket-count guidance: pick `buckets` so one bucket of the LARGER table
  * is a few hundred MB after compression (e.g. 100 TB / 512 MB ≈ 200k
  * buckets); both sides of a co-located join must use the same count.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. The sort makes the
    * per-bucket files merge-join-ready without a per-task sort. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — with matching
    * bucket counts the physical plan contains NO Exchange on either side
    * (asserted in BucketingSpec). */
  def cobucketJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // resolve keys against each side's DataFrame — bare col() would be
    // ambiguous when both tables bucket on the same column name
    l.join(r, l(leftKey) === r(rightKey))
  }
}
