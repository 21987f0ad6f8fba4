package graft

import org.apache.spark.sql.SparkSession

/** One-stop session configuration for the engine — applied at session
  * construction / harness entry, NEVER from library readers (a library
  * that silently reconfigures a user's session on every table load is a
  * footgun; `graft.ops.Tables` is a pure reader).
  *
  * Users building their own sessions have two equivalent routes:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` (config-only,
  *     survives session cloning), plus the two confs below, or
  *   - `GraftSession.init(spark)` once after `getOrCreate()`.
  */
object GraftSession {
  private val Marker = "spark.graft.initialized"

  /** Idempotent: registers the native functions and applies the engine's
    * required session confs. Safe to call many times; work happens once
    * per session. */
  def init(spark: SparkSession): SparkSession = {
    if (!spark.conf.getOption(Marker).contains("true")) {
      graft.functions.GraftFunctions.register(spark)
      // InferFiltersFromGenerate synthesizes `size(arr) > 0` under every
      // explode; predicate pushdown then drags it into the FileScan with
      // the array expression fully inlined (aliases substituted away), so
      // every scan row pays the whole array construction TWICE — and for
      // lambda bodies the inlining is per-element, turning shingling into
      // O(n²) re-splits inside the scan filter (observed: 8x slowdown on
      // the dedup queries). Our generated arrays are never empty enough
      // for the inferred filter to win.
      // APPEND to any exclusions the user's session already carries —
      // overwriting would silently re-enable rules they disabled
      val rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
      val existing = spark.conf.getOption("spark.sql.optimizer.excludedRules")
        .map(_.trim).filter(_.nonEmpty)
      val merged = existing match {
        case Some(v) if v.split(",").map(_.trim).contains(rule) => v
        case Some(v) => s"$v,$rule"
        case None => rule
      }
      spark.conf.set("spark.sql.optimizer.excludedRules", merged)
      // events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
      // default; read as raw nanos (Tables.events converts exactly).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set(Marker, "true")
    }
    spark
  }
}
