package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory is assembled from the ops packages; every entry with an
  * oracle is hash-checked against DuckDB by the driver (Verify), the rest
  * get rows-only checks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A star join + aggregation exercising scan, broadcast join, shuffle
    * join, and exact-decimal aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q5StarJoin(GraftSession.init(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Each builder is wrapped with the idempotent GraftSession.init so the
    * contract surface works on any caller-provided session; the ops
    * builders themselves never touch session state (library purity). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ParityOps.queries ++ RelationalOps.queries ++ SubqueryOps.queries ++
      EventOps.queries ++ TextOps.queries ++ CorpusOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      Skipping.queries ++ ValidationOps.queries)
      .map { case (name, fn) =>
        name -> ((s: SparkSession, dir: String) => fn(GraftSession.init(s), dir))
      }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityOps.oracles ++ RelationalOps.oracles ++ SubqueryOps.oracles ++
      EventOps.oracles ++ TextOps.oracles ++ CorpusOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MultimodalOps.oracles ++
      Skipping.oracles ++ ValidationOps.oracles
}
