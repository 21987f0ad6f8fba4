package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional: extra args restrict the dump to named queries (dev loop)
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    // a typo'd name must fail loudly, not silently dump zero queries and
    // overwrite queries.json with an empty manifest
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // a subset dump into a dir holding a FULL manifest would leave
    // local_verify validating the full set against stale outputs (only the
    // subset is refreshed) and reporting it as a full-gate pass — refuse
    require(only.isEmpty || !Files.exists(Paths.get(s"$outDir/queries.json")),
      s"$outDir holds a full dump (queries.json); subset dumps need a " +
        "fresh outDir so stale full-gate outputs can't masquerade as current")
    // Same masquerade one level down: a second subset dump into a dir whose
    // queries_subset.json names queries OUTSIDE this subset would refresh
    // the manifest but leave the other subset's stale parquet behind.
    val priorSubset = Paths.get(s"$outDir/queries_subset.json")
    if (only.nonEmpty && Files.exists(priorSubset)) {
      val prior = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(Files.readString(priorSubset)).map(_.group(1)).toSet
      require(prior.subsetOf(only),
        s"$outDir holds a prior subset dump naming other queries " +
          s"(${prior.diff(only).mkString(", ")}); use a fresh outDir")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // The driver contract path is outDir/<name>.parquet — a Spark
      // parquet directory with that name (readable as a dataset by
      // duckdb/pyarrow/pandas/pyspark alike).
      val target = new java.io.File(s"$outDir/$name.parquet")
      // A reused outDir must not let a previous run's output mask a query
      // that now throws — clear the target before the attempt.
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      if (target.exists()) rm(target)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(target.getPath)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        if (target.exists()) rm(target) // no partial/stale dir either
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Round-1 driver gate came back `no_oracle` for every query: the driver
    // indexes results by the output dataset name `<name>.parquet` while this
    // JSON was keyed by bare `<name>`. Emit every oracle under BOTH key forms
    // so either lookup convention finds it.
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Declared-query manifest: lets the local gate detect a query that
    // threw (no output dir) even when it has no oracle entry. A subset
    // (dev-loop) dump writes a DISTINCT file — overwriting queries.json
    // with the subset would let a later full local_verify run against the
    // same outDir silently validate just the subset while appearing to
    // pass the whole gate.
    val manifestFile = if (only.isEmpty) "queries.json" else "queries_subset.json"
    Files.writeString(Paths.get(s"$outDir/$manifestFile"),
      SparkEntry.queries.keys.toSeq.filter(k => only.isEmpty || only(k))
        .sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
