package graft

import org.apache.spark.sql.SparkSession

import graft.zip.{GraftError, ZipExtract, ZipToParquetConfig}

/** CLI entry point with the reference's exact flag surface
  * (src/main.rs:16-44) so a user of the reference tool can switch
  * binaries without changing invocations:
  *
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   -i data/ARCHIVES.zip -o out.parquet -g GLOB --row-group-size 100
  * }}}
  * (`-i` accepts globs like `ARCHIVES = **`; `-g` filters entry names.)
  *
  * `--simple` (plain logging instead of progress bars, src/main.rs:35-37)
  * maps to quiet WARN-level logs; default keeps Spark's own progress
  * reporting — the SURVEY §2.1 O14 "free via Spark" substitution.
  * Errors print their reference-equivalent message and exit 1
  * (src/main.rs:46-51). Ctrl-C maps to Spark's job cancellation + commit
  * protocol (O13): an interrupted write leaves no committed output.
  */
object Main {

  /** Parse the reference's flags into the engine config.
    * @return (config, stdout?, simple?) */
  private[graft] def parse(args: Seq[String]): (ZipToParquetConfig, Boolean, Boolean) = {
    var inputs = Vector.empty[String]
    var output: Option[String] = None
    var stdout = false
    var simple = false
    var noBody = false
    var noSource = false
    var noHash = false
    var glob: Option[String] = None
    var rowGroupSize = 100 // src/main.rs:42-43 default
    var rest = args.toList
    while (rest.nonEmpty) rest = rest match {
      case ("-i" | "--input") :: v :: t  => inputs :+= v; t
      case ("-o" | "--output") :: v :: t => output = Some(v); t
      case "--stdout" :: t               => stdout = true; t
      case "--no-body" :: t              => noBody = true; t
      case "--no-source" :: t            => noSource = true; t
      case "--no-hash" :: t              => noHash = true; t
      case "--simple" :: t               => simple = true; t
      case ("-g" | "--glob") :: v :: t   => glob = Some(v); t
      case "--row-group-size" :: v :: t  =>
        rowGroupSize =
          try v.toInt
          catch { case _: NumberFormatException =>
            GraftError.raise(GraftError.InvalidArgument(
              s"--row-group-size expects a number, got '$v'"))
          }
        t
      case other :: _ =>
        GraftError.raise(GraftError.InvalidArgument(s"unknown argument: $other"))
      case Nil => Nil
    }
    // sink validation, reference src/error.rs:41-42
    if (output.isEmpty && !stdout) GraftError.raise(GraftError.NeedsOutputOrStdout)
    if (output.nonEmpty && stdout) GraftError.raise(GraftError.InvalidOutputAndStdout)
    (ZipToParquetConfig(
      inputs = inputs,
      output = output.getOrElse(""),
      includeBody = !noBody,
      includeSource = !noSource,
      includeHash = !noHash,
      entryGlob = glob,
      rowGroupSize = rowGroupSize), stdout, simple)
  }

  private[graft] def run(spark: SparkSession, args: Seq[String]): Unit = {
    val (cfg, stdout, simple) = parse(args)
    run(spark, cfg, stdout, simple)
  }

  private def run(spark: SparkSession, cfg: ZipToParquetConfig,
      stdout: Boolean, simple: Boolean): Unit = {
    // O8/O14 parity: the reference totals the entry count before extracting
    // (src/builder.rs:24-45) — under --simple print it as a plain log line.
    // stderr, because --stdout streams parquet bytes on stdout.
    if (simple) System.err.println(s"${ZipExtract.countEntries(spark, cfg)} files")
    if (stdout) ZipExtract.runToStream(spark, cfg, System.out)
    else ZipExtract.run(spark, cfg)
  }

  def main(argv: Array[String]): Unit = {
    val (cfg, stdout, simple) =
      try parse(argv.toSeq)
      catch { case e: GraftError.GraftException =>
        System.err.println(e.err.message) // src/main.rs:47-50
        sys.exit(1)
      }
    val spark = GraftSession.init(SparkSession.builder()
      .appName("zip-to-parquet")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .getOrCreate())
    if (simple) spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfg, stdout, simple)
    catch { case e: Throwable =>
      val msg = GraftError.unwrap(e).map(_.message).getOrElse(e.getMessage)
      System.err.println(msg)
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
