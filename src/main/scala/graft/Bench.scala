package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Session construction shared by the full run and drift mode — one
    * definition so the two protocols measure under identical confs. */
  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Untimed warmup: the first timed query otherwise absorbs session
    * init (codegen compiler, parquet footer cache, broadcast infra) —
    * ~5s of constant cost unrelated to any query's plan. */
  private def warmup(spark: SparkSession, sfDir: String): Unit =
    try {
      SparkEntry.queries("q5_star_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

  /** The ONE timing protocol (GC fence → one UNTIMED warm-up rep →
    * reps × noop-sink run → sorted times), shared by the full run and
    * drift mode so the two kinds of numbers stay comparable — the noop
    * sink forces full computation of every output column (count() would
    * let Catalyst prune the projections being measured), and the GC
    * fence keeps one query's JIT/GC debris out of the next query's
    * wall-clock (r6: t_ngram_freq benched 1.73s after t_bpe_train vs
    * 0.58s isolated). The per-query warm-up rep (r11 finding, verdict
    * ask) exists because inside a ~270-query sequence the first rep of
    * a sub-second query pays ~1.3× codegen/JIT/cache re-warm that
    * isolated sessions don't — medians that included it inflated the
    * in-sequence totals and forced 5-rep side-session re-triage every
    * round. */
  private def timeQuery(spark: SparkSession, sfDir: String, name: String,
      reps: Int): Vector[Double] = {
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    System.gc()
    once() // warm-up: compiles the query's codegen + primes caches, untimed
    Iterator.continually(once()).take(reps).toVector.sorted
  }

  /** Session-speed calibration anchor (r15 verdict ask #2): a
    * data-independent pure-CPU job — a codegen'd integer hash-mod sum
    * over `spark.range` (no input, no shuffle beyond the final 1-row
    * agg, deterministic result) — timed with the SAME protocol as the
    * queries at the start, middle, and end of a run. Two artifacts'
    * anchors expose the SESSION-speed ratio: the same r14 code measured
    * 229.4s and 174.3s in different sessions, and r15's driver run
    * showed a uniform +12.7% on code-unchanged queries — load noise
    * nothing in the artifact could prove. tools/bench_diff.py divides
    * out the anchor ratio before flagging. Work is sized per CPU so the
    * anchor stays ~0.5s at any core count (constant per-thread work =
    * the same thing the per-query numbers measure). */
  private def anchorMedian(spark: SparkSession, cpus: String,
      reps: Int): Double = {
    import org.apache.spark.sql.functions._
    val n = 100000000L * math.max(1, cpus.toInt)
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, n, 1L, math.max(1, cpus.toInt))
        .select(sum(pmod(col("id") * lit(2654435761L) + lit(104729L),
          lit(94906249L))).as("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    System.gc()
    once() // untimed warm-up, the query protocol
    val ts = Iterator.continually(once()).take(reps).toVector.sorted
    ts(ts.size / 2)
  }

  /** Memory/allocation-bound sibling of [[anchorMedian]] (r16 finding):
    * the ALU anchor stayed near-flat through a session where the
    * token/text family — per-row string materialization, allocator and
    * GC pressure, DRAM traffic — doubled; a register-arithmetic loop
    * cannot see memory-bandwidth contention. This arm hashes a
    * per-row MATERIALIZED string (md5 of the cast id — allocation +
    * bytes traffic per row, the t_* profile), so a pair of artifacts
    * exposes TWO session ratios: compute and memory. bench_diff
    * normalizes by the compute anchor (conservative) and warns when
    * the two disagree — a memory-contended session flags text-family
    * queries that a compute-only calibration would miss-read as code
    * regressions. */
  private def anchorMemMedian(spark: SparkSession, cpus: String,
      reps: Int): Double = {
    import org.apache.spark.sql.functions._
    val n = 1500000L * math.max(1, cpus.toInt)
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, n, 1L, math.max(1, cpus.toInt))
        .select(sum(crc32(md5(col("id").cast("string")).cast("binary")))
          .as("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    System.gc()
    once()
    val ts = Iterator.continually(once()).take(reps).toVector.sorted
    ts(ts.size / 2)
  }

  /** Disk/IO-bound third anchor (r18 verdict ask #7, additions-only):
    * the compute anchor sees CPU contention and the memory anchor sees
    * allocator/DRAM contention, but neither reads the I/O stack — the
    * r18 comparison hinged on a 2.39× memory-anchor swing (25×
    * in-session spread) that could not be attributed between DRAM and
    * disk. This arm scans a deterministic ~300 MB parquet written
    * UNTIMED once per invocation (content is a pure function of the
    * core count, so runs at the same cpus read identical bytes) and
    * sums payload lengths — column decode + page reads, the scan-path
    * profile — under the SAME GC-fence/warm-up/median protocol.
    * tools/bench_diff.py reports all three ratios and warns when any
    * pair disagrees. */
  private def anchorIoSetup(spark: SparkSession, cpus: String): String = {
    import org.apache.spark.sql.functions._
    val parts = math.max(1, cpus.toInt)
    val n = 150000L * parts
    val path = s"target/anchor_io_c$parts.parquet"
    spark.range(0L, n, 1L, parts)
      .select(col("id"), concat(md5(col("id").cast("string")),
        md5((col("id") + lit(n)).cast("string"))).as("payload"))
      .write.mode("overwrite").parquet(path)
    path
  }

  private def anchorIoMedian(spark: SparkSession, path: String,
      reps: Int): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(path)
        .select(sum(length(col("payload"))).as("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    System.gc()
    once() // untimed warm-up, the query protocol
    val ts = Iterator.continually(once()).take(reps).toVector.sorted
    ts(ts.size / 2)
  }

  /** Drift-verify mode (judge advice r8 #8): re-time the named queries,
    * each in a FRESH SparkSession (new codegen cache / broadcast infra /
    * AQE stats — the state a long full run accumulates), and APPEND the
    * result as its own JSON line to target/bench.json. A full-run number
    * that looks regressed is then checked mechanically: run
    * `SPARK_GRAFT_DRIFT=q1,q2 runMain graft.Bench` and diff the appended
    * drift line against the full-run line (tools/bench_diff.py) — if the
    * isolated number is back at baseline the drift was shared-box
    * contention, not a plan regression (the round-8 R8_NOTES #4 call,
    * made repeatable). */
  private def driftMode(names: Seq[String], sfDir: String, cpus: String,
      reps: Int): Unit = {
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_DRIFT names unknown queries: ${unknown.mkString(", ")}")
    var anchors = List.empty[Double]
    var memAnchors = List.empty[Double]
    var ioAnchors = List.empty[Double]
    // the IO anchor's input file is written ONCE per invocation (content
    // is a pure function of the core count); the per-query sessions only
    // read it
    val setup = buildSession(cpus)
    val ioPath =
      try anchorIoSetup(setup, cpus)
      finally {
        setup.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    val results = names.sorted.map { name =>
      val spark = buildSession(cpus)
      try {
        warmup(spark, sfDir)
        anchors ::= anchorMedian(spark, cpus, reps)
        memAnchors ::= anchorMemMedian(spark, cpus, reps)
        ioAnchors ::= anchorIoMedian(spark, ioPath, reps)
        val times = timeQuery(spark, sfDir, name, reps)
        name -> times(times.size / 2)
      } finally {
        spark.stop()
        // a fresh session per query needs the old context fully gone
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // one anchor per fresh session; emit the real per-session SPREAD
    // (min/median/max — ADVICE r16: writing the median into all three
    // slots silenced bench_diff's within-artifact instability warning on
    // exactly the runs whose session variance the anchor exists to expose)
    val as = anchors.sorted
    val ms = memAnchors.sorted
    val ios = ioAnchors.sorted
    val anchorJson = s"""{"start":${as.head},"mid":${
        as(as.size / 2)},"end":${as.last}}"""
    val anchorMemJson = s"""{"start":${ms.head},"mid":${
        ms(ms.size / 2)},"end":${ms.last}}"""
    val anchorIoJson = s"""{"start":${ios.head},"mid":${
        ios(ios.size / 2)},"end":${ios.last}}"""
    val json =
      s"""{"metric":"drift","queries":$qs,"anchor":$anchorJson,"anchor_mem":$anchorMemJson,"anchor_io":$anchorIoJson,"reps":$reps,"warmup":1,"sf":"$sfDir"}"""
    println(json)
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      System.err.println(s"[bench] drift line appended to ${out.toAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not append drift line: $e")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    sys.env.get("SPARK_GRAFT_DRIFT") match {
      case Some(csv) =>
        val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
        driftMode(csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          sfDir, cpus, reps)
        return
      case None => ()
    }
    val spark = buildSession(cpus)
    warmup(spark, sfDir)
    var errors = List.empty[(String, String)]
    // Noise hardening: run queries in sorted-name order (Map iteration
    // order made round-over-round numbers incomparable) and time REPS runs
    // per query, reporting the median (and min) — single-shot numbers on a
    // shared box swing ±30%.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    // Dev-loop subset: SPARK_GRAFT_QUERIES="a,b,c" times only those queries.
    // The driver never sets it, so judged runs always cover the full map.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly, not bench nothing (cf. Verify)
    subset.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_QUERIES names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = subset.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    def timeOne(name: String): (String, (Double, Double)) = {
      // progress to stderr (driver reads stdout only): makes a slow or
      // wedged query identifiable from OUTSIDE without a thread dump
      System.err.println(s"[bench] ${java.time.Instant.now()} start $name")
      val times =
        try timeQuery(spark, sfDir, name, reps)
        catch { case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[bench] $name FAILED: $e")
          Vector.empty
        }
      // A failed query must not masquerade as a fast one: report -1.
      if (times.isEmpty) name -> (-1.0, -1.0)
      else name -> (times(times.size / 2), times.head)
    }
    val names = selected.keys.toSeq.sorted
    val ioPath = anchorIoSetup(spark, cpus) // untimed, once per invocation
    val anchorStart = anchorMedian(spark, cpus, reps)
    val memStart = anchorMemMedian(spark, cpus, reps)
    val ioStart = anchorIoMedian(spark, ioPath, reps)
    val (firstHalf, secondHalf) = names.splitAt(names.size / 2)
    val r1 = firstHalf.map(timeOne)
    val anchorMid = anchorMedian(spark, cpus, reps)
    val memMid = anchorMemMedian(spark, cpus, reps)
    val ioMid = anchorIoMedian(spark, ioPath, reps)
    val r2 = secondHalf.map(timeOne)
    val anchorEnd = anchorMedian(spark, cpus, reps)
    val memEnd = anchorMemMedian(spark, cpus, reps)
    val ioEnd = anchorIoMedian(spark, ioPath, reps)
    val results = r1 ++ r2
    val anchorJson =
      s"""{"start":$anchorStart,"mid":$anchorMid,"end":$anchorEnd}"""
    val anchorMemJson =
      s"""{"start":$memStart,"mid":$memMid,"end":$memEnd}"""
    val anchorIoJson =
      s"""{"start":$ioStart,"mid":$ioMid,"end":$ioEnd}"""
    System.err.println(
      s"[bench] anchor: $anchorJson mem: $anchorMemJson io: $anchorIoJson")
    val qs = results.map { case (k, (med, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qmins = results.map { case (k, (_, mn)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // strip quotes/backslashes AND all control chars — strict JSON parsers
    // reject raw control bytes, which codegen/parser error messages carry
    val errJson = errors.reverse
      .map { case (k, m) => "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200) + "\"" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qmins,"anchor":$anchorJson,"anchor_mem":$anchorMemJson,"anchor_io":$anchorIoJson,"reps":$reps,"warmup":1,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: the driver keeps only a tail of stdout, which
    // truncated the per-query map in round 4 — the file keeps rounds
    // auditable end-to-end.
    try {
      // A dev-loop subset run must not overwrite the judged full-run
      // artifact with a partial query map that nothing marks as partial
      // (the same stale-masquerade Verify subsets were hardened against) —
      // subsets write a distinct file.
      val outName =
        if (subset.isEmpty) "target/bench.json" else "target/bench_subset.json"
      val out = java.nio.file.Paths.get(outName)
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n")
      System.err.println(s"[bench] wrote ${out.toAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: $e")
    }
    spark.stop()
    // Per-query chunk lines (r18 verdict ask #2, additions-only): the
    // driver keeps only a ~2KB stdout tail and parses trailing JSON
    // lines, so the ~9.5KB full-precision queries line above can never
    // reach it whole (measured: 309 entries ≈ 9.3KB; even at 3-decimal
    // precision ≈ 7.1KB — the verdict's "single last line" option fails
    // the size check). Per its prescribed fallback, the per-query map is
    // re-printed as SELF-CONTAINED chunk lines (3-decimal medians,
    // shared run_id, part/nparts) immediately before the compact final
    // line: whatever part of the tail survives parses line-by-line, and
    // the final line stays one complete JSON object for the totals
    // contract. Full precision remains in the big line + target/bench.json.
    val runId = java.lang.Long.toHexString(System.nanoTime())
    def fmt3(d: Double): String =
      if (d < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val entries = results.map { case (k, (med, _)) => s"\"$k\":${fmt3(med)}" }
    val chunks = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    var cur = List.empty[String]
    var curLen = 0
    for (e <- entries) {
      if (curLen + e.length + 1 > 1500 && cur.nonEmpty) {
        chunks += cur.reverse; cur = Nil; curLen = 0
      }
      cur ::= e; curLen += e.length + 1
    }
    if (cur.nonEmpty) chunks += cur.reverse
    val nparts = chunks.size
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"metric":"queries_part","run_id":"$runId","part":${
        i + 1},"nparts":$nparts,"reps":$reps,"sf":"$sfDir","queries":${
        c.mkString("{", ",", "}")}}""")
    }
    // The compact, self-contained summary LAST (no per-query maps) so the
    // tail always ends with one complete parseable JSON object.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"run_id":"$runId","nparts":$nparts,"anchor":$anchorJson,"anchor_mem":$anchorMemJson,"anchor_io":$anchorIoJson,"reps":$reps,"warmup":1,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) sys.exit(1)
  }
}
