package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 invariants. Centerpiece: the community-grain dedup emitter
  * is safe BY MEASUREMENT — no near-dup pair inside one community ever
  * survives with both endpoints kept, and a community auto-picks a
  * survivor exactly when it has a non-bridge member. */
class R10InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("d_community_dedup: fixture routing on the bridged-triangles graph") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // two triangles joined by the 3-4 bridge (the R9CurveSpec LPA
    // fixture: communities {1,2,3}→1 and {4,5,6}→4; bridges 3 and 4)
    // plus two docs outside the pair graph entirely
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a_id", "b_id")
    val docs = (1L to 8L).toDF("doc_id")
    val got = DedupOps.communityDedupFrom(docs, pairs).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    // community 1: non-bridge members {1,2} → keep min 1, drop 2,
    // review bridge 3; community 4: non-bridge {5,6} → keep 5, drop 6,
    // review bridge 4; singletons 7,8 keep with NULL community
    assert(got.toSeq == Seq(
      (1L, 1L, "keep"), (2L, 1L, "drop"), (3L, 1L, "review"),
      (4L, 4L, "review"), (5L, 4L, "keep"), (6L, 4L, "drop"),
      (7L, -1L, "keep"), (8L, -1L, "keep")), s"got ${got.toSeq}")
  }

  test("d_community_dedup: a fully-contested community auto-picks NO survivor") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // triangle {1,2,3}, triangle {4,5,6}, and EVERY member of triangle 1
    // wired to node 4. Hand-traced with the self-vote: l1 = 1,1,1,1,4,4
    // (node 4's six votes all tie, min 1; 5 and 6 follow 4), l2 stable —
    // communities {1,2,3,4}→1 and {5,6}→4. Node 4 bridges into {5,6};
    // nodes 5 and 6 each have a foreign edge back to 4 — so community 4
    // is ALL bridges and must emit only reviews, no auto-picked
    // survivor; community 1 keeps its min non-bridge member 1.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (1L, 4L), (2L, 4L), (3L, 4L)).toDF("a_id", "b_id")
    val labels = DedupOps.lpaCommunitiesFrom(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 4L, 6L -> 4L), s"fixture drifted: $labels")
    val docs = (1L to 6L).toDF("doc_id")
    val rows = DedupOps.communityDedupFrom(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, 1L, "keep"), (2L, 1L, "drop"), (3L, 1L, "drop"),
      (4L, 1L, "review"), (5L, 4L, "review"), (6L, 4L, "review")),
      s"got ${rows.toSeq}")
  }

  test("d_community_dedup invariant: no same-community near-dup pair is double-kept") {
    graft.GraftSession.init(spark)
    val pairs = DedupOps
      .jaccardFrom(DedupOps.pairCounts(spark, sf, DedupOps.DefaultMaxDf))
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    assert(pairs.count() > 0, "vacuous: no near-dup pairs at this SF")
    val routed = DedupOps.communityDedup(spark, sf).localCheckpoint()
    val doubleKept = pairs
      .join(routed.select(col("doc_id").as("a_id"), col("community_id").as("ca"),
        col("status").as("sa")), "a_id")
      .join(routed.select(col("doc_id").as("b_id"), col("community_id").as("cb"),
        col("status").as("sb")), "b_id")
      .filter(col("ca") === col("cb") &&
        col("sa") === "keep" && col("sb") === "keep")
    assert(doubleKept.count() == 0,
      s"double-kept near-dup pairs: ${doubleKept.take(3).toSeq}")
    // per-community keep census: exactly one survivor where any
    // non-bridge member exists, zero where the community is all bridges
    val labeled = routed.filter(col("community_id").isNotNull)
    val bad = labeled.groupBy("community_id")
      .agg(sum(when(col("status") === "keep", 1L).otherwise(0L)).as("nk"),
        sum(when(col("status") =!= "review", 1L).otherwise(0L)).as("nonBridge"))
      .filter((col("nonBridge") > 0 && col("nk") =!= 1L) ||
        (col("nonBridge") === 0 && col("nk") =!= 0L))
    assert(bad.count() == 0, s"keep census violated: ${bad.take(3).toSeq}")
    // and every document is routed exactly once
    assert(routed.count() == Tables.documents(spark, sf).count())
  }

  /** Scala replay of giniFromSupport's EXACT op chain: BIGINT limb
    * accumulation, limb3/limb2 normalization, then the same IEEE
    * double Horner/subtract/divide order. Long arithmetic in Scala has
    * the same truncating DIV/% as Spark SQL on nonnegative operands. */
  private def replayGini(rows: Seq[(Long, Long, Long)]): (Long, Long, Double) = {
    val L = Exact.Limb
    var nU, nE, sa, smh, sml, sch, scl = 0L
    for ((x, nc, b) <- rows) {
      val c = 2 * nc * b + nc * (nc + 1)
      val (xh, xl, ch, cl) = (x / L, x % L, c / L, c % L)
      nU += nc; nE += x * nc
      sa += xh * ch
      val mid = xh * cl + xl * ch
      smh += mid / L; sml += mid % L
      val low = xl * cl
      sch += low / L; scl += low % L
    }
    val (h2, h1, h0) = (sa + smh, sml + sch, scl)
    val c1 = h1 + h0 / L
    val c2 = h2 + c1 / L
    val s2d = (c2.toDouble * L.toDouble + (c1 % L).toDouble) * L.toDouble +
      (h0 % L).toDouble
    def limb2(h: Long, l: Long) =
      (h + l / L).toDouble * L.toDouble + (l % L).toDouble
    val subd = limb2((nU + 1) * (nE / L), (nU + 1) * (nE % L))
    val dend = limb2(nU * (nE / L), nU * (nE % L))
    (nU, nE, (s2d - subd) / dend)
  }

  private def giniOf(rows: Seq[(Long, Long, Long)]): (Long, Long, Double) = {
    import spark.implicits._
    val r = EventOps.giniFromSupport(rows.toDF("x", "nc", "b")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("e_gini ledger: sub-2^53 regime is EXACT (matches the integer rational)") {
    graft.GraftSession.init(spark)
    // ascending counts 1,2,5 with ties; b = prefix users below
    val rows = Seq((1L, 3L, 0L), (2L, 2L, 3L), (5L, 1L, 5L))
    val (n, e, g) = giniOf(rows)
    assert((n, e) == (6L, 12L))
    // exact: s2 = 2*sum(i*x_i) over ascending order 1,1,1,2,2,5
    val s2 = BigInt(2) * Seq(1L, 1L, 1L, 2L, 2L, 5L).zipWithIndex
      .map { case (x, i) => BigInt(i + 1) * x }.sum
    val num = (s2 - BigInt(n + 1) * e).toDouble
    assert(g == num / (n.toDouble * e), s"gini $g")
    assert(g == replayGini(rows)._3, "engine != Scala replay")
  }

  test("e_gini ledger: overflow regime (s2 >> 2^53, per-term x*c > 2^63) is IEEE-deterministic") {
    graft.GraftSession.init(spark)
    // wide counts: x ~ 2^40..2^42, tie blocks of thousands, deep prefix
    // masses — s2 ~ 2^68, per-term x*c ~ 2^66 (would overflow a naive
    // BIGINT product), n_events ~ 2^52 just inside the envelope
    val rows = Seq(
      (1099511627776L, 1021L, 0L),            // 2^40
      (2199023255552L, 907L, 1021L),          // 2^41
      (3298534883328L, 811L, 1928L),          // 1.5·2^41
      (4398046511104L, 499L, 2739L))          // 2^42
    val (n, e, g) = giniOf(rows)
    val (rn, re, rg) = replayGini(rows)
    assert((n, e) == ((rn, re)))
    assert(java.lang.Double.doubleToLongBits(g) ==
      java.lang.Double.doubleToLongBits(rg),
      s"bit divergence: engine $g vs replay $rg")
    assert(g > 0.0 && g < 1.0)
    // and the ledger really is beyond the naive regimes
    val s2exact = rows.map { case (x, nc, b) =>
      BigInt(x) * (BigInt(2) * nc * b + BigInt(nc) * (nc + 1)) }.sum
    assert(s2exact > BigInt(1L << 53) && s2exact > BigInt(Long.MaxValue))
    // accuracy: the double chain sits within relative 1e-12 of the
    // exact rational (it is NOT exact up here — only deterministic)
    val exact = BigDecimal(s2exact - BigInt(n + 1) * e) / BigDecimal(BigInt(n) * e)
    assert((BigDecimal(g) - exact).abs / exact < 1e-12)
  }

  test("e_gini ledger: envelope breach fails LOUDLY, not silently") {
    graft.GraftSession.init(spark)
    val tooManyEvents = Seq((1L << 53, 1L, 0L))
    val ex = intercept[Exception] {
      giniOf(tooManyEvents)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("e_gini ledger envelope")),
      s"wrong failure: $ex")
  }

  test("top_k bounded aggregate == rank window, bit-for-bit (ties, multi-partition)") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // coarse distances force heavy ties so the struct tie-break (lowest
    // id) is actually exercised; 8 input partitions force real partial
    // buffers + a merge
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i =>
      (i % 7L, math.floor(rnd.nextDouble() * 50) / 10.0, i.toLong))
    val df = rows.toDF("g", "d", "id").repartition(8).localCheckpoint()
    val viaAgg = df.groupBy("g")
      .agg(call_function("top_k",
        struct(col("d"), col("id")), lit(5), lit(true)).as("tk"))
      .select(col("g"), posexplode(array_sort(col("tk"))))
      .select(col("g"), (col("pos") + 1).cast("int").as("rank"),
        col("col.d").as("d"), col("col.id").as("id"))
    val w = Window.partitionBy("g").orderBy(col("d"), col("id"))
    val viaWin = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("d"), col("id"))
    assert(viaAgg.exceptAll(viaWin).isEmpty &&
      viaWin.exceptAll(viaAgg).isEmpty,
      "bounded top_k disagrees with the rank window")
    assert(viaAgg.count() == 35)
  }

  test("v_corr_matrix: a negative input fails LOUDLY, not by desync") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // a credit/return-style row: negative extendedprice breaks the
    // cross-product limb terms' nonnegativity precondition — the
    // sentinel must raise, not silently produce engine-divergent bits
    val dir = java.nio.file.Files.createTempDirectory("graft_neg").toString
    Seq((0.05, -101.50, 3L, 0.02), (0.00, 55.25, 1L, 0.04))
      .toDF("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      .write.parquet(s"$dir/lineitem.parquet")
    val ex = intercept[Exception] {
      ValidationOps.corrMatrix(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative input")), s"wrong failure: $ex")
    // and the all-nonnegative twin still computes
    val ok = java.nio.file.Files.createTempDirectory("graft_pos").toString
    Seq((0.05, 101.50, 3L, 0.02), (0.00, 55.25, 1L, 0.04))
      .toDF("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      .write.parquet(s"$ok/lineitem.parquet")
    assert(ValidationOps.corrMatrix(spark, ok).collect().length == 6)
  }

  test("top_k device edges: k exceeding the group and single-row groups") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (2L, 9.0, 12L))
      .toDF("g", "d", "id")
    val got = df.groupBy("g")
      .agg(call_function("top_k",
        struct(col("d"), col("id")), lit(5), lit(true)).as("tk"))
      .select(col("g"), posexplode(array_sort(col("tk"))))
      .select(col("g"), col("pos"), col("col.d"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    // groups smaller than k yield exactly their rows, sorted
    assert(got.toSet == Set((1L, 0, 1.0, 11L), (1L, 1, 3.0, 10L),
      (2L, 0, 9.0, 12L)), s"got ${got.toSeq}")
  }

  test("top_k builder rejects malformed calls with clear errors") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("g", "d")
    def err(agg: => org.apache.spark.sql.DataFrame): String = {
      val ex = intercept[Exception] { agg.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      msgs(ex).mkString("; ")
    }
    // wrong arity — registry SQL can reach the builder directly
    assert(err(df.selectExpr("top_k(d)")).contains("exactly 3 arguments"))
    // NULL k
    assert(err(df.groupBy("g").agg(call_function("top_k", col("d"),
      lit(null).cast("int"), lit(true)))).contains("non-null literal"))
    // k = 0
    assert(err(df.groupBy("g").agg(call_function("top_k", col("d"),
      lit(0), lit(true)))).contains("k must be >= 1"))
    // a LONG k beyond Int range must be an error, not a silent truncation
    assert(err(df.groupBy("g").agg(call_function("top_k", col("d"),
      lit(6000000000L), lit(true)))).contains("k must fit in INT"))
    // a LONG k <= 0 reports the range problem, not "must be an INT"
    // (r10 ADVICE: the Long case fell through to the catch-all message)
    assert(err(df.groupBy("g").agg(call_function("top_k", col("d"),
      lit(0L), lit(true)))).contains("k must be >= 1, got 0"))
    // Long.MinValue must not truncate to 0 before the message renders
    assert(err(df.groupBy("g").agg(call_function("top_k", col("d"),
      lit(Long.MinValue), lit(true))))
      .contains(s"k must be >= 1, got ${Long.MinValue}"))
    // non-boolean reverse
    assert(err(df.groupBy("g").agg(call_function("top_k", col("d"),
      lit(3), lit("yes")))).contains("reverse must be a BOOLEAN"))
  }

  test("d_community_stats: mass conservation and grain vs cluster stats") {
    graft.GraftSession.init(spark)
    val stats = DedupOps.communityStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    stats.foreach { case (size, nc, nd) => assert(nd == size * nc) }
    // every labeled node appears in exactly one community
    val nodes = DedupOps.lpaCommunities(spark, sf).count()
    assert(stats.map(_._3).sum == nodes, "histogram loses/duplicates docs")
    // communities refine components: at least as many communities as
    // CC clusters on the same pair graph
    val nComms = stats.map(_._2).sum
    val nClusters = DedupOps.clusterStats(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(nComms >= nClusters, s"$nComms communities < $nClusters clusters")
  }

  test("d_fuzzy_clusters: CC exactly over the fuzzy pair graph, min-id canonical") {
    graft.GraftSession.init(spark)
    val pairs = DedupOps.fuzzyPairs(spark, sf)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    assert(pairs.count() > 0, "vacuous: no fuzzy pairs at this SF")
    val cl = DedupOps.fuzzyClusters(spark, sf).localCheckpoint()
    // node set == the pair graph's endpoints, nothing more or less
    val nodes = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id"))).distinct()
    assert(cl.select("doc_id").exceptAll(nodes).isEmpty &&
      nodes.exceptAll(cl.select("doc_id")).isEmpty)
    // canonical is the component minimum: every cluster_id labels itself
    val selfLabeled = cl.filter(col("doc_id") === col("cluster_id")).count()
    assert(selfLabeled == cl.select("cluster_id").distinct().count())
    // and no fuzzy pair straddles two clusters
    val straddle = pairs
      .join(cl.select(col("doc_id").as("a_id"), col("cluster_id").as("ca")), "a_id")
      .join(cl.select(col("doc_id").as("b_id"), col("cluster_id").as("cb")), "b_id")
      .filter(col("ca") =!= col("cb"))
    assert(straddle.count() == 0)
  }

  test("d_fuzzy_dedup: full coverage, one survivor per cluster, dups == non-canonicals") {
    graft.GraftSession.init(spark)
    val docs = Tables.documents(spark, sf)
    val dd = DedupOps.fuzzyDedup(spark, sf).localCheckpoint()
    assert(dd.count() == docs.count(), "not full-corpus coverage")
    val cl = DedupOps.fuzzyClusters(spark, sf).localCheckpoint()
    // the dup set is EXACTLY the non-canonical cluster members
    val dups = dd.filter(col("is_dup")).select("doc_id")
    val nonCanon = cl.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    assert(dups.exceptAll(nonCanon).isEmpty && nonCanon.exceptAll(dups).isEmpty)
    assert(dups.count() > 0, "vacuous: no fuzzy dups at this SF")
    // per cluster: exactly one kept member (the canonical)
    val kept = dd.filter(!col("is_dup")).select("doc_id")
      .join(cl, "doc_id").groupBy("cluster_id").count()
    assert(kept.filter(col("count") =!= 1L).count() == 0)
  }

  test("e_cusum: windows replay the sequential max(0, S+r) recurrence exactly") {
    graft.GraftSession.init(spark)
    val got = EventOps.qCusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))
    assert(got.nonEmpty && got.exists(_._4 > 0.0),
      "vacuous: cusum_pos never positive")
    got.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.sortBy(_._2)
      val d = seq.length.toLong
      val tot = seq.map(_._3).sum
      var sPos = 0L; var sNeg = 0L
      seq.foreach { case (_, _, n, gotPos, gotNeg, up, down) =>
        val r = d * n - tot
        sPos = math.max(0L, sPos + r)
        sNeg = math.max(0L, sNeg - r)
        // readout is the single scaled-BIGINT-over-D division — exact
        // double equality, not approx (ledger < 2^53 at this SF)
        assert(gotPos == sPos.toDouble / d.toDouble &&
          gotNeg == sNeg.toDouble / d.toDouble, "excursion mismatch")
        assert(up == (sPos > 5L * tot) && down == (sNeg > 5L * tot))
      }
    }
  }

  test("e_cusum: a dead feed is zero-volume rows and fires shift_down") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // type A: 1 event/day on Jan 1-3, silence through Jan 19, 1 event
    // Jan 20 — D=20 days, T=4 events. Hand trace (scaled by D): active
    // residual 20·1−4=16, gap residual −4; p peaks at 48 after Jan 3,
    // then falls 4/day, so pmax−p > 5·T=20 from the 6th gap day on.
    val ev = (Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-20"))
      .map(d => ("A", java.sql.Timestamp.valueOf(d + " 12:00:00")))
      .toDF("event_type", "ts")
    val got = EventOps.cusumFrom(ev).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getBoolean(6)))
    assert(got.length == 20, s"grid not densified: ${got.length} rows")
    assert(got.count(_._2 == 0L) == 16, "gap days missing or nonzero")
    val downDays = got.filter(_._3).map(_._1)
    assert(downDays.nonEmpty && downDays.head == "2024-01-09" &&
      downDays.contains("2024-01-19"), s"shift_down wrong: ${downDays.toSeq}")
  }

  test("e_cusum: null ts excluded explicitly; corrupt-span raises, not poisons") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 12:00:00")
    // a null-ts row changes nothing (it has no calendar position)
    val clean = Seq(("A", ts("2024-01-01")), ("A", ts("2024-01-02")))
      .toDF("event_type", "ts")
    val dirty = clean.union(
      Seq(("A", null.asInstanceOf[java.sql.Timestamp])).toDF("event_type", "ts"))
    val a = EventOps.cusumFrom(clean).collect().map(_.toSeq)
    val b = EventOps.cusumFrom(dirty).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "null-ts row changed the ledger")
    // one epoch-zero outlier: the span guard raises deterministically
    // instead of densifying ~20k poison days
    val corrupt = clean.union(
      Seq(("A", ts("1970-01-01"))).toDF("event_type", "ts"))
    val e = intercept[Exception] {
      EventOps.cusumFrom(corrupt).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("calendar span")), s"wrong error: $e")
  }

  test("s_purity: full coverage, majority maximal, ties to lowest label") {
    graft.GraftSession.init(spark)
    val pur = SimilarityOps.clusterPurity(spark, sf).localCheckpoint()
    assert(pur.agg(sum("n_members")).head.getLong(0) ==
      Tables.embeddings(spark, sf).count())
    assert(pur.filter(col("n_top") > col("n_members") ||
      col("n_top") < 1L || col("purity") <= 0.0 || col("purity") > 1.0)
      .count() == 0)
    // independent recount: no (cell, label) beats the reported majority,
    // and anything tying it sorts at-or-after the reported label
    val counts = SimilarityOps.kmeansAssign(
        Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")),
        SimilarityOps.kmeansCentroids(spark, sf).map(c => (c._1, c._2)))
      .join(Tables.embeddings(spark, sf).select(col("vec_id"), col("label")),
        "vec_id")
      .groupBy("cell", "label").count()
    val bad = counts.join(pur, "cell")
      .filter(col("count") > col("n_top") ||
        (col("count") === col("n_top") && col("label") < col("top_label")))
    assert(bad.count() == 0)
  }

  test("e_hll_users_daily: registers merge exactly across splits; estimate near exact") {
    graft.GraftSession.init(spark)
    val ev = Tables.events(spark, sf)
    def regs(df: org.apache.spark.sql.DataFrame) = DedupOps.hllRegisters(
      df.select(to_date(col("ts")).as("day"),
        col("user_id").cast("string").as("tok")), Seq("day"))
    // the whole point of the sketch: per-split register states merged by
    // MAX equal the full-data state — incremental ingest never rescans
    val full = regs(ev)
    val merged = regs(ev.filter(col("event_id") % 2 === 0))
      .union(regs(ev.filter(col("event_id") % 2 === 1)))
      .groupBy("day", "bucket").agg(max(col("m")).as("m"))
    assert(full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
    // calibration vs the exact per-day distinct (e_dau_wau's dau):
    // 16 registers -> standard error ~26%; deterministic data, loose 2.5x
    val est = EventOps.qHllUsersDaily(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(2))).toMap
    val exact = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (day, n) =>
      val rel = math.abs(est(day) - n.toDouble) / n.toDouble
      assert(rel < 0.65, s"$day: est=${est(day)} exact=$n rel=$rel")
    }
  }

  test("d_cross_source_clusters: exactly the >=2-source components, lists sized right") {
    graft.GraftSession.init(spark)
    val got = DedupOps.crossSourceClusters(spark, sf).localCheckpoint()
    assert(got.count() > 0, "vacuous: no cross-source clusters at this SF")
    // independent recount off the cluster relation
    val want = DedupOps.dedupClusters(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy("cluster_id")
      .agg(countDistinct(col("source")).as("ns"))
      .filter(col("ns") >= 2).select("cluster_id")
    assert(got.select("cluster_id").exceptAll(want).isEmpty &&
      want.exceptAll(got.select("cluster_id")).isEmpty)
    // the rendered list agrees with the count; sources never outnumber
    // members
    assert(got.filter(size(split(col("sources"), ",")) =!= col("n_sources") ||
      col("n_sources") > col("n_docs")).count() == 0)
  }

  test("t_feature_hash: Scala replay of the signed hashing trick; mass bound") {
    graft.GraftSession.init(spark)
    val fh = TextOps.featureHash(spark, sf).localCheckpoint()
    assert(fh.count() > 0)
    // per-doc Σ|val| can never exceed the token count
    val toks = Tables.documents(spark, sf).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val bad = fh.groupBy("doc_id").agg(sum(abs(col("val"))).as("s"))
      .join(toks, "doc_id").filter(col("s") > col("n"))
    assert(bad.count() == 0)
    // bit-exact replay of dim/sign extraction for the first three docs
    val md = java.security.MessageDigest.getInstance("MD5")
    Tables.documents(spark, sf).filter(col("doc_id") < 3)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .foreach { case (id, text) =>
        val exp = scala.collection.mutable.Map.empty[Long, Long]
        text.split(" ", -1).foreach { tok =>
          val hex = md.digest(tok.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15)
          val h = java.lang.Long.parseLong(hex, 16)
          val dim = (h / 2) % 64
          exp(dim) = exp.getOrElse(dim, 0L) + (if (h % 2 == 0) 1L else -1L)
        }
        val got = fh.filter(col("doc_id") === id).collect()
          .map(r => r.getLong(1) -> r.getLong(2)).toMap
        assert(got == exp.filter(_._2 != 0L).toMap, s"doc $id")
      }
  }

  test("v_ldiversity: flag fires on a uniform-band class, recount matches") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // class (1, A): 6 members, all 'high' band -> k-anonymous (>= 5)
    // yet below_l; class (2, B): 2 members in 2 bands -> diverse
    val cust = (Seq.fill(6)((1, "A", 9000.0)) ++
      Seq((2, "B", -10.0), (2, "B", 100.0)))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = ValidationOps.lDiversityFrom(cust).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq((1, "A", 6L, 1L, true), (2, "B", 2L, 2L, false)),
      s"got ${got.toSeq}")
    // and on the real table: l_distinct agrees with an independent recount
    val real = ValidationOps.lDiversity(spark, sf)
    val re = Tables.customer(spark, sf)
      .select(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        when(col("c_acctbal") < 0.0, "neg")
          .when(col("c_acctbal") < 5000.0, "low").otherwise("high").as("b"))
      .groupBy("nationkey", "mktsegment")
      .agg(countDistinct(col("b")).as("l2"))
    assert(real.join(re, Seq("nationkey", "mktsegment"))
      .filter(col("l_distinct") =!= col("l2")).count() == 0)
  }

  test("d_fuzzy_dedup composes over a materialized pair store") {
    graft.GraftSession.init(spark)
    val pc = DedupOps.pairCounts(spark, sf, DedupOps.DefaultMaxDf)
      .localCheckpoint()
    val composed = DedupOps.fuzzyDedupFrom(Tables.documents(spark, sf), pc)
    val standalone = DedupOps.fuzzyDedup(spark, sf)
    assert(composed.exceptAll(standalone).isEmpty &&
      standalone.exceptAll(composed).isEmpty, "composed != standalone")
  }

  test("d_community_dedup composes over a materialized pair store") {
    graft.GraftSession.init(spark)
    val pc = DedupOps.pairCounts(spark, sf, DedupOps.DefaultMaxDf)
      .localCheckpoint()
    val composed = DedupOps.communityDedupFrom(
      Tables.documents(spark, sf),
      DedupOps.jaccardFrom(pc).select(col("a_id"), col("b_id")))
    val standalone = DedupOps.communityDedup(spark, sf)
    assert(composed.exceptAll(standalone).isEmpty &&
      standalone.exceptAll(composed).isEmpty,
      "composed != standalone")
  }
}
