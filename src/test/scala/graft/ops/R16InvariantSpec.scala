package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-16 invariants: the ADVICE r15 fail-loud fixes — pq_argmin's
  * bounds checks (an UnsafeArrayData out-of-range read was previously
  * silent garbage while GenericArrayData threw) and the audio stream
  * arms' maxDf Int-overflow guard. */
class R16InvariantSpec extends SparkSpec {

  private def rootCause(t: Throwable): Throwable = {
    var c = t
    while (c.getCause != null && c.getCause != c) c = c.getCause
    c
  }

  test("pq_argmin: offset + subDim past the vector end raises" +
      " IllegalArgumentException on BOTH the codegen (UnsafeArrayData)" +
      " path and the direct kernel (GenericArrayData) path") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    // window [3, 3+2) over a 4-element vector: one element out of range
    val thrown = intercept[Throwable] {
      df.select(expr(
        "pq_argmin(embedding, array(0.5D, 1.0D, 1.0D), 3, 2)")).collect()
    }
    val root = rootCause(thrown)
    assert(root.isInstanceOf[IllegalArgumentException] &&
        root.getMessage.contains("out of range"),
      s"expected fail-loud out-of-range, got $root")
    // direct kernel, GenericArrayData representation
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f, 4.0f))
    val flat = new GenericArrayData(Array[Any](0.5d, 1.0d, 1.0d))
    val ex = intercept[IllegalArgumentException] {
      graft.functions.VecUtil.pqArgmin(a, flat, 3, 2)
    }
    assert(ex.getMessage.contains("out of range"))
  }

  test("pq_argmin: codebook length not a multiple of subDim + 1 raises" +
      " instead of silently truncating trailing codewords") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    // subDim=2 → block=3; a 4-element codebook drops its 4th double
    val thrown = intercept[Throwable] {
      df.select(expr(
        "pq_argmin(embedding, array(0.5D, 1.0D, 1.0D, 7.0D), 0, 2)")).collect()
    }
    val root = rootCause(thrown)
    assert(root.isInstanceOf[IllegalArgumentException] &&
        root.getMessage.contains("multiple"),
      s"expected fail-loud codebook-shape error, got $root")
    // the well-shaped twin still evaluates
    val ok = df.select(expr(
      "pq_argmin(embedding, array(0.5D, 1.0D, 1.0D), 0, 2)")).collect()
    assert(ok(0).getLong(0) == 0L)
  }

  test("s_mmr: collect-once greedy — ONE distributed job per query" +
      " (the r15 shape launched one argmax job per greedy step)") {
    graft.GraftSession.init(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = SimilarityOps.queries("s_mmr")(spark, "/root/testdata/sf0.001")
      // building the frame already ran the pool collect; the returned
      // rows are a driver-local relation
      assert(out.queryExecution.optimizedPlan.collectLeaves().forall(
        _.getClass.getSimpleName.contains("LocalRelation")),
        "mmr result must be a driver-local relation (greedy ran on the" +
          " collected pool)")
      // listener events are async; give the bus a beat to drain
      val deadline = System.nanoTime() + 5_000_000_000L
      while (jobs.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val n = jobs.get()
      // ONE pool pass — AQE stages it as up to ~4 jobs (broadcast
      // build, shuffle, final), but the count is CONSTANT in MmrSelK;
      // the r15 per-step shape launched >= 1 + MmrSelK additional
      // 1-row argmax jobs (>= 6 more)
      assert(n >= 1 && n <= 5,
        s"expected the single AQE-staged pool pass (<= 5 jobs), saw $n")
      assert(out.count() == 5)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("span-dedup width dial: a k=8 run stops flagging the natural" +
      " 3-token repetition a k=3 run flags; k=3 through the dial is" +
      " value-identical to the gate spelling") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // two docs share ONE stock 4-token phrase ("as a matter of fact")
    // inside otherwise-distinct 12-token texts: phrase-level natural
    // repetition, NOT boilerplate — no 8-token span is shared
    val docs = Seq(
      (1L, "as a matter of fact alpha bravo charlie delta echo foxtrot golf"),
      (2L, "hotel india juliet kilo as a matter of fact lima mike november"),
      (3L, "oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu"))
      .toDF("doc_id", "text")
    val c3 = DedupOps.spanCoverageFrom(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(c3(1L) > 0 && c3(2L) > 0,
      s"k=3 must flag the shared phrase in docs 1 and 2: $c3")
    assert(c3(3L) == 0)
    val c8 = DedupOps.spanCoverageFrom(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(c8.values.forall(_ == 0L),
      s"k=8 must NOT flag phrase-level repetition: $c8")
    // rewrite: k=3 strips the phrase tokens; k=8 strips nothing
    val r3 = DedupOps.spanRewriteFrom(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r3(1L) > 0 && r3(2L) > 0 && r3(3L) == 0, s"k=3 rewrite: $r3")
    val r8 = DedupOps.spanRewriteFrom(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(r8.forall(_._2 == 0L), s"k=8 rewrite must remove nothing: $r8")
    // k=8 cleaned text round-trips the original exactly
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    r8.foreach { case (id, _, cleaned) => assert(cleaned == orig(id)) }
    // dial at the gate width == the gate query spelling, value for value
    val dial3 = DedupOps.spanRewriteFrom(docs, 3).collect().toSeq
    val gateStyle = DedupOps.spanRewriteFrom(docs).collect().toSeq
    assert(dial3 == gateStyle)
    // hot-spans: width-8 shingles of these docs are all df=1 — empty
    // report at any cap; width dial plumbed through
    assert(DedupOps.hotSpansFrom(docs, 8).collect().isEmpty)
  }

  test("d_incremental_near: the manifest probe equals a from-scratch" +
      " driver-side recompute on the sf0.001 corpus (coverage, best" +
      " match incl. tie rule, containment, verdict)") {
    graft.GraftSession.init(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3)
        .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val man = docs.filter(_._1 < 400).map { case (id, t) => id -> shingles(t) }
    val batch = docs.filter(_._1 >= 400)
      .map { case (id, t) => id -> shingles(t) }
    // capped manifest: shingle -> manifest doc ids, hot shingles dropped
    val cap = DedupOps.DefaultMaxDf
    val manIdx = man.toSeq.flatMap { case (id, shs) => shs.map(_ -> id) }
      .groupBy(_._1).collect {
        case (sh, xs) if xs.size <= cap => sh -> xs.map(_._2).toSet
      }
    val expected = batch.collect { case (id, shs) if shs.nonEmpty =>
      val hits = shs.filter(manIdx.contains)
      val inters = hits.toSeq.flatMap(sh => manIdx(sh)).groupBy(identity)
        .map { case (m, xs) => m -> xs.size.toLong }
      val best = if (inters.isEmpty) None
        else Some(inters.toSeq.minBy { case (m, i) => (-i, m) })
      val inter = best.map(_._2).getOrElse(0L)
      id -> ((shs.size.toLong, hits.size.toLong, best.map(_._1), inter,
        inter.toDouble / shs.size, inter.toDouble / shs.size >= 0.9))
    }
    val got = DedupOps.queries("d_incremental_near")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length == expected.size, s"${got.length} vs ${expected.size}")
    got.foreach { r =>
      val id = r.getLong(0)
      val (nSpans, hitSpans, bestM, inter, cont, near) = expected(id)
      assert(r.getLong(1) == nSpans, s"n_spans @ $id")
      assert(r.getLong(2) == hitSpans, s"hit_spans @ $id")
      assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == bestM,
        s"best_match @ $id")
      assert(r.getLong(5) == inter, s"inter @ $id")
      assert(r.getDouble(6) == cont, s"containment @ $id")
      assert(r.getBoolean(7) == near, s"is_near_dup @ $id")
    }
    // the fixture must actually exercise both verdicts
    assert(got.exists(_.getBoolean(7)) && got.exists(!_.getBoolean(7)),
      "corpus split exercises only one verdict — fixture degenerate")
    // the df cap (never hit by the 400-doc gate manifests): a shingle
    // hot across > maxDf history docs is dropped from the manifest —
    // boilerplate carries no near-dup signal, the pairCounts rule
    import spark.implicits._
    val hist = Seq(
      (0L, "common header line alpha bravo charlie delta"),
      (1L, "common header line echo foxtrot golf hotel"),
      (2L, "common header line india juliet kilo lima"))
      .toDF("doc_id", "text")
    val nb = Seq(
      (400L, "common header line alpha bravo charlie delta"))
      .toDF("doc_id", "text")
    val capped = DedupOps.incrementalNearFrom(hist, nb, maxDf = 2).collect()
    assert(capped.length == 1)
    // "common header line" (df=3 > 2) is dropped; the doc still matches
    // doc 0 on its remaining unique spans
    val row = capped(0)
    assert(row.getLong(1) == 5, "5 distinct shingles in the batch doc")
    assert(row.getLong(2) == 4,
      "the capped boilerplate shingle must not count as history coverage")
    assert(row.getLong(4) == 0L && row.getLong(5) == 4)
    val uncapped = DedupOps.incrementalNearFrom(hist, nb, maxDf = 20).collect()
    assert(uncapped(0).getLong(2) == 5 && uncapped(0).getLong(5) == 5,
      "without the cap the boilerplate shingle counts")
  }

  test("cell-blocked embedding near-dup (the scale path): identical" +
      " vectors land in one cell and cluster together; the auto pair" +
      " relation matches the brute-force in-cell model") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 600 random vectors + 3 planted copies of vector 0 → auto K=8
    val base = Seq.tabulate(600)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val emb = (base ++ Seq(600L, 601L, 602L).map(id => (id, base(0)._2)))
      .toDF("vec_id", "embedding")
    val pairs = DedupOps.nearDupPairsCells(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors: same kernel argmin cell, cosine exactly 1.0
    for (p <- Seq((0L, 600L), (0L, 601L), (0L, 602L), (600L, 601L)))
      assert(pairs.contains(p), s"planted duplicate pair $p missing")
    val clusters = DedupOps.embeddingClustersAuto(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(600L, 601L, 602L).forall(id =>
      clusters.get(id) == clusters.get(0L)),
      "planted copies must share vector 0's cluster")
  }

  test("pq_argmin2: bit-equal to the row_number-=-2 chain over the" +
      " scored cells on random vectors; fail-loud on a 1-codeword" +
      " codebook; probe-2 recall dominates probe-1") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = Seq.tabulate(300)(i =>
        (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    // a small 4-codeword book over subDim=8, written both ways
    val cents = Seq.tabulate(4)(j => Seq.tabulate(8)(i => (j * 17 + i * 7) % 13 - 6))
    def dlit(d: Double) = { val s = d.toString; if (s.contains("E")) s else s + "D" }
    val flat = cents.flatMap { c =>
      val nrm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      0.0 +: c.map(x => x.toDouble / (2.0 * nrm))
    }.map(dlit).mkString(", ")
    val chain = (0 until 4).map { j =>
      val comps = cents(j).map(c => {
        val nrm = math.sqrt(cents(j).map(x => x.toDouble * x.toDouble).sum)
        dlit(c.toDouble / (2.0 * nrm))
      }).mkString(", ")
      s"named_struct('d', 0.0D - 2.0D * vec_dot(embedding, array($comps)), 'j', ${j}L)"
    }.mkString(", ")
    val rows = emb.select(
      expr(s"pq_argmin2(embedding, array($flat), 0, 8)").as("kern"),
      expr(s"array_sort(array($chain))[1].j").as("second")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"pq_argmin2 drifted from the sorted-chain second: $r"))
    // 1-codeword book: fail-loud, both representations
    val thrown = intercept[Throwable] {
      emb.select(expr(
        "pq_argmin2(embedding, array(0.5D, 1D,1D,1D,1D,1D,1D,1D,1D), 0, 8)"))
        .collect()
    }
    assert(rootCause(thrown).getMessage.contains(">= 2"))
    // recall dominance: probe-2 catches at least probe-1 at both SFs
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rec = DedupOps.nearDupRecall(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rec(2L) >= rec(1L),
        s"probe-2 must dominate probe-1 at $sf: $rec")
    }
  }

  test("audio stream arms: maxDf above Int.MaxValue (or non-positive)" +
      " is rejected at the API boundary, not wrapped negative into the" +
      " postings cap") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val dummy = Seq((1L, Array[Byte]())).toDF("doc_id", "media")
    for (bad <- Seq(Int.MaxValue.toLong + 1, 0L, -4L)) {
      val e1 = intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.audioPairStream(dummy, maxDf = bad)
      }
      assert(e1.getMessage.contains("maxDf"))
      val e2 = intercept[IllegalArgumentException] {
        graft.streaming.StreamOps.audioPairStreamTtl(dummy, ttlMs = 1000L,
          maxDf = bad)
      }
      assert(e2.getMessage.contains("maxDf"))
    }
  }
}
