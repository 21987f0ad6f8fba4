package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 operator invariants: constructed-fixture contracts the gate
  * corpus can't reach. */
class R14InvariantSpec extends SparkSpec {

  test("m_byte_entropy: post-agg envelope guard raises in-plan (decimal" +
      " ledger holds the sum exactly, so the raise precedes any narrow)") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // Two 1e17-count bins: sum(n)·ln(max n)·1e9 ≈ 7.8e27 ≫ 1e18. The
    // BIGINT ledger WOULD have wrapped mid-sum pre-r14; the exact-wide
    // DECIMAL(38,0) sum holds ~7.8e18 losslessly and the post-agg guard
    // fires with this op's message, not ANSI's generic overflow.
    val hist = Seq((1L, 0, 100000000000000000L),
      (1L, 1, 100000000000000000L)).toDF("doc_id", "bin", "n")
    val e = intercept[Exception] {
      MultimodalOps.byteEntropyFrom(hist).collect()
    }
    assert(e.getMessage.contains("m_byte_entropy: entropy ledger exceeds" +
      " the BIGINT envelope"), e.getMessage)
  }

  test("e_did: a planted post-period lift on one type reads the" +
      " hand-computed DiD; the flat control reads the mirrored -DiD") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // span 2024-01-01..04 → mid = day 2: pre = {01,02}, post = {03,04},
    // 2 days each. t: 1/day pre, 4/day post (own +3); c: 2/day flat.
    val rows =
      Seq("2024-01-01" -> 1, "2024-01-02" -> 1,
        "2024-01-03" -> 4, "2024-01-04" -> 4)
        .flatMap { case (d, k) => Seq.fill(k)(("t", s"$d 10:00:00")) } ++
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
        .flatMap(d => Seq.fill(2)(("c", s"$d 11:00:00")))
    val got = EventOps.didFrom(rows.toDF("event_type", "tss")
        .select(col("event_type"), col("tss").cast("timestamp").as("ts")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("t") == ((2L, 8L, 3.0, 0.0, 3.0)), got("t").toString)
    assert(got("c") == ((4L, 4L, 0.0, 3.0, -3.0)), got("c").toString)
  }

  test("v_value_drift: identical halves read PSI exactly 0; a full bin" +
      " swap reads pure single-half mass; a partial shift reads the" +
      " hand-computed (2/3)ln2") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    def ev(t: String, d: String, vs: Double*) =
      vs.map(v => (t, s"2024-01-0$d 09:00:00", v))
    val rows =
      ev("a", "1", 10.0, 60.0) ++ ev("a", "2", 10.0, 60.0) ++   // identical
      ev("b", "1", 10.0, 10.0) ++ ev("b", "2", 60.0, 60.0) ++   // disjoint
      ev("s", "1", 10.0, 10.0, 60.0) ++ ev("s", "2", 10.0, 60.0, 60.0)
    val got = ValidationOps.valueDriftFrom(
        rows.toDF("event_type", "tss", "value")
          .select(col("event_type"), col("tss").cast("timestamp").as("ts"),
            col("value")))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got("a") == ((0.0, 0.0, 0.0, false)), got("a").toString)
    val (pb, fb1, fb2, db) = got("b")
    assert(pb == 0.0 && fb1 == 1.0 && fb2 == 1.0 && db, got("b").toString)
    val (ps, fs1, fs2, ds) = got("s")
    assert(math.abs(ps - 2.0 / 3.0 * math.log(2.0)) < 1e-6 &&
      fs1 == 0.0 && fs2 == 0.0 && ds, got("s").toString)
  }

  test("s_hubness: a shared-top cell reads in-deg 7 hubs, the unchosen" +
      " tail reads antihubs, and a cell-isolated vector reads antihub") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // eight positive powers-of-two multiples of e0 share one IVF cell
    // with ALL pairwise cosines exactly 1.0 → every top-3 tiebreaks to
    // the 3 smallest other ids: ids 0,1,2 are listed by 7 vectors each
    // (hubs at the >= 6 bar), id 3 by 3, ids 4..7 by none (antihubs).
    def e0(scale: Float) = (scale +: Seq.fill(63)(0f)).toSeq
    val emb = (0 until 8).map(i => (i.toLong, e0((1 << i).toFloat))) :+
      ((99L, e0(-16f)))
    val got = SimilarityOps.hubnessFrom(emb.toDF("vec_id", "embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    (0L to 2L).foreach(i =>
      assert(got(i) == ((7L, true, false)), s"$i: ${got(i)}"))
    assert(got(3L) == ((3L, false, false)), got(3L).toString)
    (4L to 7L).foreach(i =>
      assert(got(i) == ((0L, false, true)), s"$i: ${got(i)}"))
    assert(got(99L) == ((0L, false, true)), got(99L).toString)
  }

  test("m_audio_fprint: an offset copy matches on its interior landmark" +
      " structure; a different clip doesn't; a corpus-wide boilerplate" +
      " landmark is capped away") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // ramp baselines prevent plateau peaks; A's peaks (wins 2,5,9) and
    // B's (9,12,16) share bands (6,8,10) and gaps (3,4) → 2 shared fps
    val ramp = Seq(10L, 11L, 100L, 12L, 13L, 400L, 14L, 15L, 16L, 1600L, 17L)
    def doc(id: Long, off: Int, es: Seq[Long]) =
      es.zipWithIndex.map { case (e, i) => (id, i + off, e) }
    val rows = doc(1L, 0, ramp) ++ doc(2L, 7, ramp) ++
      doc(3L, 0, Seq(10L, 11L, 200L, 12L, 800L, 13L)) ++
      // 40 identical clips: their shared landmark's df = 40 > cap 32
      (100L until 140L).flatMap(id =>
        doc(id, 0, Seq(10L, 11L, 33L, 12L, 130L, 13L)))
    val got = MultimodalOps.audioFprintFrom(
        rows.toDF("doc_id", "win", "energy")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L)), got.mkString(", "))
  }

  test("s_pca_project: axis-aligned vectors read their exact coordinate" +
      " as the projection; empty corpus reads the contract schema") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    def e0(scale: Float) = (scale +: Seq.fill(63)(0f)).toSeq
    val emb = Seq((1L, e0(1f)), (2L, e0(2f)), (3L, e0(-3f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.pcaProjectFrom(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // component converges to ±e0 with loading_fp ±1024; the Gramian is
    // all-positive here so the iterate stays positive
    assert(got(1L) == ((1024000L, 1.0)), got(1L).toString)
    assert(got(2L) == ((2048000L, 2.0)), got(2L).toString)
    assert(got(3L) == ((-3072000L, -3.0)), got(3L).toString)
    val empty = SimilarityOps.pcaProjectFrom(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"))
    assert(empty.columns.toSeq == Seq("vec_id", "proj_fp", "proj") &&
      empty.count() == 0L)
  }

  test("t_auc: a single-class corpus reads NULL AUC (the try_divide" +
      " contract — DuckDB's native x/0), not a DIVIDE_BY_ZERO crash") {
    graft.GraftSession.init(spark)
    // Found by the r14 full-gate 10x open-mode run: a corpus whose gate
    // verdict is single-class (here: only keepers survive gateKept) has
    // no negatives, AUC is undefined, and the pre-fix division raised.
    val dir = java.nio.file.Files.createTempDirectory("graft_auc_1class")
    CorpusOps.gateKept(
        graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusOps.nbAuc(spark, dir.toString).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) > 0L && r(0).getLong(1) == 0L,
      s"fixture must be single-class: ${r(0)}")
    assert(r(0).isNullAt(2), s"AUC must be NULL, got ${r(0)}")
  }

  test("m_byte_entropy: just-inside-envelope two-bin blob computes ln 2" +
      " (guard does not overfire at the boundary scale)") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // sum(n)=2e7, lmax=ln(1e7)≈16.1 → product 3.2e17 ≤ 1e18: computes.
    val hist = Seq((1L, 0, 10000000L), (1L, 1, 10000000L))
      .toDF("doc_id", "bin", "n")
    val r = MultimodalOps.byteEntropyFrom(hist).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 20000000L)
    assert(math.abs(r(0).getDouble(2) - math.log(2.0)) < 1e-6,
      r(0).getDouble(2).toString)
    assert(!r(0).getBoolean(3))
  }
}
