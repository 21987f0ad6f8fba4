package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 operator invariants: constructed-fixture contracts the gate
  * corpus can't reach. */
class R12InvariantSpec extends SparkSpec {

  test("t_rouge_pairs: identical pair reads recall ≡ 1 and F1 ≡ 1 at both" +
      " gram orders") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "a b c a"))
      .toDF("doc_id", "text")
    val prs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val r = TextOps.rougePairsFrom(prs, docs).collect()(0)
    assert(r.getAs[Double]("rouge1_recall") == 1.0)
    assert(r.getAs[Double]("rouge2_recall") == 1.0)
    assert(r.getAs[Double]("rouge1_f1") == 1.0)
    assert(r.getAs[Double]("rouge2_f1") == 1.0)
    assert(r.getAs[Long]("hyp_len") == 4L && r.getAs[Long]("ref_len") == 4L)
  }

  test("t_rouge_pairs: snippet asymmetry — a fragment of B scores full" +
      " BLEU-side precision but low ROUGE recall") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // A = first 2 tokens of B (B is 8 tokens): every A-gram is in B, so
    // clipped precision is perfect, but A covers only 2/8 unigrams and
    // 1/7 bigrams of the reference.
    val docs = Seq((1L, "a b"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val prs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val r = TextOps.rougePairsFrom(prs, docs).collect()(0)
    assert(r.getAs[Double]("rouge1_recall") == 2.0 / 8.0)
    assert(r.getAs[Double]("rouge2_recall") == 1.0 / 7.0)
    // and the BLEU side of the same base sees perfect clipped precision
    // (log p = 0) pulled down only by the brevity penalty
    val b = TextOps.bleuPairsFrom(prs, docs).collect()(0)
    assert(b.getAs[Long]("clip1") == 2L && b.getAs[Long]("tot1") == 2L)
    assert(b.getAs[Double]("log_bleu2") == 1.0 - 8.0 / 2.0,
      b.getAs[Double]("log_bleu2").toString)
  }

  test("t_rouge_pairs: 1-token reference reads ROUGE-2 NULL, disjoint" +
      " pair reads recall ≡ 0") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val prs = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val got = TextOps.rougePairsFrom(prs, docs).collect()
    val one = got.find(_.getLong(1) == 2L).get
    assert(one.isNullAt(one.fieldIndex("rouge2_recall")),
      "1-token reference must read ROUGE-2 NULL")
    assert(one.getAs[Double]("rouge1_recall") == 1.0)
    val disj = got.find(_.getLong(1) == 3L).get
    assert(disj.getAs[Double]("rouge1_recall") == 0.0)
    assert(disj.getAs[Double]("rouge2_recall") == 0.0)
    assert(disj.getAs[Double]("rouge1_f1") == 0.0)
  }

  test("s_sq8_recall: property — distributed audit equals a sequential" +
      " model, including int8 rounding flips") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Reference model: the exact arithmetic contract — unit-normalize,
    // floor(127·x) codes, integer code dot vs sequential-fold cosine,
    // (score DESC, vec_id) top-5, per-query hit count. Both sides use
    // sequential left-to-right double folds, so equality is exact.
    def model(vs: Seq[(Long, Seq[Float])]): Map[Long, (Long, Long)] = {
      def nrm(v: Seq[Float]) =
        math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      val coded = vs.flatMap { case (id, v) =>
        val n = nrm(v)
        if (n == 0) None
        else Some((id, v, v.map(x => math.floor(127.0 * (x.toDouble / n)))))
      }
      def cos(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble) /
          (nrm(a) * nrm(b))
      def dotq(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)
      val qs = coded.filter(_._1 < 5)
      qs.map { case (qid, qv, qq) =>
        val cands = coded.filter(_._1 != qid)
        def top5(score: ((Long, Seq[Float], Seq[Double])) => Double) =
          cands.map(c => (c._1, score(c)))
            .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
        val ex = top5(c => cos(qv, c._2))
        val ap = top5(c => dotq(qq, c._3))
        qid -> (ex.size.toLong, (ap & ex).size.toLong)
      }.toMap
    }
    val vecGen = for {
      n <- Gen.choose(8, 22)
      vs <- Gen.listOfN(n, Gen.listOfN(6,
        Gen.choose(-1000, 1000).map(_ / 1000.0f)))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val prop = Prop.forAll(vecGen) { vs =>
      val m = model(vs)
      val got = SimilarityOps
        .sq8RecallFrom(vs.toDF("vec_id", "embedding"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == m
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("s_sq8_recall: well-separated lattice directions read recall ≡ 1") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // candidates at widely separated angles in the (d0, d1) plane:
    // int8 quantization perturbs each coordinate by < 1/127 ≈ 0.008,
    // far below the cosine gaps, so the quantized order equals the
    // exact order and every query reads recall 1.
    val dirs = Seq(0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.4)
    val vecs = dirs.zipWithIndex.map { case (th, i) =>
      (i.toLong,
        Seq(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f, 0f, 0f))
    }
    val got = SimilarityOps.sq8RecallFrom(vecs.toDF("vec_id", "embedding"))
      .collect()
    assert(got.length == 5)
    assert(got.forall(_.getAs[Double]("recall_at5") == 1.0),
      got.mkString(","))
  }

  /** (event_type, day-offset, events-that-day) feed — the hwFeed shape
    * from R11ExtendSpec. */
  private def piFeed(rows: Seq[(String, Int, Int)]) = {
    import spark.implicits._
    rows.flatMap { case (t, off, k) => Seq.fill(k)((t, off)) }
      .toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
  }

  test("e_forecast_pi: constant series collapses the interval to a point" +
      " with coverage 1") {
    graft.GraftSession.init(spark)
    // HW forecasts a constant series exactly (R11 spec), so every
    // walk-forward error is 0, q90 is 0, and the interval is [y, y].
    val got = EventOps.forecastPiFrom(
      piFeed((0 until 20).map(d => ("c", d, 3)))).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(1) == 19L, r.toString)        // 19 calibration days
    assert(r.getDouble(2) == 3.0, r.toString)      // forecast
    assert(r.getDouble(3) == 0.0, r.toString)      // q90_err
    assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 3.0, r.toString)
    assert(r.getDouble(6) == 1.0, r.toString)      // coverage
  }

  test("e_forecast_pi: replays the sequential dyadic HW model + a Scala" +
      " discrete quantile on a random series") {
    graft.GraftSession.init(spark)
    // independent model: the R11ExtendSpec exact-dyadic recurrence gives
    // hw_next per day; the walk-forward errors, q90 pick (smallest err
    // with 10·cum ≥ 9·n) and coverage are then plain Scala.
    case class D(n: BigInt, k: Int)
    def norm(d: D): D =
      if (d.n == 0) D(BigInt(0), 0)
      else { var n = d.n; var k = d.k
        while (k > 0 && !n.testBit(0)) { n >>= 1; k -= 1 }; D(n, k) }
    def add(a: D, b: D): D = {
      val k = a.k max b.k
      norm(D((a.n << (k - a.k)) + (b.n << (k - b.k)), k))
    }
    def half(a: D): D = norm(D(a.n, a.k + 1))
    def neg(a: D): D = D(-a.n, a.k)
    def toDouble(a: D): Double = a.n.toDouble / math.pow(2.0, a.k.toDouble)
    val rnd = new scala.util.Random(2212)
    val series = (0 until 25).map(d =>
      if (d == 5 || d == 17) 0 else 1 + rnd.nextInt(40))
    def hwNext(upTo: Int): Double = {
      val w = series.slice(math.max(0, upTo - 13), upTo + 1)
      var l = D(BigInt(w.head), 0); var b = D(BigInt(0), 0)
      val s = scala.collection.mutable.ArrayBuffer(D(BigInt(0), 0))
      for (t <- 2 to w.length) {
        val sPrev = if (t - 7 >= 1) s(t - 7 - 1) else D(BigInt(0), 0)
        val y = D(BigInt(w(t - 1)), 0)
        val lNew = half(add(add(y, neg(sPrev)), add(l, b)))
        val bNew = half(add(add(lNew, neg(l)), b))
        s += half(add(add(y, neg(lNew)), sPrev))
        l = lNew; b = bNew
      }
      val sNext = if (w.length + 1 - 7 >= 1) s(w.length + 1 - 7 - 1)
        else D(BigInt(0), 0)
      toDouble(add(add(l, b), sNext))
    }
    val errs = (1 until 25).map(d =>
      math.round(math.abs(series(d).toDouble - hwNext(d - 1)) * 1.0e6))
    val n = errs.length
    val sortedE = errs.sorted
    val q90 = sortedE.find(e => sortedE.count(_ <= e) * 10 >= n * 9).get
    val coverage = sortedE.count(_ <= q90).toDouble / n
    val forecast = hwNext(24)
    val got = EventOps.forecastPiFrom(
      piFeed(series.zipWithIndex.collect {
        case (k, d) if k > 0 => ("r", d, k)
      })).collect()(0)
    assert(got.getLong(1) == n.toLong, got.toString)
    assert(got.getDouble(2) == forecast, got.toString)
    assert(got.getDouble(3) == q90 / 1.0e6, got.toString)
    assert(got.getDouble(4) == forecast - q90 / 1.0e6, got.toString)
    assert(got.getDouble(5) == forecast + q90 / 1.0e6, got.toString)
    assert(got.getDouble(6) == coverage, got.toString)
    assert(coverage >= 0.9, coverage.toString) // the conformal guarantee
  }

  test("t_ngram_coverage: full-copy halves read 1.0, disjoint 0.0, a" +
      " partial overlap reads the exact fraction") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // ids 0..9 → midpoint rule doc_id*2 <= 9 puts 0..4 in the train half
    val docs = Seq(
      (0L, "x", "a b c d e"), (9L, "x", "a b c d e"),        // copy → 1.0
      (1L, "y", "p q r s"), (8L, "y", "u v w zz"),           // disjoint → 0
      (2L, "z", "a b c d"), (7L, "z", "a b c d x"))          // 2 of 3
      .toDF("doc_id", "lang", "text")
    val got = TextOps.ngramCoverageFrom(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("x") == ((3L, 3L, 1.0)), got.toString)
    assert(got("y") == ((2L, 0L, 0.0)), got.toString)
    assert(got("z") == ((3L, 2L, 2.0 / 3.0)), got.toString)
  }

  test("s_knn_density: same-direction vectors read cos_kth ≡ 1, a" +
      " cell-isolated vector reads 0 neighbors / NULL") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // five positive multiples of e0 (powers of two → cosines are
    // EXACTLY 1.0 in IEEE) share one IVF cell; -16·e0 argmaxes the
    // opposite cell and sits alone there
    def e0(scale: Float) =
      (scale +: Seq.fill(63)(0f)).toSeq
    val emb = Seq(1f, 2f, 4f, 8f, 16f).zipWithIndex
      .map { case (sc, i) => (i.toLong, e0(sc), 0) } :+
      ((99L, e0(-16f), 1))
    val got = SimilarityOps.knnDensityFrom(
        emb.toDF("vec_id", "embedding", "label")).collect()
    val byId = got.map(r => r.getLong(0) ->
      ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    (0L to 4L).foreach { i =>
      assert(byId(i) == ((3L, Some(1.0))), s"$i: ${byId(i)}")
    }
    assert(byId(99L) == ((0L, None)), byId(99L).toString)
  }

  test("e_xcorr: a one-day-shifted copy reads ρ ≡ 1 at exactly its" +
      " shift lag; constant pairs read NULL") {
    graft.GraftSession.init(spark)
    // v over days 0..13 with varied counts; c = the SAME counts one day
    // later (days 1..14). Residuals then satisfy r_v(d) = r_c(d+1)
    // exactly (same D and S), so for the pair (c, v) the lag −1
    // numerator is Σ r_c² — equal to the denominator — and ρ = 1.
    val counts = (0 until 14).map(d => 1 + (d * 7) % 5)
    val feed = piFeed(
      counts.zipWithIndex.map { case (k, d) => ("v", d, k) } ++
        counts.zipWithIndex.map { case (k, d) => ("c", d + 1, k) } ++
        (0 until 14).map(d => ("k1", d, 2)) ++
        (0 until 14).map(d => ("k2", d, 3)))
    val got = EventOps.xcorrFrom(feed).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(("c", "v", -1)) == Some(1.0), got(("c", "v", -1)).toString)
    // every other (c, v) lag is strictly below 1 in magnitude
    (-3 to 3).filter(_ != -1).foreach { l =>
      got.get(("c", "v", l)).flatten.foreach(x =>
        assert(math.abs(x) < 1.0, s"lag $l: $x"))
    }
    // constant series have zero residual mass on both sides → NULL
    assert(got(("k1", "k2", 0)).isEmpty, got(("k1", "k2", 0)).toString)
  }

  test("e_seasonal_strength: a weekly square wave reads F_S ≡ 1 with" +
      " NULL trend strength; a constant series reads both NULL") {
    graft.GraftSession.init(spark)
    // weekday 2 / weekend 10 over 6 weeks: the seasonal component
    // captures everything (quantized residuals are exactly 0 → F_S = 1);
    // the deseasonalized series is constant → Var(T+R) = 0 → F_T NULL.
    // 2024-01-01 is a Monday, so offsets 5,6 mod 7 are the weekend.
    val wave = piFeed((0 until 42).map(d =>
      ("w", d, if (d % 7 >= 5) 10 else 2)) ++
      (0 until 42).map(d => ("k", d, 4)))
    val got = EventOps.seasonalStrengthFrom(wave).collect()
      .map(r => r.getString(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("w") == ((Some(1.0), None)), got("w").toString)
    assert(got("k") == ((None, None)), got("k").toString)
  }

  test("m_byte_entropy: uniform bins read ≈ ln 16 and flag; a" +
      " single-bin blob reads ≈ 0 and doesn't") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val hist = ((0 until 16).map(b => (1L, b, 10L)) :+ ((2L, 3, 160L)))
      .toDF("doc_id", "bin", "n")
    val got = MultimodalOps.byteEntropyFrom(hist).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val (n1, h1, f1) = got(1L)
    assert(n1 == 160L && math.abs(h1 - math.log(16.0)) < 1e-6 && f1,
      got(1L).toString)
    val (n2, h2, f2) = got(2L)
    assert(n2 == 160L && math.abs(h2) < 1e-8 && !f2, got(2L).toString)
  }

  test("d_cluster_lang_mix: mixed and mono clusters pin counts, the" +
      " deterministic majority tiebreak, and the flags") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val labeled = Seq(
      (1L, 10L, "en"), (2L, 10L, "en"), (3L, 10L, "fr"),   // 2-1 mixed
      (4L, 20L, "de"), (5L, 20L, "de"),                    // mono
      (6L, 30L, "es"), (7L, 30L, "fr"))                    // 1-1 tie → es
      .toDF("doc_id", "cluster_id", "lang")
    val got = DedupOps.clusterLangMixFrom(labeled).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    assert(got(10L) == ((3L, 2L, "en", 2L, 2.0 / 3.0, true)), got(10L).toString)
    assert(got(20L) == ((2L, 1L, "de", 2L, 1.0, false)), got(20L).toString)
    // equal counts: the lang-asc tiebreak picks "es" deterministically
    assert(got(30L) == ((2L, 2L, "es", 1L, 0.5, true)), got(30L).toString)
  }

  test("d_sample_bias: counters replay a sequential model of both" +
      " sampling rules on a dup-heavy corpus") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(15), 16)
    // 120 docs in 40 groups of 3 exact copies + 60 singletons: heavy,
    // known dup structure so the id-arm undercount is visible
    val docs = (0 until 40).flatMap(g =>
      (0 until 3).map(r => ((g * 3 + r).toLong, s"group $g body text"))) ++
      (0 until 60).map(i => ((200 + i).toLong, s"solo $i body text"))
    val model = {
      val byText = docs.groupBy(_._2)
      var (nf, df, nh, dh, ni, di) = (0L, 0L, 0L, 0L, 0L, 0L)
      byText.foreach { case (t, ms) =>
        val n = ms.size.toLong
        val m = ms.count(d => h60(d._1.toString) % 100 < 10).toLong
        val inHash = h60(md5hex(t)) % 100 < 10
        nf += n; if (n >= 2) df += n
        if (inHash) { nh += n; if (n >= 2) dh += n }
        ni += m; if (m >= 2) di += m
      }
      (nf, df, nh, dh, ni, di)
    }
    val r = DedupOps.sampleBiasFrom(docs.toDF("doc_id", "text")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
      r.getLong(6), r.getLong(7)) == model, s"$r vs $model")
    // the lesson, demonstrated: hash-keyed sampling is rate-unbiased on
    // sampled groups (every sampled dup group arrives whole), while the
    // iid id-keyed sample undercounts — with groups of 3 at p=0.1 the
    // expected surviving dup mass is ~3% of members vs the true 60%
    val rateFull = r.getDouble(2)
    if (r.getLong(3) > 0) {
      val rateHash = r.getDouble(5)
      val dupGroupShareFull = 1.0  // sampled groups are whole: rate is
      // exactly dup_hash/n_hash where every group is all-in or all-out
      assert(rateHash == 0.0 || rateHash > 0.3, s"hash-arm rate $rateHash")
    }
    assert(!r.isNullAt(9) || r.getLong(1) == 0L)
    val rateId = r.getDouble(8)
    assert(rateId < rateFull, s"id-arm must undercount: $rateId vs $rateFull")
  }

  test("s_rrf_fusion: hand-computed integer scores — a both-tier" +
      " candidate outranks either tier's solo winner") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // lsh: A@1, B@2; ivf: B@1, C@2. Scores (exact floor divisions):
    //   A = 10^6 // 61            = 16393
    //   B = 10^6 // 62 + 10^6//61 = 16129 + 16393 = 32522
    //   C = 10^6 // 62            = 16129
    // fused: B, A, C — the RRF point: present-in-both beats rank-1-in-one
    val lsh = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("q_id", "vec_id", "rank_lsh")
    val ivf = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("q_id", "vec_id", "rank_ivf")
    val got = SimilarityOps.rrfFusionFrom(lsh, ivf).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq((1, 11L, 32522L), (2, 10L, 16393L),
      (3, 12L, 16129L)), got.mkString(","))
  }

  test("t_gate_by_source: per-rule failure counters replay a sequential" +
      " model of the shared gate rules") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // docs engineered per source: srcA all-pass; srcB one doc per
    // distinct failure mode (short / long-words / low-TTR / no-stops /
    // repetition); the model recomputes the five GateRules verbatim.
    val stops = Set("the", "a", "of", "and", "to", "in", "is")
    def passDoc(i: Int) =
      ((0 until 30).map(k => f"w$i%02d$k%02d") ++ Seq("the", "of"))
        .mkString(" ") // 32 toks, mean len (30*5+3+2)/32 = 4.84 ∈ [4,5]
    val docs = Seq(
      (1L, "srcA", passDoc(1)), (2L, "srcA", passDoc(2)),
      (3L, "srcB", "the of short text here"), // nt=5 < 30 → fail_len
      (4L, "srcB", ((0 until 30).map(k => f"verylongword$k%02d") ++
        Seq("the", "of")).mkString(" ")),     // mean len ≈ 13 → fail_word_len
      (5L, "srcB", (Seq.fill(30)("same") ++ Seq("the", "of"))
        .mkString(" ")),  // nd=3, 5·3 < 2·32 → fail_ttr; mc=30 → fail_rep
      (6L, "srcB", (0 until 32).map(k => f"u$k%02dxx").mkString(" ")))
        .toDF("doc_id", "source", "text")  // sh=0 → fail_stop
    def rules(text: String): Seq[Boolean] = {
      val tk = text.split(" ").toSeq
      val nt = tk.size.toLong
      val nd = tk.distinct.size.toLong
      val nc = (text.length - nt + 1)
      val sh = tk.count(stops)
      val mc = tk.groupBy(identity).values.map(_.size).max.toLong
      Seq(nt >= 30, nc >= 4 * nt && nc <= 5 * nt, 5 * nd >= 2 * nt,
        sh >= 2, 8 * mc <= nt)
    }
    val model = docs.collect().map(r => (r.getString(1), rules(r.getString(2))))
      .groupBy(_._1).map { case (src, rs) =>
        val fails = (0 until 5).map(i => rs.count(!_._2(i)).toLong)
        val pass = rs.count(_._2.forall(identity)).toLong
        src -> (rs.length.toLong, fails, pass)
      }
    val got = CorpusOps.gateBySourceFrom(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        (2 to 6).map(r.getLong), r.getLong(7))).toMap
    assert(got == model, s"$got\nvs\n$model")
    // and the fixture is non-degenerate: every rule fails somewhere
    assert(model("srcB")._2.forall(_ >= 1L), model("srcB").toString)
    assert(model("srcA")._3 == 2L)
  }

  test("pairGramBaseFrom only scans worklist endpoints: result is" +
      " invariant to corpus docs outside the pair relation") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // the r12 scale fix: gram counting must be worklist-linear, so a doc
    // with no pair edge cannot change any pair's scores (and the big
    // corpus beyond the worklist costs only the semi-join probe)
    val core = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val noise = (10L until 500L).map(i => (i, s"n$i m$i o$i"))
      .toDF("doc_id", "text")
    val prs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val small = TextOps.rougePairsFrom(prs, core).collect().toSeq
    val big = TextOps.rougePairsFrom(prs, core.union(noise)).collect().toSeq
    assert(small == big, s"$small vs $big")
  }
}
