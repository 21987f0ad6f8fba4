package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 operator invariants: constructed-fixture contracts the gate
  * corpus can't reach, plus the round's codegen-stays-on pin. */
class R15InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s_pq_recon: whole-stage codegen compiles (fallback=false) — the" +
      " r14 OOD dump's Janino 64KB fallback stays fixed") {
    graft.GraftSession.init(spark)
    // spark.sql.codegen.fallback=false turns the silent
    // interpreted-mode fallback (WARN + 10x interpreted hot loop at
    // scale) into a hard failure: the old single-Generate shape —
    // 2·M·K inlined vec_dot named_structs in one generated method —
    // dies here with "Code grows beyond 64 KB"; the r15 two-step
    // projection must compile clean.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = SimilarityOps.queries("s_pq_recon")(spark, sf).collect()
      assert(rows.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("vec_qfloor: bit-equal to the SQL transform chain (float and" +
      " double elements)") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vecGen = Gen.listOfN(8, Gen.oneOf(
      Gen.choose(-10f, 10f), Gen.const(0f), Gen.const(-0f),
      Gen.choose(-1e-4f, 1e-4f)))
    val prop = Prop.forAll(Gen.listOfN(12, vecGen)) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      def runPair(quant: String, ref: String) = {
        val got = df.select(col("id"), expr(quant).as("q"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val want = df.select(col("id"), expr(ref).as("q"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        got == want
      }
      runPair("vec_qfloor(v, CAST(1000 AS DOUBLE))",
          "transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))") && {
        // double-element arm through an explicit cast of the column
        val dd = df.select(col("id"),
          expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
        val got = dd.select(col("id"),
            expr("vec_qfloor(v, CAST(1000 AS DOUBLE))").as("q"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val want = dd.select(col("id"),
            expr("transform(v, x -> CAST(floor(x * 1000) AS BIGINT))").as("q"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        got == want
      }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("vec_qdot: bit-equal to the aggregate(zip_with(transform)) chain;" +
      " length mismatch raises loudly") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vecGen = Gen.listOfN(8, Gen.choose(-10f, 10f))
    val wGen = Gen.listOfN(8, Gen.choose(-1024L, 1024L))
    val prop = Prop.forAll(Gen.listOfN(6, Gen.zip(vecGen, wGen))) { vws =>
      val df = vws.zipWithIndex.map { case ((v, w), i) => (i.toLong, v, w) }
        .toDF("id", "v", "w")
      val got = df.select(col("id"),
          expr("vec_qdot(v, CAST(1000 AS DOUBLE), w)").as("p"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.select(col("id"),
          expr("""aggregate(zip_with(
              transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
              w, (a, b) -> a * b), 0L, (acc, t) -> acc + t)""").as("p"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)

    val e = intercept[Exception] {
      Seq((Seq(1f, 2f), Seq(1L))).toDF("v", "w")
        .select(expr("vec_qdot(v, CAST(1000 AS DOUBLE), w)")).collect()
    }
    assert(e.getMessage != null &&
      org.apache.commons.lang3.exception.ExceptionUtils.getRootCause(e)
        .getMessage.contains("length mismatch"))
  }

  test("s_pca_project2: axis-aligned masses read exact plane coordinates;" +
      " a rank-1 corpus reads PC2 = 0; an empty corpus reads the schema") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // 4 vectors of mass on dim0 (q = 400), 2 on dim1 (q = 100):
    // G = diag(4·400², 2·100²) = diag(640000, 20000). Hand-replay of the
    // 3 fixed-point iterations: x ends EXACTLY (1024, 0, …) — dim1 decays
    // 1024 → 32 → 1 → 0 under the truncating renormalization. Deflation:
    // den = 1024², num = den·640000 ⇒ H[0][0] = den²·640000 − num·den = 0
    // exactly and H[1][1] = den²·20000, so PC2 is EXACTLY e1 after one
    // iteration. proj1_fp = 400·1024 on the dim0 mass, proj2_fp =
    // 100·1024 on the dim1 mass, zero cross-terms.
    def vec(d: Int, v: Float) =
      (0 until 64).map(i => if (i == d) v else 0f)
    val emb = (0L until 4L).map(i => (i, vec(0, 0.4f))) ++
      (4L until 6L).map(i => (i, vec(1, 0.1f)))
    val got = SimilarityOps.pcaProject2From(emb.toDF("vec_id", "embedding"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    (0L until 4L).foreach(i =>
      assert(got(i) == ((409600L, 0L, 0.4, 0.0)), s"$i: ${got(i)}"))
    (4L until 6L).foreach(i =>
      assert(got(i) == ((0L, 102400L, 0.0, 0.1)), s"$i: ${got(i)}"))

    // rank-1: every vector along dim0 — H deflates to all zeros; the
    // greatest(m, 1) guard must read PC2 = 0⃗ (proj2 exactly 0), not an
    // engine-specific division error
    val r1 = SimilarityOps.pcaProject2From(
        (0L until 3L).map(i => (i, vec(0, 0.4f))).toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(r1.forall(t => t._1 == 409600L && t._2 == 0L && t._3 == 0.0),
      r1.mkString(", "))

    val empty = SimilarityOps.pcaProject2From(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"))
    assert(empty.columns.toSeq ==
      Seq("vec_id", "proj1_fp", "proj2_fp", "proj1", "proj2"))
    assert(empty.count() == 0)
  }

  test("v_value_drift: a single-day type reads drift = false (not NULL)" +
      " and a negative value bins to 0, not an unbounded negative id") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val rows = Seq(
      // one-day span: post half empty -> frac_only_post NULL via
      // try_divide. Here frac_only_pre = 1.0 so 3VL already reads true
      // (true OR NULL = true) — the assertion is that drift is a
      // non-NULL BOOLEAN (getBoolean throws on NULL), pinning the
      // coalesce for any consumer filtering WHERE NOT drift
      ("one", "2024-01-01 09:00:00", 10.0),
      ("one", "2024-01-01 10:00:00", 60.0),
      // negative values: both land in bin 0 alongside 10.0 — identical
      // halves, PSI exactly 0, no single-half mass
      ("neg", "2024-01-01 09:00:00", -312.5),
      ("neg", "2024-01-01 10:00:00", 10.0),
      ("neg", "2024-01-02 09:00:00", -0.01),
      ("neg", "2024-01-02 10:00:00", 10.0))
    val got = ValidationOps.valueDriftFrom(
        rows.toDF("event_type", "tss", "value")
          .select(col("event_type"), col("tss").cast("timestamp").as("ts"),
            col("value")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(5)) null else r.getDouble(5), r.getBoolean(6))))
      .toMap
    // the whole span is one day -> every row is "pre", n_post = 0,
    // frac_only_pre = 1.0 -> drift true AND non-NULL
    assert(got("one") == ((2L, 0L, 0.0, null, true)), got("one").toString)
    // identical halves because -312.5 and -0.01 both bottom-cap to bin 0
    val (nPre, nPost, psi, fop, drift) = got("neg")
    assert(nPre == 2L && nPost == 2L && psi == 0.0 &&
      fop == 0.0 && !drift, got("neg").toString)
  }

  test("pq_argmin: bit-equal to the array_min(named_struct(vec_dot(" +
      "slice))) chain on random vectors; duplicate codewords tie to the" +
      " lowest code") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val cents = SimilarityOps.pqCents
    val scale = SimilarityOps.PqScale
    val m = cents.length; val k = cents(0).length; val sub = cents(0)(0).length
    val rnd = new scala.util.Random(42)
    val emb = Seq.tabulate(500)(i =>
        (i.toLong, Seq.fill(m * sub)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    def dlit(d: Double) = { val s = d.toString; if (s.contains("E")) s else s + "D" }
    val cols = (0 until m).flatMap { mm =>
      val chain = (0 until k).map { j =>
        val comps = cents(mm)(j)
          .map(c => s"CAST($c AS DOUBLE) / $scale.0D").mkString(", ")
        val nsq = cents(mm)(j).map(x => x * x).sum
        s"""named_struct('dist',
              CAST($nsq AS DOUBLE) / ${scale * scale}.0D
                - 2.0D * vec_dot(slice(embedding, ${mm * sub + 1}, $sub),
                    array($comps)),
            'code', ${j}L)"""
      }.mkString(", ")
      val flat = (0 until k).flatMap { j =>
        (cents(mm)(j).map(x => x * x).sum.toDouble / (scale * scale).toDouble) +:
          cents(mm)(j).map(c => c.toDouble / scale.toDouble)
      }.map(dlit).mkString(", ")
      Seq(expr(s"array_min(array($chain)).code").as(s"chain$mm"),
        expr(s"pq_argmin(embedding, array($flat), ${mm * sub}, $sub)")
          .as(s"kern$mm"))
    }
    emb.select(cols: _*).collect().foreach { r =>
      (0 until m).foreach { mm =>
        assert(r.getAs[Long](s"chain$mm") == r.getAs[Long](s"kern$mm"),
          s"subspace $mm drifted: chain=${r.getAs[Long](s"chain$mm")} " +
            s"kern=${r.getAs[Long](s"kern$mm")}")
      }
    }
    // duplicate codewords (identical dist) must tie to the LOWEST code —
    // array_min's lexicographic (dist, code) order, strict-< in the kernel
    val tie = Seq((1L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
      .select(expr(
        "pq_argmin(embedding, array(0.5D, 0.25D, -0.125D," +
          " 0.5D, 0.25D, -0.125D, 9.0D, 0.0D, 0.0D), 0, 2)").as("code"))
      .collect()(0).getLong(0)
    assert(tie == 0L, s"tie broke to $tie, not the lowest code")
  }

  test("s_centroid_classify: axis-aligned classes read exact accuracy;" +
      " the equidistant vector ties to the smallest label; empty corpus" +
      " reads the contract schema") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    def axis(d: Int, scale: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == d) scale else 0f)
    def mix(s0: Float, s1: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == 0) s0 else if (i == 1) s1 else 0f)
    // mirror-symmetric classes: c0 = mean{e0, e0, m}, c1 = mean{e1, e1, m}
    // with m = 0.5e0 + 0.5e1, so the two m vectors sit EXACTLY equidistant
    // from both centroids (the same two squared terms, swapped) -> both
    // tie -> both predict label 0: a hit for class 0, a miss for class 1
    val emb = Seq(
      (1L, 0, axis(0, 1f)), (2L, 0, axis(0, 1f)), (3L, 0, mix(0.5f, 0.5f)),
      (4L, 1, axis(1, 1f)), (5L, 1, axis(1, 1f)), (6L, 1, mix(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val got = SimilarityOps.centroidClassifyFrom(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((3L, 3L, 1.0)), got(0L).toString)
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0)), got(1L).toString)
    val empty = SimilarityOps.centroidClassifyFrom(
      Seq.empty[(Long, Int, Seq[Float])].toDF("vec_id", "label", "embedding"))
    assert(empty.columns.toSeq ==
      Seq("label", "n_vecs", "n_correct", "accuracy") && empty.count() == 0L)
  }
}
