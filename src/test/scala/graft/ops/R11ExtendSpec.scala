package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-11 extension batch invariants — the constructed-fixture
  * contracts for the eight new operators (`v_js_sources t_hapax
  * e_growth_accounting d_dup_inflation q_ntile s_spearman_mrl
  * s_triplets t_bleu_pairs`) the random gate corpus cannot reach:
  * closed-form endpoints (JS ∈ {0, ln 2}, ρ ∈ {−1, 1}, log-BLEU ≡ 0),
  * ledger identities, the envelope raise, and a full Scala-model
  * replay of the triplet miner. */
class R11ExtendSpec extends SparkSpec {

  private def js(rows: Seq[(String, String, Long)]): Map[String, Any] = {
    import spark.implicits._
    ValidationOps.jsSourcesFrom(rows.toDF("source", "tok", "a")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
  }

  test("v_js_sources: identical distributions read EXACTLY 0") {
    // both sources hold {x:2, y:3} → a·n_r == b·n_s for every token, so
    // every DetMath ln sees equal integers and every term is exactly 0;
    // shared support ⇒ zero missing mass. Bit-exact zero, not approx.
    val got = js(Seq(("s1", "x", 2L), ("s1", "y", 3L),
      ("s2", "x", 2L), ("s2", "y", 3L)))
    assert(got == Map("s1" -> 0.0, "s2" -> 0.0), got.toString)
  }

  test("v_js_sources: disjoint vocabularies read ln 2 (the JS maximum)") {
    val got = js(Seq(("s1", "x", 2L), ("s1", "y", 3L),
      ("s2", "u", 1L), ("s2", "v", 4L)))
    val ln2 = math.log(2.0)
    got.values.foreach(v =>
      assert(math.abs(v.asInstanceOf[Double] - ln2) < 1e-9, got.toString))
  }

  test("v_js_sources: single-source corpus reads NULL, not a raise") {
    val got = js(Seq(("only", "x", 2L), ("only", "y", 3L)))
    assert(got == Map("only" -> null), got.toString)
  }

  test("v_js_sources: BIGINT-envelope guard raises in-plan") {
    // counts land directly in the core, so the 2^30 total-token ceiling
    // is driven with TWO rows — no giant fixture
    val e = intercept[Exception] {
      js(Seq(("s1", "x", 1L << 30), ("s2", "x", 1L << 30)))
    }
    assert(e.getMessage != null && e.getMessage.contains("v_js_sources"),
      e.getMessage)
  }

  // ---- t_hapax ----

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hapax").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("t_hapax: hand-counted singleton/doubleton ledger per lang") {
    graft.GraftSession.init(spark)
    // xx: tokens a a b  → vocab {a:2, b:1}: hapax=1 (b), dis=1 (a)
    // yy: tokens c d c d e → vocab {c:2, d:2, e:1}: hapax=1, dis=2
    val dir = docsDir(Seq(
      (0L, "a a b", "xx", "s"), (1L, "c d c d e", "yy", "s")))
    val got = TextOps.hapax(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("xx") == ((3L, 2L, 1L, 1L, 0.5, 1.0 / 3.0)), got.toString)
    assert(got("yy") == ((5L, 3L, 1L, 2L, 1.0 / 3.0, 0.2)), got.toString)
  }

  // ---- e_growth_accounting ----

  /** (user, week-offset) actives → the (user_id, ts) feed. */
  private def weeks(rows: Seq[(Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "wkoff")
      .select(col("user_id"),
        expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,wkoff,0)")
          .as("ts"))
  }

  test("e_growth_accounting: hand-traced new/retained/resurrected/churned") {
    // u1 active weeks 0,1,3; u2 weeks 0,2; u3 week 2 only.
    // w0: new={u1,u2}; w1: retained={u1}, churned=active(w0)−retained=1
    // w2: resurrected={u2}, new={u3}, churned=active(w1)−0=1
    // w3: retained(lag=w2? u1's lag is w1 → resurrected), churned=2−0=2
    val got = EventOps.growthAccountingFrom(
      weeks(Seq((1L, 0), (1L, 1), (1L, 3), (2L, 0), (2L, 2), (3L, 2))))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (2L, 2L, 0L, 0L, 0L),   // w0: active 2, all new
      (1L, 0L, 1L, 0L, 1L),   // w1: u1 retained; u2 churned
      (2L, 1L, 0L, 1L, 1L),   // w2: u3 new, u2 resurrected; u1 churned
      (1L, 0L, 0L, 1L, 2L)),  // w3: u1 resurrected; u2,u3 churned
      got.mkString(", "))
  }

  test("e_growth_accounting: a fully-quiet week stays a REAL week") {
    // one user active weeks 0 and 2 → week 1 must appear with active=0
    // and churn 1, and week 2 must read RESURRECTED (not retained)
    val got = EventOps.growthAccountingFrom(weeks(Seq((1L, 0), (1L, 2))))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 0L, 0L),
      (0L, 0L, 0L, 0L, 1L),
      (1L, 0L, 0L, 1L, 0L)), got.mkString(", "))
  }

  test("e_growth_accounting: ledger identities on the gate feed") {
    graft.GraftSession.init(spark)
    val rows = EventOps.qGrowthAccounting(spark, "/root/testdata/sf0.001")
      .collect()
    var prevActive = 0L
    rows.foreach { r =>
      val (active, nw, ret, res, chu) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      assert(active == nw + ret + res, r.toString) // four-way partition
      assert(chu == prevActive - ret, r.toString)  // churn identity
      prevActive = active
    }
  }

  // ---- d_dup_inflation ----

  test("d_dup_inflation: token weighting diverges from doc weighting") {
    import spark.implicits._
    // source A: keeper(10 toks) + dup(90 toks) → doc 50%, token 90%
    // source B: two singletons → 0 / 0
    val docs = Seq((1L, "A", 10L), (2L, "A", 90L),
      (3L, "B", 7L), (4L, "B", 5L)).toDF("doc_id", "source", "n_toks")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val got = DedupOps.dupInflationFrom(docs, clusters).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("A") == ((1L, 90L, 0.5, 0.9)), got.toString)
    assert(got("B") == ((0L, 0L, 0.0, 0.0)), got.toString)
  }

  // ---- q_ntile ----

  test("q_ntile: bands partition each priority with SQL-standard sizing") {
    graft.GraftSession.init(spark)
    val rows = RelationalOps.qNtile(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val byPrio = rows.groupBy(_._1)
    byPrio.foreach { case (p, bands) =>
      assert(bands.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L), p)
      val n = bands.map(_._3).sum
      // SQL-standard ntile: first (n mod 4) bands carry ceil, rest floor
      val sizes = bands.sortBy(_._2).map(_._3)
      val expect = (0 until 4).map(i => n / 4 + (if (i < n % 4) 1L else 0L))
      assert(sizes.toSeq == expect, s"$p: $sizes vs $expect")
      // price bands are ordered: hi(k) <= lo(k+1) (ties can touch)
      sizes.indices.init.foreach { i =>
        val s = bands.sortBy(_._2)
        assert(s(i)._5 <= s(i + 1)._4, s"$p band $i overlap")
      }
    }
  }

  // ---- s_spearman_mrl ----

  test("s_spearman_mrl: rho is EXACTLY 1 when tail dims carry nothing") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      val a = Array.fill(64)(0f)
      (0 until 8).foreach(j => a(j) = ((i * 31 + j * 7) % 97 + 1).toFloat)
      (i, a.toSeq)
    }
    val got = SimilarityOps.spearmanMrlFrom(vecs.toDF("vec_id", "embedding"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == 39L, r.toString)          // n_cands
      assert(r.getLong(3) == 0L, r.toString)           // sum_d2
      assert(r.getDouble(4) == 1.0, r.toString)        // rho exact
    }
  }

  test("s_spearman_mrl: an order-reversing tail reads rho == -1 at dim 8") {
    import spark.implicits._
    // candidates: dims 0-1 rank by angle a_i (the 8-prefix view), dims
    // 8-9 rank by the REVERSED angle with 1000× the mass (the full-64
    // view). For query 0 the dim-8 ranking is the exact reverse of the
    // full ranking → Σd² hits the reversal maximum and ρ = −1 exactly;
    // dims 16/32 contain the tail → ρ = 1.
    val k = 21
    def vec(pre: Double, post: Double): Seq[Float] = {
      val a = Array.fill(64)(0f)
      a(0) = math.cos(pre).toFloat; a(1) = math.sin(pre).toFloat
      a(8) = (1000 * math.cos(post)).toFloat
      a(9) = (1000 * math.sin(post)).toFloat
      a.toSeq
    }
    val q = (0L, vec(0.0, 0.0))
    val cands = (1 to k).map { i =>
      (i.toLong, vec(i * 0.05, (k + 1 - i) * 0.05))
    }
    val got = SimilarityOps.spearmanMrlFrom((q +: cands)
      .toDF("vec_id", "embedding"))
      .collect().filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(got(8L) == -1.0, got.toString)
    assert(got(16L) == 1.0 && got(32L) == 1.0, got.toString)
  }

  // ---- s_triplets ----

  test("s_triplets: property — miner equals a sequential Scala model " +
    "(hardest positive/negative per cell, isolated labels emit no row)") {
    import spark.implicits._
    val rnd = new scala.util.Random(411)
    val vecs = (0L until 120L).map { i =>
      val lbl = (i % 5).toInt
      (i, Array.fill(64)((rnd.nextInt(2001) - 1000).toFloat / 250f).toSeq,
        lbl)
    }
    val got = SimilarityOps.tripletsFrom(
      vecs.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))).toMap

    // model: same cell assignment read back from the shared device, the
    // same left-to-right double fold, min/max with (cos, b_id) tiebreak
    val cells = SimilarityOps.assignCells(
      vecs.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) =>
        acc + p._1.toDouble * p._2.toDouble)
    def nrm(a: Seq[Float]): Double =
      math.sqrt(a.foldLeft(0.0)((acc, x) =>
        acc + x.toDouble * x.toDouble))
    val byId = vecs.map(v => v._1 -> v).toMap
    var expected = 0
    vecs.foreach { case (a, ea, la) =>
      val mates = vecs.filter(v => v._1 != a && cells(v._1) == cells(a))
        .map { case (b, eb, lb) =>
          (b, lb, dot(ea, eb) / (nrm(ea) * nrm(eb)))
        }
      val poss = mates.filter(_._2 == la)
      val negs = mates.filter(_._2 != la)
      if (poss.nonEmpty && negs.nonEmpty) {
        expected += 1
        val (pid, _, pcos) = poss.minBy(m => (m._3, m._1.toDouble))
        val (nid, _, ncos) = negs.minBy(m => (-m._3, m._1.toDouble))
        val row = got(a)
        assert(row._1 == la.toLong, s"anchor $a label")
        assert(row._2 == pid && row._3 == pcos, s"anchor $a pos")
        assert(row._4 == nid && row._5 == ncos, s"anchor $a neg")
        assert(row._6 == pcos - ncos, s"anchor $a margin")
        assert(row._7 == (ncos > pcos - 0.2), s"anchor $a active")
      } else assert(!got.contains(a), s"anchor $a should emit no row")
    }
    assert(got.size == expected && expected > 0, s"${got.size}/$expected")
  }

  // ---- t_bleu_pairs ----

  private def bleu(pairs: Seq[(Long, Long)],
                   docs: Seq[(Long, String)]): Map[(Long, Long), Any] = {
    import spark.implicits._
    TextOps.bleuPairsFrom(pairs.toDF("a_id", "b_id"),
      docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(7)) null else r.getDouble(7))).toMap
  }

  test("t_bleu_pairs: an identical pair reads log-BLEU EXACTLY 0") {
    val got = bleu(Seq((1L, 2L)),
      Seq((1L, "the cat sat on the mat"), (2L, "the cat sat on the mat")))
    assert(got == Map((1L, 2L) -> 0.0), got.toString)
  }

  test("t_bleu_pairs: brevity penalty fires only when hyp is shorter") {
    // hyp = prefix of ref: precisions are 1 (every hyp gram clips fully)
    // so log-BLEU = BP alone = 1 − r/c < 0
    val got = bleu(Seq((1L, 2L)),
      Seq((1L, "a b c d"), (2L, "a b c d e f")))
    assert(got((1L, 2L)) == 1.0 - 6.0 / 4.0, got.toString)
    // and the mirrored pair (hyp longer) reads penalty-free but with
    // imperfect precision: p1 = 4/6, p2 = 3/5, BP = 0
    val got2 = bleu(Seq((2L, 1L)),
      Seq((1L, "a b c d"), (2L, "a b c d e f")))
    val v = got2((2L, 1L)).asInstanceOf[Double]
    assert(math.abs(v - 0.5 * (math.log(4.0 / 6.0) + math.log(3.0 / 5.0)))
      < 1e-12, got2.toString)
  }

  test("t_bleu_pairs: zero bigram overlap reads NULL (log-BLEU of 0)") {
    // unigrams overlap (both use 'x') but no bigram does
    val got = bleu(Seq((1L, 2L)), Seq((1L, "x p x q"), (2L, "r x s x t")))
    assert(got == Map((1L, 2L) -> null), got.toString)
  }

  // ---- e_pareto ----

  private def pareto(userEvents: Seq[Long]): Map[Long, (Long, Long, Double, Double)] = {
    import spark.implicits._
    EventOps.paretoFrom(userEvents.toDF("user_id")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
  }

  test("e_pareto: uniform activity reads share == pct and lift == 1 exactly") {
    // 100 users × 1 event: top k% holds exactly k% of events
    val got = pareto((0L until 100L))
    Seq(1L, 5L, 10L, 25L, 50L).foreach { k =>
      val (topUsers, evCum, share, lift) = got(k)
      assert(topUsers == k && evCum == k, s"$k: $got")
      assert(share == k.toDouble / 100.0 && lift == 1.0, s"$k: $got")
    }
  }

  test("e_pareto: one whale reads the closed-form concentration") {
    // user 0 → 99 events, users 1..99 → 1 each: U=100, E=198.
    // top 1% = the whale alone: share 99/198 = 0.5, lift 50.
    val got = pareto(Seq.fill(99)(0L) ++ (1L until 100L))
    assert(got(1L) == ((1L, 99L, 0.5, 50.0)), got.toString)
    // top 50%: whale + 49 singles = 148 events
    assert(got(50L) == ((50L, 148L, 148.0 / 198.0, 2.0 * 148.0 / 198.0)),
      got.toString)
  }

  test("e_pareto: gate curve is monotone (share up, lift down)") {
    graft.GraftSession.init(spark)
    val rows = EventOps.qPareto(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L, 25L, 50L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 >= b._3, s"$a vs $b")
    }
    assert(rows.last._2 >= 0.5) // top half holds at least half
  }

  // ---- e_anomaly_votes ----

  test("e_anomaly_votes: every emitted row is flagged and vote-consistent") {
    graft.GraftSession.init(spark)
    val d = "/root/testdata/sf0.001"
    val rows = EventOps.qAnomalyVotes(spark, d).collect()
    rows.foreach { r =>
      val flags = Seq(2, 3, 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i)))
      assert(flags.exists(_.contains(true)), r.toString)
      assert(r.getLong(5) == flags.count(_.contains(true)), r.toString)
    }
    // tier-coverage: every STL-flagged (type, day) appears in the ensemble
    val stl = EventOps.qStlAnomaly(spark, d).collect()
      .filter(r => !r.isNullAt(4) && r.getBoolean(4))
      .map(r => (r.getString(0), r.getDate(1))).toSet
    val got = rows.map(r => (r.getString(0), r.getDate(1))).toSet
    assert(stl.subsetOf(got), (stl -- got).toString)
  }

  // ---- t_code_detect ----

  test("t_code_detect: hand-counted syntax ledger routes code from prose") {
    graft.GraftSession.init(spark)
    val code = "int main() { x = 1; y_2 = f(x); }"
    val dir = docsDir(Seq(
      (0L, code, "xx", "s"), (1L, "the cat sat on the mat", "xx", "s")))
    val got = TextOps.codeDetect(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(9)))).toMap
    // code doc: braces {}=2, semis=2, eq=2, parens main()+f(x)=4,
    // underscore=1 → score = 4*2 + 2*2 + 2 + 4 + 1 = 19; code verdict
    assert(got(0L) == ((2L, 2L, 2L, 4L, 1L, 19L, true)), got.toString)
    assert(got(1L) == ((0L, 0L, 0L, 0L, 0L, 0L, false)), got.toString)
  }

  // ---- v_value_fences ----

  test("v_value_fences: hand-computed quartiles and a planted outlier") {
    import spark.implicits._
    // type a: values 1..8 plus 100 → n=9, q1 = rank ⌈9/4⌉=3 → 3,
    // q3 = rank ⌈27/4⌉=7 → 7, iqr 4, fences (−3, 13), one outlier
    val ev = ((1 to 8).map(v => ("a", v.toDouble)) :+ ("a", 100.0))
      .toDF("event_type", "value")
    val got = ValidationOps.valueFencesFrom(ev).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6), r.getLong(7)) ==
      ((9L, 3.0, 7.0, 4.0, -3.0, 13.0, 1L)), r.toString)
    assert(r.getDouble(8) == 1.0 / 9.0, r.toString)
  }

  test("v_value_fences: NULL values are excluded from the ranks") {
    import spark.implicits._
    val ev = Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
      ("a", Some(3.0)), ("a", Some(4.0)))
      .toDF("event_type", "value")
    val r = ValidationOps.valueFencesFrom(ev).collect().head
    // n counts only the 4 non-null values; q1 = rank 1 → 1.0
    assert(r.getLong(1) == 4L && r.getDouble(2) == 1.0, r.toString)
  }

  // ---- t_vocab_drift ----

  test("t_vocab_drift: identical halves read EXACTLY 0; disjoint read ln 2") {
    graft.GraftSession.init(spark)
    val same = docsDir(Seq((0L, "a b c", "xx", "s"), (1L, "a b c", "xx", "s")))
    val got = TextOps.vocabDrift(spark, same).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("early" -> 0.0, "late" -> 0.0), got.toString)
    val disj = docsDir(Seq((0L, "a b c", "xx", "s"), (1L, "d e f", "xx", "s")))
    val got2 = TextOps.vocabDrift(spark, disj).collect()
      .map(r => r.getDouble(2))
    got2.foreach(v => assert(math.abs(v - math.log(2.0)) < 1e-9, v.toString))
  }

  // ---- s_knn_accuracy ----

  test("s_knn_accuracy: well-separated label groups read accuracy 1") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // two groups on orthogonal directions: every in-cell neighbor shares
    // the label, so the leave-one-out vote is always right
    val vecs = (0L until 20L).map { i =>
      val a = Array.fill(64)(0f)
      val g = (i % 2).toInt
      a(g) = 10f + (i / 2).toFloat  // same direction per group
      a(32 + g) = 1f
      (i, a.toSeq, g)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_knn").toString
    vecs.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SimilarityOps.knnAccuracy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(0L, 1L), got.toString)
    got.foreach { case (l, (n, c, acc)) =>
      assert(n == 10L && c == 10L && acc == 1.0, s"$l: $got")
    }
  }

  // ---- v_ks_halves ----

  /** (type, day-offset, value) rows → the (event_type, ts, value)
    * relation ksHalvesFrom consumes. */
  private def ksFeed(rows: Seq[(String, Int, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "off", "value")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"), col("value"))
  }

  test("v_ks_halves: identical halves read D EXACTLY 0; a full location " +
    "shift reads D == 1 and fires the 128-bit verdict") {
    val same = (0 until 10).flatMap(i =>
      Seq(("s", 0, i.toDouble), ("s", 1, i.toDouble)))
    val r0 = ValidationOps.ksHalvesFrom(ksFeed(same)).collect().head
    assert(r0.getLong(3) == 0L && r0.getDouble(4) == 0.0 &&
      !r0.getBoolean(5), r0.toString)
    // half 1: ten 1.0s; half 2: ten 2.0s → D = 1, a = n1·n2 = 100;
    // verdict: 100²·10⁶ = 10¹⁰ > 1844164·10·10·20 ≈ 3.7·10⁹ → drift
    val shift = (0 until 10).flatMap(i =>
      Seq(("t", 0, 1.0), ("t", 1, 2.0)))
    val r1 = ValidationOps.ksHalvesFrom(ksFeed(shift)).collect().head
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getDouble(4),
      r1.getBoolean(5)) == ((10L, 10L, 100L, 1.0, true)), r1.toString)
  }

  test("v_ks_halves: 128-bit envelope guard raises in-plan at n = 2^26") {
    // 2^26 rows in the early half (single shared value → tiny histogram;
    // the spark.range fixture device, never a driver array)
    val big = spark.range((1L << 26) + 1)
      .select(org.apache.spark.sql.functions.lit("x").as("event_type"),
        expr("""timestamp '2024-01-01 12:00:00'
          + make_interval(0, 0, 0, IF(id = 0, 2, 0))""").as("ts"),
        org.apache.spark.sql.functions.lit(1.0).as("value"))
    val e = intercept[Exception] {
      ValidationOps.ksHalvesFrom(big).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("v_ks_halves"),
      e.getMessage)
  }

  // ---- q_except_all / q_intersect_all ----

  test("set-op ALL variants keep multiplicities the DISTINCT forms drop") {
    graft.GraftSession.init(spark)
    val d = "/root/testdata/sf0.001"
    // identities over the same orders relation: per customer,
    // |EXCEPT ALL| = total − open, |INTERSECT ALL| = min(total, F-count)
    val o = graft.ops.Tables.orders(spark, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("op"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val ex = RelationalOps.qExceptAll(spark, d).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.length.toLong }
    val in = RelationalOps.qIntersectAll(spark, d).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.length.toLong }
    o.foreach { case (ck, (n, op, f)) =>
      assert(ex.getOrElse(ck, 0L) == n - op, s"except_all at $ck")
      assert(in.getOrElse(ck, 0L) == math.min(n, f), s"intersect_all at $ck")
    }
  }

  // ---- d_bloom_fpr ----

  test("d_bloom_fpr: internally consistent with the prune relation and " +
    "theory matches the closed form") {
    graft.GraftSession.init(spark)
    val d = "/root/testdata/sf0.001"
    val r = DedupOps.bloomFpr(spark, d).collect().head
    val (m, k, n, probes, fp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(m == 4096L && k == 3L)
    // observed counts recount from the prune relation itself
    val pr = DedupOps.bloomPrune(spark, d).collect()
    val clean = pr.filter(!_.getBoolean(2))
    assert(probes == clean.length && fp == clean.count(_.getBoolean(1)),
      r.toString)
    assert(r.getDouble(5) == fp.toDouble / probes.toDouble, r.toString)
    // theory within float-noise of the straightforward double formula
    // (DetMath ln/exp agree with libm to ~1 ulp; the spec allows 1e-12)
    val want = math.pow(1.0 - math.exp(
      k * n * math.log((m - 1).toDouble / m.toDouble)), k.toInt)
    assert(math.abs(r.getDouble(6) - want) < 1e-12,
      s"${r.getDouble(6)} vs $want")
    // and the filter is behaving like a bloom filter at all: theory in
    // the sized-for band, observed within 5x of it on 100 probes
    assert(r.getDouble(6) > 0.001 && r.getDouble(6) < 0.1, r.toString)
    assert(r.getDouble(5) <= 5.0 * r.getDouble(6) + 0.05, r.toString)
  }

  // ---- e_holt_winters ----

  /** (event_type, day-offset, events-that-day) feed — the autocorr
    * fixture shape. */
  private def hwFeed(rows: Seq[(String, Int, Int)]) = {
    import spark.implicits._
    rows.flatMap { case (t, off, k) => Seq.fill(k)((t, off)) }
      .toDF("event_type", "off")
      .select(col("event_type"),
        expr("timestamp '2024-01-01 12:00:00' + make_interval(0,0,0,off)")
          .as("ts"))
  }

  test("e_holt_winters: constant series reads l==y, b==0, s==0, " +
    "forecast==y EXACTLY at every window length") {
    val got = EventOps.holtWintersFrom(
      hwFeed((0 until 20).map(d => ("c", d, 3)))).collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 0.0 &&
        r.getDouble(5) == 0.0 && r.getDouble(6) == 3.0, r.toString)
    }
  }

  test("e_holt_winters: bit-exact vs an independent sequential dyadic " +
    "model on a random series (incl. densified gap days)") {
    // independent model: run the recurrence NUMERICALLY in exact
    // dyadic arithmetic (the symbolic coefficient table never enters)
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
    def toDouble(a: D): Double = {
      assert(a.n.abs < (BigInt(1) << 53), "model numerator exceeds exact double")
      a.n.toDouble / math.pow(2.0, a.k.toDouble)
    }
    val rnd = new scala.util.Random(1114)
    // 20 calendar days, days 7 and 13 silent (densified to n=0)
    val series = (0 until 20).map(d =>
      if (d == 7 || d == 13) 0 else 1 + rnd.nextInt(50))
    def model(upTo: Int): (Double, Double, Double, Double) = {
      val w = series.slice(math.max(0, upTo - 13), upTo + 1) // trailing ≤14
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
      (toDouble(l), toDouble(b), toDouble(sNext),
        toDouble(add(add(l, b), sNext)))
    }
    val feed = hwFeed(series.zipWithIndex.collect {
      case (n, d) if n > 0 => ("r", d, n)
    })
    val got = EventOps.holtWintersFrom(feed).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.size == 20, got.size.toString)
    (0 until 20).foreach { d =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong).toString
      assert(got(day) == model(d), s"day $d: ${got(day)} vs ${model(d)}")
    }
  }

  // ---- q_asof_fwd ----

  test("q_asof_fwd: equals a brute-force next-view model on the gate " +
    "feed (at-or-after semantics, ties included)") {
    graft.GraftSession.init(spark)
    val d = "/root/testdata/sf0.001"
    val ev = graft.ops.Tables.events(spark, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val got = EventOps.qAsofFwd(spark, d).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(2)) null
        else r.getLong(2).asInstanceOf[Any]),
        if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[Any])).toMap
    var checked = 0
    byUser.foreach { case (_, rows) =>
      val views = rows.filter(_._3 == "view")
      rows.filter(_._3 == "click").foreach { case (cid, _, _, cus) =>
        // earliest view at-or-after the click; ties by event_id
        val cand = views.filter(_._4 >= cus)
        val want: (Any, Any) =
          if (cand.isEmpty) (null, null)
          else {
            val v = cand.minBy(v => (v._4, v._1))
            (v._1, v._4 - cus)
          }
        assert(got(cid) == want, s"click $cid: ${got(cid)} vs $want")
        checked += 1
      }
    }
    assert(checked > 0 && got.size == checked)
  }

  // ---- e_backtest_hw ----

  test("e_backtest_hw: a weekly square wave flips the winner to " +
    "holt_winters; a constant series ties at zero error") {
    // 6 weeks of weekday=2 / weekend=10: the seasonal state is the ONLY
    // way to anticipate the Saturday jump — HW must win
    val wave = (0 until 42).map { d =>
      val dow = (4 + d) % 7 // 2024-01-01 is a Monday; offset arbitrary
      ("w", d, if (dow >= 5) 10 else 2)
    }
    val r = EventOps.backtestHwFrom(hwFeed(wave)).collect().head
    assert(r.getString(4) == "holt_winters", r.toString)
    assert(r.getDouble(2) < r.getDouble(3), r.toString)
    // constant series: both models forecast y exactly → 0/0 tie
    val const = (0 until 21).map(d => ("c", d, 5))
    val rc = EventOps.backtestHwFrom(hwFeed(const)).collect().head
    assert(rc.getDouble(2) == 0.0 && rc.getDouble(3) == 0.0 &&
      rc.getString(4) == "tie", rc.toString)
  }

  // ---- s_ivf_probe_curve ----

  test("s_ivf_probe_curve: recall is monotone in nprobe and EXACTLY 1 " +
    "at nprobe = 8 (all cells probed = brute force)") {
    graft.GraftSession.init(spark)
    val rows = SimilarityOps.ivfProbeCurve(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L), rows.mkString(", "))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"recall not monotone: $a vs $b")
    }
    assert(rows.last._2 == 1.0, rows.mkString(", "))
  }

  // ---- char_counts kernel ----

  test("char_counts: property — bit-equal to the replace() chain, " +
    "exact on multibyte text, loud on bad targets") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(1107)
    val alphabet = "ab{};=()_ \tλπ你好"
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(80)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "{};=()_"
    val targets = "{};=()_"
    val df = texts.toDF("text")
      .withColumn("cc", expr(s"char_counts(text, '$targets')"))
    targets.zipWithIndex.foreach { case (ch, i) =>
      val via = df.selectExpr(s"cc[$i]",
        s"CAST(length(text) - length(replace(text, '$ch', '')) AS BIGINT)")
        .collect()
      via.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"'$ch': ${r.toString}"))
    }
    // non-ASCII and duplicate targets are rejected loudly, not miscounted
    val e1 = intercept[Exception] {
      Seq("x").toDF("text").selectExpr("char_counts(text, 'λ')").collect()
    }
    assert(e1.getMessage != null &&
      e1.getMessage.contains("must be ASCII") ||
      e1.getCause != null && e1.getCause.getMessage.contains("must be ASCII"))
    val e2 = intercept[Exception] {
      Seq("x").toDF("text").selectExpr("char_counts(text, 'aa')").collect()
    }
    assert(e2.getMessage != null &&
      e2.getMessage.contains("must be distinct") ||
      e2.getCause != null && e2.getCause.getMessage.contains("must be distinct"))
  }

  // ---- d_semantic_sweep ----

  test("d_semantic_sweep: monotone in the threshold and consistent with " +
    "the production tier at pct=40") {
    graft.GraftSession.init(spark)
    val d = "/root/testdata/sf0.001"
    val rows = DedupOps.semanticSweep(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val pcts = rows.keys.toSeq.sorted
    pcts.sliding(2).foreach {
      case Seq(a, b) =>
        assert(rows(a)._1 >= rows(b)._1, s"pairs not monotone at $a,$b")
        assert(rows(a)._2 >= rows(b)._2, s"docs not monotone at $a,$b")
      case _ => ()
    }
    rows.foreach { case (p, (pairs, docs, removed)) =>
      assert(removed <= docs && docs <= 2 * pairs, s"$p: $pairs $docs $removed")
    }
    // pct=40 must agree with d_embedding_neardup's own pair count
    val prod = DedupOps.embeddingNearDup(spark, d).count()
    if (rows.contains(40L)) assert(rows(40L)._1 == prod, s"${rows(40L)} vs $prod")
    else assert(prod == 0L)
  }
}
