package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 classifier-evaluation curves (t_auc, t_calibration) and the
  * dedup threshold sweep (d_threshold_sweep): the decomposed/closed-form
  * gate computations proven against brute force on data small enough to
  * enumerate, plus constructed-input discrimination for the sweep (the
  * testdata pair graph is bimodal, so the gate curve is legitimately
  * flat there — the unit corpus is where the dial visibly moves). */
class R9CurveSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("t_auc equals brute-force pairwise AUC on the real corpus") {
    graft.GraftSession.init(spark)
    // the same quantized mean key the query ranks on, recomputed from
    // the shared scored core
    val sc = CorpusOps.nbScored(spark, sf)
      .withColumn("mkey", expr(
        "(sl + 64000000000L * n_tokens) DIV (1000 * n_tokens) - 64000000"))
      .select("keep_label", "mkey").collect()
    val pos = sc.filter(_.getBoolean(0)).map(_.getLong(1))
    val neg = sc.filterNot(_.getBoolean(0)).map(_.getLong(1))
    assert(pos.nonEmpty && neg.nonEmpty, "vacuous: one-class corpus")
    var num2 = BigInt(0)
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val brute = num2.toDouble / (2.0 * pos.length * neg.length)
    val got = CorpusOps.nbAuc(spark, sf).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == pos.length && got(0).getLong(1) == neg.length)
    // both sides divide the same exact integers (< 2^53 here) — the
    // doubles must be BIT-identical, not approximately equal
    assert(got(0).getDouble(2) == brute,
      s"auc ${got(0).getDouble(2)} != brute $brute")
  }

  test("t_calibration bins are the exact per-doc histogram of nbScored") {
    graft.GraftSession.init(spark)
    val sc = CorpusOps.nbScored(spark, sf)
      .select("keep_label", "n_tokens", "sl").collect()
    // the shifted truncating division, replayed in Scala (numerator is
    // positive, so / == floor division)
    def bin(nt: Long, sl: Long): Long =
      (2 * sl + 163840000000L * nt) / (10000000L * nt) - 16384
    val want = sc.groupBy(r => bin(r.getLong(1), r.getLong(2)))
      .map { case (b, rs) =>
        b -> (rs.length.toLong, rs.count(_.getBoolean(0)).toLong)
      }
    val got = CorpusOps.nbCalibration(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == want.keySet)
    got.foreach { r =>
      val (nd, nk) = want(r.getLong(0))
      assert(r.getLong(2) == nd && r.getLong(3) == nk, s"bin mismatch: $r")
      assert(r.getDouble(1) == r.getLong(0).toDouble * 0.005)
      assert(r.getDouble(4) == nk.toDouble / nd)
    }
    assert(got.map(_.getLong(2)).sum == sc.length,
      "bins must partition the scored corpus")
    assert(math.abs(got.map(_.getDouble(5)).sum - 1.0) < 1e-12)
  }

  test("d_threshold_sweep discriminates on a constructed pair relation") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq(
      (1L, 2L, 10L, 10L, 10L), // jaccard 1.0   -> pct 100
      (3L, 4L, 10L, 10L, 8L),  // 8/12  = 0.66… -> pct 66
      (5L, 6L, 10L, 10L, 6L),  // 6/14  = 0.42… -> pct 42 (below grid)
      (7L, 8L, 12L, 8L, 7L),   // 7/13  = 0.53… -> pct 53
      (2L, 9L, 10L, 10L, 9L)   // 9/11  = 0.81… -> pct 81
    ).toDF("a_id", "b_id", "n_a", "n_b", "inter")
    val got = DedupOps.thresholdSweepFrom(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (50L, 4L, 4L, 6L), // b-side flagged: 2, 4, 8, 9
      (60L, 3L, 3L, 7L), // 2, 4, 9
      (70L, 2L, 2L, 8L), // 2, 9
      (80L, 2L, 2L, 8L),
      (90L, 1L, 1L, 9L)), s"sweep rows: ${got.toSeq}")
  }

  test("t_kn_lm matches a brute-force Kneser-Ney recompute") {
    graft.GraftSession.init(spark)
    // split(text, ' ') replayed with Java's -1-limit split (keeps empty
    // trailing strings, like Spark's)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val bigrams = docs.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))).toSeq
    }
    val cb = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val types = cb.keySet
    val n1w1 = types.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nc2 = types.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nt = types.size.toLong
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map { case (_, b) =>
        val num = (2L * cb(b) - 1L) * nt + n1w1(b._1) * nc2(b._2)
        val den = 2L * c1(b._1) * nt
        math.log(num.toDouble) - math.log(den.toDouble)
      }
      id -> (bs.size.toLong, terms.sum / bs.size)
    }
    val got = TextOps.knLm(spark, sf).collect()
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { r =>
      val (nb, alp) = want(r.getLong(0))
      assert(r.getLong(1) == nb, s"bigram count for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - alp) < 1e-6,
        s"doc ${r.getLong(0)}: ${r.getDouble(2)} vs $alp")
      assert(r.getDouble(2) <= 1e-12, "p_KN must never exceed 1")
    }
  }

  test("v_corr_matrix matches a brute-force Pearson recompute") {
    graft.GraftSession.init(spark)
    val rows = Tables.lineitem(spark, sf).select(
      expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      expr("CAST(round(l_tax * 100) AS BIGINT)").as("tax")).collect()
    val byName = Map(
      "disc" -> rows.map(_.getLong(0)), "price" -> rows.map(_.getLong(1)),
      "qty" -> rows.map(_.getLong(2)), "tax" -> rows.map(_.getLong(3)))
    def pearson(xs: Array[Long], ys: Array[Long]): Double = {
      val n = xs.length.toLong
      val sx = BigInt(xs.sum); val sy = BigInt(ys.sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val syy = ys.map(y => BigInt(y) * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
         math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    }
    val got = ValidationOps.corrMatrix(spark, sf).collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getLong(2) == rows.length)
      val want = pearson(byName(r.getString(0)), byName(r.getString(1)))
      assert(math.abs(r.getDouble(3) - want) < 1e-12,
        s"${r.getString(0)}/${r.getString(1)}: ${r.getDouble(3)} vs $want")
    }
  }

  test("s_ndcg: ledger constants, ideal mass, and recall consistency") {
    graft.GraftSession.init(spark)
    // the shared discount constants really are round(1e9/log2(pos+1))
    val w = (1 to 5).map(p =>
      math.round(1.0e9 * math.log(2.0) / math.log(p + 1.0)))
    val idealFp = (1 to 5).map(p => (6L - p) * w(p - 1)).sum
    val got = SimilarityOps.ndcgLsh(spark, sf).collect()
    val rec = SimilarityOps.annRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got.length == rec.size)
    got.foreach { r =>
      assert(r.getLong(3) == idealFp, s"idcg drifted: $r")
      assert(r.getLong(1) == rec(r.getLong(0)),
        "n_hit must agree with s_ann_recall on the same tiers")
      val ndcg = r.getDouble(4)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert(ndcg == r.getLong(2).toDouble / r.getLong(3))
      // a perfect-order tier is exactly 1 — and only then
      assert((ndcg == 1.0) == (r.getLong(2) == idealFp))
    }
  }

  test("d_lpa_communities: a bridge edge does NOT merge two dense cores") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined only by the bridge 3-4:
    // connected components put all six in ONE cluster; majority label
    // propagation must keep two communities (hand-traced with the
    // self-vote: l1 = 1,1,1,3,4,4; l2 = 1,1,1,4,4,4; stable from l2 —
    // node 4's neighbors {1,4,4} plus its own vote outweigh the bridge)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a_id", "b_id")
    val got = DedupOps.lpaCommunitiesFrom(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"labels: $got")
    // the CC baseline really does merge them — otherwise the split above
    // proves nothing about LPA vs components
    val cc = DedupOps.dedupClustersFrom(pairs).collect()
      .map(_.getLong(1)).distinct
    assert(cc.length == 1, s"CC should give one component, got $cc")
  }

  test("d_bridge_docs: exactly the two endpoints of the bridge edge") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a_id", "b_id")
    val got = DedupOps.bridgeDocsFrom(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // communities are {1,2,3}→1 and {4,5,6}→4 (hand-traced in the LPA
    // test); only the bridge endpoints see a foreign community
    assert(got.toSeq == Seq((3L, 1L, 1L, 2L), (4L, 4L, 1L, 2L)),
      s"got ${got.toSeq}")
  }

  test("d_lpa_communities: an isolated near-dup pair converges to ONE community") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // the most common duplicate topology — a single pair. Synchronous
    // LPA WITHOUT the self-vote oscillates here (labels swap every
    // round; an even iteration count reports two singleton communities
    // and keep-one-per-community keeps both copies). The self-vote
    // breaks the round-1 tie to the min label and the pair stays put.
    val pairs = Seq((7L, 9L)).toDF("a_id", "b_id")
    val got = DedupOps.lpaCommunitiesFrom(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 9L -> 7L), s"labels: $got")
    // and therefore no bridge rows: one community, zero foreign edges
    assert(DedupOps.bridgeDocsFrom(pairs).collect().isEmpty)
  }

  test("d_lpa_communities refine dedup clusters on the real pair graph") {
    graft.GraftSession.init(spark)
    // sf0.01: the sf0.001 pair graph is too sparse to be non-vacuous
    val sf1 = "/root/testdata/sf0.01"
    val edges = DedupOps
      .jaccardFrom(DedupOps.pairCounts(spark, sf1, DedupOps.DefaultMaxDf))
      .select(col("a_id"), col("b_id")).localCheckpoint()
    assert(edges.count() > 0, "vacuous: no near-dup edges at this SF")
    val lpa = DedupOps.lpaCommunitiesFrom(edges)
      .withColumnRenamed("community_id", "cm")
    val cc = DedupOps.dedupClustersFrom(edges)
      .withColumnRenamed("cluster_id", "cl")
    val joined = lpa.join(cc, "doc_id")
    assert(joined.count() == lpa.count(), "same node set")
    // labels only ever propagate along edges, so a community can never
    // straddle two connected components
    val split = joined.groupBy("cm")
      .agg(countDistinct(col("cl")).as("ncl"))
      .filter(col("ncl") > 1)
    assert(split.count() == 0, s"community spans components: ${split.take(3).toSeq}")
  }

  test("d_threshold_tokens weighs the same removals in tokens") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // same pair relation as the sweep discrimination test; docs carry
    // known token counts (doc i has i tokens)
    val docs = (1L to 10L)
      .map(i => (i, (1L to i).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Seq(
      (1L, 2L, 10L, 10L, 10L), // pct 100 -> flags doc 2 (2 tokens)
      (3L, 4L, 10L, 10L, 8L),  // pct 66  -> flags doc 4 (4 tokens)
      (5L, 6L, 10L, 10L, 6L),  // pct 42  -> below grid
      (7L, 8L, 12L, 8L, 7L),   // pct 53  -> flags doc 8 (8 tokens)
      (2L, 9L, 10L, 10L, 9L)   // pct 81  -> flags doc 9 (9 tokens)
    ).toDF("a_id", "b_id", "n_a", "n_b", "inter")
    val total = (1L to 10L).sum // 55
    val got = DedupOps.thresholdTokensFrom(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (50L, 2L + 4 + 8 + 9, total, total - 23),
      (60L, 2L + 4 + 9, total, total - 15),
      (70L, 2L + 9, total, total - 11),
      (80L, 2L + 9, total, total - 11),
      (90L, 2L, total, total - 2)), s"rows: ${got.toSeq}")
  }

  test("t_quality_budget: same bins as calibration, monotone retention") {
    graft.GraftSession.init(spark)
    val cal = CorpusOps.nbCalibration(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = CorpusOps.qualityBudget(spark, sf).collect()
    assert(got.nonEmpty && got.map(_.getLong(0)).toSet == cal.keySet,
      "one binning rule, two queries")
    got.foreach(r => assert(r.getLong(2) == cal(r.getLong(0))))
    // ascending bins ⇒ descending cumulative mass; lowest bin holds all
    val byBin = got.sortBy(_.getLong(0))
    assert(byBin.map(_.getLong(4)).toSeq ==
      byBin.map(_.getLong(4)).toSeq.sorted.reverse)
    assert(byBin.head.getLong(4) == got.map(_.getLong(2)).sum)
    assert(byBin.head.getLong(5) == got.map(_.getLong(3)).sum)
    assert(byBin.head.getDouble(6) == 1.0)
    // full token conservation: the scored token mass is the corpus's —
    // every corpus token is in the trained vocabulary
    val toks = Tables.documents(spark, sf)
      .select(expr("CAST(size(split(text, ' ')) AS BIGINT)").as("nt"))
      .agg(sum(col("nt"))).collect()(0).getLong(0)
    assert(byBin.head.getLong(5) == toks)
  }

  test("Exact.limbDbl: split sums recombine deterministically and exactly") {
    graft.GraftSession.init(spark)
    val L = Exact.Limb
    val rnd = new scala.util.Random(9)
    val cases = (1 to 200).map { _ =>
      // random nonnegative BIGINT terms up to ~1e14 (the squared-cents
      // shape), list lengths up to 5000
      Seq.fill(1 + rnd.nextInt(5000))(math.abs(rnd.nextLong()) % 100000000000000L)
    }
    cases.foreach { terms =>
      val h = terms.map(_ / L).sum
      val l = terms.map(_ % L).sum
      val total = terms.map(BigInt(_)).sum
      // Spark evaluates the very fragment the queries embed
      val got = spark.range(1)
        .selectExpr(s"${Exact.limbDbl(s"${h}L", s"${l}L")} AS d")
        .collect()(0).getDouble(0)
      // the Scala replay of the same two IEEE ops
      val ref = (h + l / L).toDouble * L.toDouble + (l % L).toDouble
      assert(got == ref, s"engine $got != reference $ref")
      // below 2^53 the recombination must equal the exact total
      if (total < BigInt(1L << 53))
        assert(got == total.toDouble, s"inexact under 2^53: $got vs $total")
    }
  }

  test("d_shingle_profile: capped pair mass equals what pairCounts enumerates") {
    graft.GraftSession.init(spark)
    val prof = DedupOps.shingleProfile(spark, sf).collect()
    assert(prof.nonEmpty)
    // Σ_sh C(f,2) over df-capped shingles is exactly the intersection
    // mass the inverted index enumerates: Σ inter over pairCounts
    val cappedMass = prof.map(r => BigInt(r.getString(4))).sum
    val enumerated = DedupOps.pairCounts(spark, sf, DedupOps.DefaultMaxDf)
      .agg(sum(col("inter"))).collect()(0).getLong(0)
    assert(cappedMass == BigInt(enumerated),
      s"profile says $cappedMass, pairCounts enumerates $enumerated")
    // bucket arithmetic: postings ≥ shingles, uncapped ≥ capped
    prof.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1))
      assert(BigInt(r.getString(3)) >= BigInt(r.getString(4)))
      // the string rendering is plain digits — parseable, no sign, no
      // exponent, no scale marks (the representation the gate hashes)
      assert(r.getString(3).matches("[0-9]+") && r.getString(4).matches("[0-9]+"))
    }
  }

  test("e_holt matches the sequential Holt recurrence") {
    graft.GraftSession.init(spark)
    import org.apache.spark.sql.expressions.Window
    // replay the per-(type, day) windows exactly as the query builds them
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("vals", collect_list(col("n")).over(
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-13, 0)))
      .select("event_type", "day", "vals").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getSeq[Long](2)))
    def holt(ys: Seq[Long]): (Double, Double) = {
      var l = ys.head.toDouble; var b = 0.0
      ys.tail.foreach { y =>
        val l2 = (y + l + b) / 2; b = (l2 - l + b) / 2; l = l2
      }
      (l, b)
    }
    val got = EventOps.qHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(daily.nonEmpty && got.size == daily.length)
    daily.foreach { case (ty, day, vals) =>
      val (l, b) = holt(vals)
      val (gl, gb, gn) = got((ty, day))
      // the dyadic recurrence is exact in doubles at these magnitudes —
      // both paths compute the same rationals
      assert(math.abs(gl - l) < 1e-6 && math.abs(gb - b) < 1e-6,
        s"($ty, $day): ($gl, $gb) vs ($l, $b)")
      assert(math.abs(gn - (l + b)) < 1e-6)
    }
  }

  test("d_threshold_sweep gate-path invariants on the real corpus") {
    graft.GraftSession.init(spark)
    val rows = DedupOps.thresholdSweep(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == DedupOps.SweepGrid)
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == nDocs, s"doc conservation: $r")
      assert(r.getDouble(4) == r.getLong(2).toDouble / nDocs)
    }
    // both counts are nonincreasing in the threshold
    assert(rows.map(_.getLong(1)).toSeq.sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
    assert(rows.map(_.getLong(2)).toSeq.sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
    // pct >= 80 is EXACTLY d_ngram_jaccard's >= 0.8 gate: ⌊100i/u⌋ ≥ 80
    // ⇔ 100i ≥ 80u ⇔ i/u ≥ 4/5, and the double compare can only disagree
    // within half an ulp of 0.8 — unreachable for rationals with the
    // denominators this corpus produces
    val at80 = rows.find(_.getLong(0) == 80L).get.getLong(1)
    assert(at80 == DedupOps.ngramJaccard(spark, sf).count())
  }
}
