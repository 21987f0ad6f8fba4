package graft.ops

import graft.SparkSpec

/** Semantic invariants for the round-7 operator batch — properties the
  * DuckDB oracle can't see (it replays the same computation, so a shared
  * logic bug would hash-match): monotonicity, conservation, and range
  * laws that must hold for ANY input. Run at sf0.001 for speed; the laws
  * are size-independent.
  */
class R7InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("event funnel counts are monotonically non-increasing") {
    val rows = EventOps.qEventFunnel(spark, sf).collect()
    assert(rows.length == 4)
    val ns = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(ns.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel not monotone: ${ns.mkString(",")}")
  }

  test("dedup funnel stages conserve documents") {
    EventOps // touch to avoid unused warnings in some build configs
    val rows = DedupOps.dedupFunnel(spark, sf).collect()
    assert(rows.length == 3)
    val byStage = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    byStage.values.foreach { case (in, rem, out) =>
      assert(in - rem == out, s"in - removed != out: $in $rem $out")
    }
    // stage k's output is stage k+1's input
    assert(byStage("1_exact")._3 == byStage("2_normalized")._1)
    assert(byStage("2_normalized")._3 == byStage("3_near_dup")._1)
  }

  test("pagerank mass stays within damping bounds") {
    val rows = DedupOps.pagerank(spark, sf).collect()
    if (rows.nonEmpty) {
      // fixed-point truncation only loses mass: total <= Scale, and every
      // rank >= the damping floor
      val total = rows.map(_.getLong(1)).sum
      assert(total <= 1000000000L, s"rank mass exceeds Scale: $total")
      rows.foreach(r => assert(r.getLong(1) >= 0L))
    }
  }

  test("curriculum stages partition the corpus into ranks 1..N") {
    val rows = CorpusOps.curriculum(spark, sf).collect()
    val ranks = rows.map(_.getLong(2)).sorted
    assert(ranks.toSeq == (1L to rows.length).toSeq, "ranks not a permutation")
    val stages = rows.map(_.getLong(3))
    assert(stages.forall(s => s >= 1 && s <= 4))
    // stage is non-decreasing in rank
    val byRank = rows.sortBy(_.getLong(2)).map(_.getLong(3))
    assert(byRank.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("entropy is non-negative and bounded by ln(alphabet)") {
    val rows = TextOps.entropy(spark, sf).collect()
    rows.foreach { r =>
      val h = r.getDouble(2)
      // ln(distinct chars) <= ln(n); loose upper bound ln(n_chars)
      assert(h >= -1e-9, s"negative entropy $h for doc ${r.getLong(0)}")
      assert(h <= math.log(r.getLong(1).toDouble) + 1e-9)
    }
  }

  test("containment values lie in (0, 1] and imply shared shingles") {
    DedupOps.containment(spark, "/root/testdata/sf0.01").collect().foreach { r =>
      val (inter, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (cab, cba) = (r.getDouble(5), r.getDouble(6))
      assert(inter > 0 && inter <= math.min(nA, nB))
      assert(cab > 0 && cab <= 1.0 + 1e-9)
      assert(cba > 0 && cba <= 1.0 + 1e-9)
      assert(math.max(cab, cba) >= 0.9)
    }
  }

  test("perplexity = exp(-avg_logprob) within double accuracy") {
    TextOps.perplexity(spark, sf).collect().foreach { r =>
      val want = math.exp(-r.getDouble(2))
      val got = r.getDouble(3)
      assert(math.abs(got - want) / want < 1e-12,
        s"ppl mismatch: $got vs $want")
    }
  }

  test("attribution conserves purchases and value") {
    import org.apache.spark.sql.functions._
    val rows = EventOps.qAttribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), Exact.dsum(col("value"))).collect()(0)
    assert(rows.map(_.getLong(1)).sum == purchases.getLong(0),
      "attributed purchase count != total purchases")
    val attributed = rows.map(_.getDouble(2)).sum
    assert(math.abs(attributed - purchases.getDouble(1)) < 1e-6,
      s"attributed value $attributed != purchase total ${purchases.getDouble(1)}")
  }

  test("gaps-and-islands bounds: streaks partition active days") {
    import org.apache.spark.sql.functions._
    val rows = EventOps.qGapsIslands(spark, sf).collect()
    rows.foreach { r =>
      val (days, streaks, longest) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(streaks >= 1 && longest >= 1)
      assert(longest <= days, s"longest $longest > active days $days")
      assert(streaks <= days, s"more streaks than days")
    }
    val distinctDays = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == distinctDays,
      "islands do not partition the distinct (user, day) set")
  }

  test("funnel timing is consistent with the funnel counts") {
    val times = EventOps.qFunnelTime(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val funnel = EventOps.qEventFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    times.foreach { case (step, (med, p90, n)) =>
      assert(med >= 0 && p90 >= med, s"$step: p90 $p90 < median $med")
      // step k's timed population == users the funnel counts at depth >= k
      val k = step.substring(0, 1).toInt
      assert(n == funnel(k.toLong), s"$step: timed $n != funnel ${funnel(k.toLong)}")
    }
  }

  test("skew report: event_type is hot, user_id near-uniform; totals conserve") {
    val rows = ValidationOps.skew(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    val total = Tables.events(spark, sf).count()
    rows.values.foreach { case (n, k, mx, ratio) =>
      assert(n == total, "melt lost rows")
      assert(mx * k >= n, "max*keys < total is impossible")
      assert(ratio >= 1.0 - 1e-9)
    }
    // the event-type domain is fixed (5 values at any SF); day keys are
    // bounded by the 30-day generation window
    assert(rows("event_type")._2 <= 8)
    assert(rows("day")._2 <= 31)
  }

  test("knn graph: ranks are 1..k per vector, cosine non-increasing, no self-edges") {
    val rows = SimilarityOps.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (a, es) =>
      val sorted = es.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to es.length), s"ranks not 1..k for $a")
      assert(es.length <= 3)
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0)._3 >= p(1)._3 - 1e-12), s"cosine not sorted for $a")
      es.foreach { case (x, b, _, _) => assert(x != b, "self-edge") }
    }
  }

  test("textrank mass stays within damping bounds; nodes are vocabulary words") {
    val rows = TextOps.textrank(spark, sf).collect()
    if (rows.nonEmpty) {
      // fixed-point truncation only loses mass (same law as d_pagerank)
      assert(rows.map(_.getLong(1)).sum <= 1000000000L)
      rows.foreach(r => assert(r.getLong(1) >= 0L))
      // every ranked word really occurs in the corpus
      val toks = Tables.documents(spark, sf)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("split(text, ' ')")).as("tok"))
        .distinct().collect().map(_.getString(0)).toSet
      rows.foreach(r => assert(toks.contains(r.getString(0))))
    }
  }

  test("A/B arms partition users; z sign is antisymmetric") {
    val rows = EventOps.qAbTest(spark, sf).collect()
    assert(rows.length == 2)
    val users = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == users, "arms do not partition users")
    rows.foreach { r =>
      val (nu, nc, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nc <= nu)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the two rows measure the same contrast from opposite sides
    if (!rows(0).isNullAt(7)) {
      val z = rows.map(_.getDouble(7))
      assert(math.abs(z(0) + z(1)) < 1e-9, s"z not antisymmetric: ${z.mkString(",")}")
      val lifts = rows.map(_.getDouble(6))
      assert(math.abs(lifts(0) + lifts(1)) < 1e-12)
    }
  }

  test("anomaly flag agrees with the reported z at the 2-sigma gate") {
    val rows = ValidationOps.anomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val (z, flag) = (r.getDouble(3), r.getBoolean(4))
        // integer flag must agree with |z| > 2 except exactly at the
        // boundary (where the integer compare is the authority)
        if (math.abs(math.abs(z) - 2.0) > 1e-9)
          assert(flag == (math.abs(z) > 2.0), s"flag $flag disagrees with z=$z")
      }
    }
  }

  test("PSI drift of a source against itself would be zero: corpus PSI small for uniform split") {
    // weaker but input-independent law: every PSI is non-negative (the
    // add-one smoothed form is a sum of (p-q)ln(p/q) terms, each >= 0)
    ValidationOps.drift(spark, sf).collect().foreach { r =>
      assert(r.getDouble(2) >= -1e-9, s"negative PSI for ${r.getString(0)}")
    }
  }

  test("KL divergence of every source vs corpus is finite; n_tokens sums to corpus") {
    val rows = ValidationOps.klSources(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = TextOps.tokenStats(spark, sf).collect().map(_.getLong(1)).sum
    assert(total == corpus, s"token totals disagree: $total vs $corpus")
    rows.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }
}
