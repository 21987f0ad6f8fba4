package graft.ops

import graft.SparkSpec

/** Round-8 cross-formulation invariants: independent implementations of
  * the same semantics must agree, so a regression in either formulation
  * (or a Spark upgrade changing an operator's semantics) fails here with
  * the divergence, not just a hash mismatch downstream. */
class R8InvariantSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q_session_window == q_sessionize modulo the end+gap convention") {
    graft.GraftSession.init(spark)
    val gapMs = 30L * 60 * 1000
    // lag/sum formulation: (user, start, end) with end = last event ts
    val viaWindows = EventOps.qSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).getTime,
        r.getTimestamp(4).getTime + gapMs, r.getLong(2))).toSet
    // native operator: end = last event ts + gap
    val viaOperator = EventOps.qSessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(viaOperator == viaWindows,
      s"missing=${(viaWindows -- viaOperator).take(3)} " +
        s"extra=${(viaOperator -- viaWindows).take(3)}")
  }

  test("e_markov_removal: effects in [0,1], attribution sums to ~1") {
    graft.GraftSession.init(spark)
    val rows = EventOps.qMarkovRemoval(spark, sf).collect()
    // one attribution row per observed non-purchase event type — the
    // channel catalog is DERIVED from the data (ADVICE r8), so compute
    // the expectation from the same events table, not a hardcoded 4
    val expected = Tables.events(spark, sf)
      .select("event_type").distinct().collect()
      .map(_.getString(0)).filterNot(_ == "purchase").sorted
    assert(rows.map(_.getString(0)).toSeq == expected.toSeq,
      s"channels ${rows.map(_.getString(0)).mkString(",")} != observed " +
        s"${expected.mkString(",")}")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, s"effect: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"share: $r")
    }
    val tot = rows.map(_.getDouble(3)).sum
    assert(tot == 0.0 || math.abs(tot - 1.0) < 1e-9, s"shares sum to $tot")
  }

  test("e_retention: week-0 rate is exactly 1, later weeks never exceed it") {
    graft.GraftSession.init(spark)
    val rows = EventOps.qRetention(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (weekN, rate) =>
      if (weekN == 0L) assert(rate == 1.0, s"week-0 rate $rate")
      else assert(rate > 0.0 && rate <= 1.0, s"week $weekN rate $rate")
    }
  }

  test("e_basket: pairs are oriented, support consistent, lift positive") {
    graft.GraftSession.init(spark)
    // sf0.01: sf0.001 has no pair reaching the support floor
    val rows = EventOps.qBasket(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"unoriented pair: $r")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        s"support exceeds an item count: $r")
      assert(r.getDouble(5) > 0.0, s"non-positive lift: $r")
    }
  }

  test("e_ewma: within [min, max] of its trailing window and exact at m=1") {
    graft.GraftSession.init(spark)
    val rows = EventOps.qEwma(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // first observed day per type: EWMA over a single value IS the value
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.head._3 == rs.head._2.toDouble, s"first-day ewma: ${rs.head}")
    }
  }
}
