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
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, s"effect: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"share: $r")
    }
    val tot = rows.map(_.getDouble(3)).sum
    assert(tot == 0.0 || math.abs(tot - 1.0) < 1e-9, s"shares sum to $tot")
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
