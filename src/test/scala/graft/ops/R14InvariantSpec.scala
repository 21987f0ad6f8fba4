package graft.ops

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
