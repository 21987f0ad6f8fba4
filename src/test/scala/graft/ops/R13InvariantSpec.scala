package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 operator invariants: constructed-fixture contracts the gate
  * corpus can't reach. */
class R13InvariantSpec extends SparkSpec {

  test("d_fuzzy_pairs: the bounded DP keeps the exactly-sim=0.8 boundary" +
      " pair when maxlen is a multiple of 5 (rational k, not double)") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // maxlen = 5, lev = 1 → sim = 0.8 EXACTLY. The correct abandon bound
    // is k = ⌊5·1/5⌋ = 1; deriving it as ⌊5·(1−0.8)⌋ in doubles gives
    // ⌊0.9999…8⌋ = 0 and the threshold DP would emit the −1 sentinel,
    // silently dropping a pair the sim filter accepts.
    val docs = Seq((1L, "aaaaa", 5L), (2L, "aaaab", 5L),
      // maxlen = 10, lev = 3 > k = 2 → must be dropped (sentinel path)
      (3L, "bbbbbbbbbb", 10L), (4L, "bxbbbxbbxb", 10L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L, 3L, 3L, 3L), (3L, 4L, 8L, 8L, 8L))
      .toDF("a_id", "b_id", "inter", "n_a", "n_b")
    val out = DedupOps.fuzzyPairsFrom(docs, pairs).collect()
    assert(out.length == 1, s"expected only the boundary pair: ${out.toSeq}")
    assert(out(0).getAs[Long]("a_id") == 1L &&
      out(0).getAs[Long]("b_id") == 2L)
    assert(out(0).getAs[Long]("lev") == 1L)
    assert(out(0).getAs[Double]("sim") == 0.8)
  }

  test("d_fuzzy_pairs: beyond-bound pairs drop identically to the" +
      " unbounded sim filter (sentinel never leaks a fake similarity)") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    // lev("abcdefghij","jihgfedcba") = 10 (full reversal), sim = 0 —
    // the sentinel −1 would read sim = 11/10 > 0.8 if it leaked.
    val docs = Seq((1L, "abcdefghij", 10L), (2L, "jihgfedcba", 10L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L, 8L, 8L, 8L))
      .toDF("a_id", "b_id", "inter", "n_a", "n_b")
    assert(DedupOps.fuzzyPairsFrom(docs, pairs).count() == 0)
  }
}
