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
