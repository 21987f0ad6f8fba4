package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-11 invariants. Centerpiece: the dedup clustering is now the
  * two-phase large-star/small-star contraction (log-round regardless of
  * component diameter) — the path-graph fixture that needed diameter
  * (~99) rounds under round-10's min-label propagation converges in a
  * handful, and the (doc_id, cluster_id = component min) contract is
  * pinned against a driver-side union-find on both structured and
  * pseudo-random graphs.
  */
class R11InvariantSpec extends SparkSpec {

  /** Exact reference clustering: driver-side union-find (path-halving +
    * union-by-min so the representative IS the component min). */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    import spark.implicits._
    DedupOps.dedupClustersFrom(pairs.toDF("a_id", "b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("CC converges on a 100-node path graph (diameter >> round cap)") {
    // 0-1-2-...-99: ONE component, min id 0. Min-label propagation needs
    // ~99 rounds here (> the 50-round cap); large-star/small-star must
    // close it in O(log n).
    val pairs = (0L until 99L).map(i => (i, i + 1))
    val got = ccOf(pairs)
    assert(got.size == 100)
    assert(got.forall(_._2 == 0L), s"path graph must collapse to root 0")
  }

  test("CC on a 1000-node path and a deep binary tree stay log-round") {
    val path = (0L until 999L).map(i => (i, i + 1))
    assert(ccOf(path).forall(_._2 == 0L))
    // complete binary tree on 255 nodes (parent i -> children 2i+1, 2i+2)
    val tree = (0L until 127L).flatMap(i => Seq((i, 2 * i + 1), (i, 2 * i + 2)))
    assert(ccOf(tree).forall(_._2 == 0L))
  }

  test("CC == union-find on mixed component shapes") {
    // pair, triangle, 6-chain, star, two singleton-free isolated edges,
    // written with non-contiguous ids and both edge orientations
    val pairs = Seq(
      (10L, 11L),                                  // pair
      (20L, 21L), (21L, 22L), (20L, 22L),          // triangle
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L), (34L, 35L), // chain
      (41L, 40L), (42L, 40L), (43L, 40L),          // star (reversed edges)
      (50L, 51L), (60L, 61L))
    val expect = unionFind(pairs).toSeq.sorted
    assert(ccOf(pairs) == expect)
  }

  test("CC == union-find on pseudo-random graphs (property check)") {
    // deterministic LCG so the fixture is reproducible cross-run
    var seed = 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val m = n * 2
      val pairs = (0 until m).map(_ => (next(n).toLong, next(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = unionFind(pairs).toSeq.sorted
      assert(ccOf(pairs) == expect, s"trial $trial (n=$n) diverged")
    }
  }

  test("CC handles an empty pair relation and duplicate/reversed edges") {
    import spark.implicits._
    assert(DedupOps.dedupClustersFrom(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).count() == 0)
    // the same edge three ways must not perturb the labeling
    val pairs = Seq((5L, 9L), (9L, 5L), (5L, 9L), (9L, 12L))
    assert(ccOf(pairs) == Seq((5L, 5L), (9L, 5L), (12L, 5L)))
  }
}
