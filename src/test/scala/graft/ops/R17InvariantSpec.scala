package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 invariants: the trained-blocking tier (r16 verdict ask #1)
  * and the pq_argmink kernel it rides — the trainer's two spellings are
  * bit-equal, the kernel's prefix equals its siblings, probe recall is
  * monotone, and a planted-blob fixture proves the trainer recovers
  * structure a random codebook has no way to see (the gate corpora are
  * isotropic, where trained ≈ random is the honest — and measured —
  * ceiling). */
class R17InvariantSpec extends SparkSpec {

  private def rootCause(t: Throwable): Throwable = {
    var c = t
    while (c.getCause != null && (c.getCause ne c)) c = c.getCause
    c
  }

  test("pq_argmink: positions 0/1 bit-equal pq_argmin/pq_argmin2 and the" +
      " full array equals the sorted-chain prefix on random vectors;" +
      " fail-loud on k out of range") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val emb = Seq.tabulate(300)(i =>
        (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val cents = Seq.tabulate(6)(j =>
      Seq.tabulate(8)(i => (j * 19 + i * 5) % 11 - 5))
    def dlit(d: Double) = {
      val s = d.toString; if (s.contains("E")) s else s + "D"
    }
    val flat = cents.flatMap { c =>
      val nrm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      0.0 +: c.map(x => x.toDouble / (2.0 * nrm))
    }.map(dlit).mkString(", ")
    val chain = (0 until 6).map { j =>
      val nrm = math.sqrt(cents(j).map(x => x.toDouble * x.toDouble).sum)
      val comps = cents(j).map(c => dlit(c.toDouble / (2.0 * nrm)))
        .mkString(", ")
      s"named_struct('d', 0.0D - 2.0D * vec_dot(embedding, array($comps)), 'j', ${j}L)"
    }.mkString(", ")
    val rows = emb.select(
      expr(s"pq_argmink(embedding, array($flat), 0, 8, 4)").as("kk"),
      expr(s"pq_argmin(embedding, array($flat), 0, 8)").as("k1"),
      expr(s"pq_argmin2(embedding, array($flat), 0, 8)").as("k2"),
      expr(s"transform(array_sort(array($chain)), s -> s.j)").as("sorted"))
      .collect()
    rows.foreach { r =>
      val kk = r.getSeq[Long](0)
      assert(kk.size == 4, s"pq_argmink must return exactly k codes: $r")
      assert(kk(0) == r.getLong(1), s"position 0 != pq_argmin: $r")
      assert(kk(1) == r.getLong(2), s"position 1 != pq_argmin2: $r")
      assert(kk == r.getSeq[Long](3).take(4),
        s"pq_argmink drifted from the sorted-chain prefix: $r")
    }
    // k out of range (codebook has 6 codewords): fail-loud
    val thrown = intercept[Throwable] {
      emb.select(expr(s"pq_argmink(embedding, array($flat), 0, 8, 7)"))
        .collect()
    }
    assert(rootCause(thrown).getMessage.contains("out of range"))
  }

  test("lloydCodebook (kernel spelling, arbitrary K) reproduces" +
      " kmeansCentroids (literal-struct spelling) exactly at the gate's" +
      " K — the two assignment spellings are one arithmetic") {
    graft.GraftSession.init(spark)
    val sf = "/root/testdata/sf0.001"
    val a = SimilarityOps.kmeansCentroids(spark, sf)
    val b = SimilarityOps.lloydCodebook(
      Tables.embeddings(spark, sf), SimilarityOps.KmK)
    assert(a == b,
      s"kernel-spelling Lloyd drifted from the gate spelling:\n$a\nvs\n$b")
  }

  test("trained codebook recovers planted blob structure: every" +
      " intra-blob pair survives probe-1 blocking at K = blobs, and the" +
      " trained arm catches at least what the random codebook does") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val nBlobs = 16
    val per = 8
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Seq.fill(nBlobs)(unit(Array.fill(64)(rnd.nextGaussian())))
    // vec_id = m * nBlobs + b: ids 0..15 are one per blob, so the Lloyd
    // seed (first K vectors) starts one centroid inside each blob
    val rows = for (b <- 0 until nBlobs; m <- 0 until per) yield {
      val e = unit(centers(b).map(x => x + 0.05 * rnd.nextGaussian()))
      ((m * nBlobs + b).toLong, e.map(_.toFloat).toSeq, b)
    }
    val emb = rows.toDF("vec_id", "embedding", "blob")
      .select(col("vec_id"), col("embedding"))
    val intra = (for {
      b <- 0 until nBlobs
      i <- 0 until per; j <- (i + 1) until per
    } yield (math.min(i * nBlobs + b, j * nBlobs + b).toLong,
        math.max(i * nBlobs + b, j * nBlobs + b).toLong)).toSet
    def caughtIntra(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      pairs.select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(intra)
    val trained = caughtIntra(
      DedupOps.nearDupPairsCellsTrained(emb, nCells = nBlobs, probes = 1))
    val random = caughtIntra(
      DedupOps.nearDupPairsCellsProbeK(emb, nCells = nBlobs, probes = 1))
    assert(trained == intra,
      s"trained probe-1 blocking must keep every blob whole; missed " +
        s"${(intra -- trained).size} of ${intra.size} intra-blob pairs")
    assert(random.size <= trained.size,
      "random codebook cannot beat the blob-converged trained one here")
    // the fixture is only meaningful if random blocking actually SPLITS
    // blobs (otherwise the test proves nothing about training)
    assert(random.size < intra.size,
      "fixture degenerated: the random codebook kept every blob whole")
  }

  test("recall grid: probe recall is monotone per codebook, the random" +
      " rows agree with d_neardup_recall, and the occ-512 arm holds the" +
      " same invariants") {
    graft.GraftSession.init(spark)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val grid = DedupOps.nearDupRecallGrid(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      for (cb <- Seq("random", "trained")) {
        assert(grid((cb, 2L)) >= grid((cb, 1L)) &&
            grid((cb, 4L)) >= grid((cb, 2L)),
          s"probe recall must be monotone for $cb at $sf: $grid")
      }
      val rec = DedupOps.nearDupRecall(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rec(1L) == grid(("random", 1L)) &&
          rec(2L) == grid(("random", 2L)),
        s"grid random rows must equal d_neardup_recall at $sf")
    }
    val g512 = DedupOps.nearDupRecallGridAt(spark,
        "/root/testdata/sf0.001", 512L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    for (cb <- Seq("random", "trained"))
      assert(g512((cb, 2L)) >= g512((cb, 1L)) &&
          g512((cb, 4L)) >= g512((cb, 2L)),
        s"occ-512 probe recall must be monotone for $cb: $g512")
  }
}
