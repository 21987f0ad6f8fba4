package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Round-9 continuation invariants: the edit-distance dedup tier
  * (`d_fuzzy_pairs`), cluster-size histogram (`d_cluster_stats`),
  * first-occurrence novelty (`t_novelty`), session path mining
  * (`e_paths`), and the pair-free diversity identity (`s_diversity`).
  * Each is proven against either a brute-force recomputation or a
  * conservation law the op must satisfy by construction. */
class R9ExtendSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  /** Classic O(n·m) Levenshtein DP — the spec's independent referee. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("d_fuzzy_pairs: every reported pair agrees with a reference DP") {
    graft.GraftSession.init(spark)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = DedupOps.fuzzyPairs(spark, sf).collect()
    assert(rows.nonEmpty, "vacuous: no fuzzy pairs at this SF")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val want = lev(texts(a), texts(b))
      assert(r.getLong(2) == want, s"lev($a,$b): got ${r.getLong(2)}, DP $want")
      val mx = math.max(texts(a).length, texts(b).length).toLong
      assert(r.getDouble(3) == (mx - want).toDouble / mx, s"sim($a,$b)")
    }
  }

  test("d_fuzzy_pairs composition: fuzzyPairsFrom(persisted) == standalone") {
    graft.GraftSession.init(spark)
    val pairs = DedupOps.pairCounts(spark, sf, DedupOps.DefaultMaxDf)
      .localCheckpoint()
    val composed = DedupOps
      .fuzzyPairsFrom(Tables.documents(spark, sf), pairs).collect().toSeq
    val standalone = DedupOps.fuzzyPairs(spark, sf).collect().toSeq
    assert(composed == standalone)
  }

  test("d_fuzzy_pairs: catches the heavy-typo pair the Jaccard tier drops") {
    graft.GraftSession.init(spark)
    // 30 distinct 5-char tokens; B typos tokens 10 and 20 by one inserted
    // char each. Shingle damage: 3 shingles per typo'd token → Jaccard
    // 22/34 ≈ 0.65 — BELOW the 0.8 near-dup cut, above the 0.5 candidate
    // gate. Char damage: lev = 2 over ~180 chars → sim ≈ 0.989.
    val toks = (0 until 30).map(i => f"tok$i%03d")
    val a = toks.mkString(" ")
    val b = toks.zipWithIndex
      .map { case (t, i) => if (i == 10 || i == 20) t + "x" else t }
      .mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_fix").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val rows = Seq((1L, a), (2L, b)).map { case (id, t) =>
      org.apache.spark.sql.Row(id, t, t.length.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$dir/documents.parquet")
    // tier gap, through the DECLARED query functions on the fixture dir
    val jac = graft.SparkEntry.queries("d_ngram_jaccard")(spark, dir).collect()
    assert(jac.isEmpty, s"Jaccard tier unexpectedly kept the pair: ${jac.toSeq}")
    val fz = graft.SparkEntry.queries("d_fuzzy_pairs")(spark, dir).collect()
    assert(fz.length == 1 && fz(0).getLong(0) == 1L && fz(0).getLong(1) == 2L)
    assert(fz(0).getLong(2) == 2L, s"expected lev 2, got ${fz(0).getLong(2)}")
    assert(fz(0).getDouble(3) >= 0.98)
  }

  test("d_cluster_stats: brute-force histogram + conservation") {
    graft.GraftSession.init(spark)
    val clusters = DedupOps.dedupClusters(spark, sf).localCheckpoint()
    val want = clusters.collect().groupBy(_.getLong(1)).values
      .map(_.length).toSeq.groupBy(identity).map { case (s, g) =>
        (s.toLong, g.length.toLong, s.toLong * g.length)
      }.toSeq.sortBy(_._1)
    val got = DedupOps.clusterStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.forall(_._1 >= 2), "a pair-graph cluster of size < 2 exists")
    assert(got.map(_._3).sum == clusters.count(), "doc conservation")
  }

  test("t_novelty: conservation and first-document novelty") {
    graft.GraftSession.init(spark)
    val out = TextOps.novelty(spark, sf).localCheckpoint()
    // every distinct corpus shingle first-occurs in exactly one document
    val distinctShingles = DedupOps
      .shinglePostings(Tables.documents(spark, sf))
      .select("sh").distinct().count()
    val sums = out.agg(sum("n_novel"), min("doc_id")).collect()(0)
    assert(sums.getLong(0) == distinctShingles, "novelty credit conservation")
    // the earliest doc (by id) has nothing before it: novelty exactly 1
    val firstDoc = out.filter(col("doc_id") === sums.getLong(1)).collect()(0)
    assert(firstDoc.getDouble(3) == 1.0, s"first doc novelty: $firstDoc")
    // range sanity on the whole column
    assert(out.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
  }

  test("e_paths: trigram count conservation vs qSessionize") {
    graft.GraftSession.init(spark)
    val total = EventOps.qPaths(spark, sf).agg(sum("n")).collect()(0).getLong(0)
    // each session of n events contributes max(0, n-2) in-session trigrams
    val want = EventOps.qSessionize(spark, sf)
      .select(greatest(col("n_events") - 2, lit(0L)).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(total == want, s"trigrams $total != sessions' $want")
    assert(total > 0, "vacuous: no in-session trigrams at this SF")
  }

  test("e_gini: tie-block closed form equals the brute-force rank formula") {
    graft.GraftSession.init(spark)
    val xs = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1)).sorted
    val n = BigInt(xs.length)
    val sx = xs.map(BigInt(_)).sum
    val s1 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val want = (BigInt(2) * s1 - (n + 1) * sx).toDouble / (n * sx).toDouble
    val r = EventOps.qGini(spark, sf).collect()(0)
    assert(r.getLong(0) == xs.length && r.getLong(1) == sx.toLong)
    assert(r.getDouble(2) == want, s"gini ${r.getDouble(2)} != brute $want")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("v_lang_entropy: bounds and conservation") {
    graft.GraftSession.init(spark)
    val rows = ValidationOps.langEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "doc conservation")
    rows.foreach { r =>
      val (nl, h, eff) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      // 0 ≤ H ≤ ln(n_langs); 1 ≤ exp(H) ≤ n_langs — DetMath ln/exp and
      // the 1e-9 term ledger are within ~1e-9 of the real values
      assert(h >= -1e-9 && h <= math.log(nl.toDouble) + 1e-9, s"H bounds: $r")
      assert(eff >= 1.0 - 1e-9 && eff <= nl.toDouble + 1e-6, s"eff bounds: $r")
    }
  }

  test("s_diversity: identity equals brute-force pairwise mean cosine") {
    graft.GraftSession.init(spark)
    // brute force over the SAME floor-quantized unit vectors, exact BigInt
    val vecs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray
        var nsq = 0.0
        e.foreach(x => nsq += x.toDouble * x.toDouble)
        val nrm = math.sqrt(nsq)
        (r.getInt(0), e.map(x => math.floor(1e6 * (x.toDouble / nrm)).toLong))
      }
    val want = vecs.groupBy(_._1).collect { case (label, g) if g.length >= 2 =>
      val qs = g.map(_._2)
      val s2 = (0 until qs(0).length).map { p =>
        val sp = BigInt(qs.map(_(p)).sum); sp * sp
      }.sum
      val sq = BigInt(qs.map(q => q.map(x => x * x).sum).sum)
      val n = qs.length.toLong
      label -> (s2 - sq).toDouble / (n * (n - 1)).toDouble / 1e12
    }
    val got = SimilarityOps.diversity(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (label, m) =>
      assert(got(label) == m, s"label $label: got ${got(label)}, brute $m")
      assert(m > -1.0 - 1e-9 && m < 1.0 + 1e-9)
    }
  }
}
