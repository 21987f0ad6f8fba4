package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Sanity spec per declared operator: every SparkEntry query runs on the
  * sf0.001 testdata, produces a stable schema and (for the non-filtered
  * ones) non-empty output. Exact values are covered by the DuckDB oracle
  * gate (tools/local_verify.py); these tests guard the Scala surface. */
class OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Queries whose output may legitimately be empty at tiny scale (pair
  // thresholds / selective filters).
  private val mayBeEmpty = Set("d_ngram_jaccard", "d_minhash_lsh",
    "d_simhash_pairs", "d_embedding_neardup", "q_anti_join")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("exact dedup keeps the smallest doc_id per hash") {
    val rows = DedupOps.exactDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 1L))
  }

  test("simhash pairs respect the hamming threshold") {
    DedupOps.simhashPairs(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) <= 3)
    }
  }

  test("cosine topk ranks are dense per query") {
    val rows = SimilarityOps.cosineTopk(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      // cosine non-increasing with rank
      val sorted = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }
}
