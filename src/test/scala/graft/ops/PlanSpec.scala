package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Physical-plan guards for the properties that make these plans survive a
  * 100× scale-up: column pruning reaching the parquet scan, predicate
  * pushdown, broadcast of small join sides, no cartesian products, and
  * whole-stage codegen in the hot paths. These assert plan SHAPE (the
  * oracle gate asserts values); a regression here silently multiplies IO
  * or shuffle volume long before it changes any answer. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  private def readSchemas(p: String): Seq[String] =
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq

  test("q_topk scan prunes to exactly the three projected columns") {
    val schemas = readSchemas(plan("q_topk"))
    assert(schemas.nonEmpty)
    val cols = schemas.head.split(",").map(_.split(":")(0)).toSet
    assert(cols == Set("l_orderkey", "l_linenumber", "l_extendedprice"),
      s"scan reads $cols")
  }

  test("d_exact_dedup scan prunes to doc_id and text") {
    val cols = readSchemas(plan("d_exact_dedup")).head
      .split(",").map(_.split(":")(0)).toSet
    assert(cols == Set("doc_id", "text"), s"scan reads $cols")
  }

  test("q_json_extract pushes the event_id range filter into the scan") {
    val p = plan("q_json_extract")
    assert(p.contains("PushedFilters: [") && p.contains("LessThan(event_id"),
      s"no pushed filter in:\n${p.take(2000)}")
  }

  test("q5_star_join broadcasts the dimension tables") {
    val p = plan("q5_star_join")
    assert(p.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(!p.contains("CartesianProduct"), "cartesian product appeared")
  }

  test("s_cosine_topk broadcasts the query side, never the corpus") {
    val p = plan("s_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"), "cartesian product appeared")
  }

  test("dedup hot paths stay inside whole-stage codegen") {
    // AQE's unfinalized plan string hides codegen spans — assert on the
    // statically compiled plan instead.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("d_minhash_lsh", "d_simhash_pairs", "d_ngram_jaccard")) {
        val p = plan(q)
        // codegen'd operators print with a `*(n)` stage prefix
        assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined,
          s"$q fell out of codegen:\n${p.take(1500)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q_not_in_notnull plans a hash anti join, not a nested loop") {
    val p = plan("q_not_in_notnull")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"known-not-null NOT IN still nested-loops:\n${p.take(1200)}")
    assert(p.contains("LeftAnti"), s"anti join missing:\n${p.take(1200)}")
  }

  test("s_ivf_topk assignment is a narrow scan (no shuffle before the probe join)") {
    val p = plan("s_ivf_topk")
    // the corpus side must be scan → project (argmax over inlined
    // centroids) → join; a shuffle before the join would mean the
    // assignment pass lost its narrowness
    assert(p.contains("vec_dot"), "inlined centroid scores missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("s_kmeans assignment pass is narrow: no Exchange, no Window, no join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cents = (0L until 4L).map(c => (c, Seq.tabulate(64)(i => (c + i).toDouble)))
    val p = SimilarityOps.kmeansAssign(emb, cents)
      .queryExecution.executedPlan.toString
    for (bad <- Seq("Exchange", "Window", "Join", "CartesianProduct"))
      assert(!p.contains(bad), s"assignment pass contains $bad:\n${p.take(1500)}")
    assert(p.contains("vec_dot"), "inlined centroid scores missing")
  }

  test("t_fingerprint scans documents exactly once") {
    val p = plan("t_fingerprint")
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected 1 documents scan, saw $scans:\n${p.take(1500)}")
  }

  test("t_cms_topk probes a one-row broadcast grid, no per-row joins") {
    val p = plan("t_cms_topk")
    assert(p.contains("BroadcastExchange"), s"grid not broadcast:\n${p.take(1500)}")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"per-row grid join survived the map-probe rewrite:\n${p.take(1500)}")
  }

  test("d_span_coverage scans documents ONCE and shuffles on the shingle key") {
    val p = plan("d_span_coverage")
    assert(!p.contains("CartesianProduct"))
    // single shingling pass: the df count is a window over the exploded
    // rows, not a self-join that re-executes the scan→shingle subtree
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected 1 documents scan, saw $scans:\n${p.take(1500)}")
    assert(!p.contains("Join"), s"df self-join crept back:\n${p.take(1500)}")
    assert(p.contains("hashpartitioning(sh"),
      s"shingle-df window lost its uniform-key shuffle:\n${p.take(1500)}")
  }

  test("d_paragraph_dedup scans documents ONCE and shuffles on the paragraph hash") {
    val p = plan("d_paragraph_dedup")
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected 1 documents scan, saw $scans:\n${p.take(1500)}")
    assert(!p.contains("Join"), s"occurrence-count self-join crept in:\n${p.take(1500)}")
    assert(p.contains("hashpartitioning(ph"),
      s"paragraph-count window lost its uniform-key shuffle:\n${p.take(1500)}")
  }

  test("t_quality_gate is one pruned scan with no data shuffle") {
    val p = plan("t_quality_gate")
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected 1 documents scan, saw $scans:\n${p.take(1500)}")
    assert(!p.contains("Join"), s"gate grew a join:\n${p.take(1500)}")
    // the sorted-run fold keeps the repeated-token rule narrow: the only
    // exchange is the oracle-ordering rangepartitioning
    assert(!p.contains("hashpartitioning"),
      s"narrow gate grew a data shuffle:\n${p.take(1500)}")
    val cols = readSchemas(p).head.split(",").map(_.split(":")(0)).toSet
    assert(cols == Set("doc_id", "text"), s"scan reads $cols")
  }

  test("d_source_overlap scans documents ONCE, no joins (kind-tagged keys + windows)") {
    val p = plan("d_source_overlap")
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected 1 documents scan, saw $scans:\n${p.take(1500)}")
    assert(!p.contains("Join"),
      s"per-source totals re-grew a join (second scan path):\n${p.take(1500)}")
    assert(p.contains("hashpartitioning(sh"),
      s"posting-list rollup lost its uniform shingle-key shuffle:\n${p.take(1500)}")
  }

  test("s_pq_encode is one pruned scan with a narrow codegen'd assignment") {
    val p = plan("s_pq_encode")
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected 1 embeddings scan, saw $scans:\n${p.take(1500)}")
    assert(!p.contains("Join") && !p.contains("hashpartitioning"),
      s"compress-on-ingest pass grew a join/shuffle:\n${p.take(1500)}")
    // r15: the assignment is the native pq_argmin kernel (one tight loop
    // over the folded codebook) — the old array_min(named_struct(
    // vec_dot(slice))) spelling allocated 2K objects per subspace per
    // row, the 100x probe's dominant PQ constant
    assert(p.contains("pq_argmin"), "native codebook argmin kernel missing")
    assert(!p.contains("named_struct"),
      s"the struct-allocating argmin spelling crept back:\n${p.take(1500)}")
  }

  test("s_pq_adc broadcasts the query LUTs and bounds top-k before the shuffle") {
    val p = plan("s_pq_adc")
    assert(p.contains("BroadcastExchange"), s"query LUTs not broadcast:\n${p.take(1500)}")
    // r10: the rank window is gone entirely — the bounded top_k
    // aggregate keeps <= k structs per map task (partial_top_k below
    // the q_id exchange), so no sort partition ever sees corpus-sized
    // input and no Window/WindowGroupLimit operator exists at all
    assert(p.contains("partial_collect_top_k") && !p.contains("Window"),
      s"bounded top-k partial aggregation missing:\n${p.take(1500)}")
    // pqEncode's oracle ordering must be optimized away under the join
    val sorts = "rangepartitioning".r.findAllMatchIn(p).size
    assert(sorts == 1, s"a redundant global sort survived:\n${p.take(1500)}")
  }

  test("t_mix_weights broadcasts the one-row denominator, never a sort-merge join") {
    val p = plan("t_mix_weights")
    assert(p.contains("BroadcastExchange"), s"denominator not broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("e_zorder stats row is broadcast onto a narrow projection") {
    val p = plan("e_zorder")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"stats row not broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"))
  }

  test("correlated subqueries decorrelate to joins — never cartesians") {
    // the SubqueryOps contract: Catalyst rewrites every correlated
    // sub-select into aggregate-plus-join / semi / anti joins; a
    // CartesianProduct (or any surviving per-row subquery shape) here
    // means decorrelation failed and the query is n² at scale
    for (q <- SubqueryOps.queries.keys) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian")
      // CORRELATED sub-selects must become joins; uncorrelated scalar
      // subqueries (q_share_having's global total, q_top_supplier's max)
      // correctly stay one-shot Subquery nodes instead
      assert(p.contains("Join") || p.contains("Subquery"),
        s"$q has neither a join nor a scalar subquery node")
    }
    for (q <- Seq("q_corr_min", "q_corr_avg", "q_corr_exists", "q_corr_in",
        "q_rich_idle"))
      assert(plan(q).contains("Join"), s"$q not decorrelated to a join")
    // the lateral ORDER BY+LIMIT must become a partitioned window rank
    // filter (top-N per group), never per-outer-row re-execution
    val lat = plan("q_lateral_topk")
    assert(lat.contains("Window") && lat.contains("Join"),
      s"lateral top-2 not decorrelated to window+join:\n${lat.take(1200)}")
    // the predicate-subquery family must become semi/anti joins
    assert(plan("q_corr_exists").contains("LeftSemi"), "EXISTS not a semi join")
    assert(plan("q_corr_in").contains("LeftSemi"), "IN not a semi join")
    assert(plan("q_rich_idle").contains("LeftAnti"), "NOT EXISTS not an anti join")
  }
}
