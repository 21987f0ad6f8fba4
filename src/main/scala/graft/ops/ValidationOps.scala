package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling and constraint-validation operators — the Deequ-style
  * checks a training-data pipeline runs on every landed batch before it
  * spends GPU-hours on it. (Extensions beyond the reference — its only
  * validation is the zip error taxonomy, src/error.rs:4-104; these guard
  * the PRODUCED relation.)
  *
  * Oracle-exactness: every metric is exact integer counting or binary
  * min/max on strings/ints — no doubles anywhere, so the DuckDB replay is
  * trivially bit-identical.
  */
object ValidationOps {
  import Tables._

  /** Per-column profile of `documents`: null count, distinct count,
    * lexicographic/numeric min and max (rendered as strings so the five
    * columns share one schema). The first look a curator takes at a new
    * drop.
    *
    * Plan/scale: one pass — a single global aggregate over 4×5 partial
    * -aggregatable metrics; Spark plans multi-distinct via Expand (5×
    * row multiplication pre-shuffle, map-side combined). At 100 TB swap
    * the exact distincts for the HLL sketch (d_hll_distinct) — the
    * profile SHAPE stays one narrow agg either way. */
  def profile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        count_distinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val stacked = cols
      .map(c => s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
      .mkString(", ")
    documents(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.size}, $stacked) AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .orderBy("col_name")
  }

  /** Constraint suite over `documents` — one row per named constraint
    * with its violation count and verdict:
    *   - `doc_id_not_null`:  doc_id IS NOT NULL
    *   - `doc_id_unique`:    no doc_id occurs twice
    *   - `n_chars_consistent`: n_chars = length(text)
    *   - `lang_in_domain`:   lang ∈ {en, fr, es, de, zh}
    *   - `text_nonempty`:    length(text) > 0
    *
    * Plan/scale: the four row-local checks are ONE narrow aggregate pass;
    * uniqueness is its own partial-agg shuffle on the (uniform) key with
    * the >1 groups counted — no row data moves, only (key, count) pairs.
    * The union glues five 1-row aggregates: constant-size output. */
  def constraints(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val rowLocal = docs.agg(
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("doc_id_not_null"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_chars_consistent"),
      sum(when(!col("lang").isin("en", "fr", "es", "de", "zh"), 1L).otherwise(0L))
        .as("lang_in_domain"),
      sum(when(length(col("text")) <= 0, 1L).otherwise(0L)).as("text_nonempty"))
    val locals = rowLocal.select(expr(
      """stack(4,
           'doc_id_not_null',    doc_id_not_null,
           'n_chars_consistent', n_chars_consistent,
           'lang_in_domain',     lang_in_domain,
           'text_nonempty',      text_nonempty) AS (constraint_name, n_violations)"""))
    val unique = docs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_violations"))
      .select(lit("doc_id_unique").as("constraint_name"), col("n_violations"))
    locals.unionByName(unique)
      .select(col("constraint_name"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy("constraint_name")
  }

  /** Population-stability-index drift report: for every source, the PSI of
    * its document-length distribution against the whole corpus —
    *
    *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
    *
    * over 10 fixed-width n_chars buckets (width 250, top-capped), with
    * add-one smoothing so empty buckets stay finite. The standard batch
    * acceptance gate: PSI < 0.1 stable, > 0.25 drifted. ln is
    * [[DetMath]]'s deterministic log in the subtraction form
    * (ln a₁ − ln n_s) − (ln r₁ − ln N); the per-bucket terms go through
    * the scaled-BIGINT accumulator so the Σ is order-independent.
    *
    * Plan/scale: genuinely ONE scan. The (source, bucket) agg collapses
    * to a per-source bucket→count MAP (catalog-sized), the dense 10-
    * bucket grid explodes back out of that map (zero-count buckets
    * materialize their smoothed term without any join), and the corpus
    * bucket totals and grand total are WINDOW sums over the K×10 grid —
    * deriving them from the scan relation instead would re-expand the
    * scan per consumer (Catalyst does not reuse differently-keyed
    * exchanges). Buckets are data-independent constants — no quantile
    * pass, no global sort at any scale; every post-scan relation is
    * catalog × 10 rows. */
  def drift(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val joined = documents(s, d)
      .select(col("source"),
        expr("least(cast(n_chars as bigint) div 250, cast(9 as bigint))").as("b0"))
      .groupBy("source", "b0").agg(count(lit(1)).as("a0"))
      .groupBy("source").agg(
        map_from_entries(collect_list(struct(col("b0"), col("a0")))).as("m"),
        sum(col("a0")).as("n_s"))
      .select(col("source"), col("n_s"), col("m"),
        explode(expr("sequence(0L, 9L)")).as("b"))
      .withColumn("a", coalesce(expr("element_at(m, b)"), lit(0L)))
      .drop("m")
      .withColumn("r", sum(col("a")).over(w.partitionBy("b")))
      .withColumn("n_tot", sum(col("a")).over(w.partitionBy()))
      .withColumn("a1", col("a") + lit(1L))
      .withColumn("ns1", col("n_s") + lit(10L))
      .withColumn("r1", col("r") + lit(1L))
      .withColumn("nt1", col("n_tot") + lit(10L))
    val lns = Seq(("a1", "la"), ("ns1", "lns"), ("r1", "lr"), ("nt1", "lnt"))
      .foldLeft(joined) { case (df, (n, p)) => DetMath.withLn(df, n, p) }
    lns
      .withColumn("term", expr(
        "cast(round(((a1 / ns1 - r1 / nt1) * ((la_ln - lns_ln) - (lr_ln - lnt_ln))) * 1.0e9) as bigint)"))
      .groupBy("source", "n_s")
      .agg(sum(col("term")).as("st"))
      .select(col("source"), col("n_s").as("n_docs"),
        expr("(st / 1.0e9)").as("psi"))
      .orderBy("source")
  }

  /** TEMPORAL value drift: per event type, the PSI of the `value`
    * distribution in the second half of the type's calendar span
    * against the first half — the silent-unit-change detector
    * ([[drift]] catches per-SOURCE length drift at ingest; this
    * catches a producer changing value semantics MID-STREAM, which a
    * source-axis report never sees). Fixed width-25 bins top-capped at
    * 19 (data-independent — no quantile pass at any scale); the half
    * split is each type's calendar midpoint (the [[ksHalves]] device).
    * Instead of add-one smoothing, mass in bins PRESENT IN ONLY ONE
    * HALF is reported explicitly (`frac_only_pre`/`frac_only_post`) —
    * the "a whole new value regime appeared" signal smoothing blurs
    * into the PSI number — and PSI is computed over the shared-support
    * bins. drift flags psi > 0.2 (the standard act threshold) or > 5%
    * single-half mass.
    *
    * Exactness: ln(p/q) = ln(c1·n2) − ln(c2·n1) over BIGINT products
    * via [[DetMath]]; per-bin terms quantize to the 1e-9 BIGINT ledger
    * (order-free Σ); the 2^31 half-size envelope (products < 2^62) is
    * folded into the load-bearing term so both engines raise
    * identically. Bin = floor(value/25) through one IEEE division —
    * bit-identical both engines.
    *
    * Plan/scale: ONE scan → (type, day, bin) counts shuffle once on a
    * uniform key (the only data-sized pass); the half split comes from
    * type-key windows over that catalog × days × bins relation — NOT a
    * min/max branch re-scanning the input (the ksHalves two-scan shape
    * this operator deliberately improves on); everything after runs
    * over the catalog × 20-bin grid. */
  def valueDrift(s: SparkSession, d: String): DataFrame =
    valueDriftFrom(events(s, d)
      .select(col("event_type"), col("ts"), col("value")))

  /** [[valueDrift]] over a caller-supplied (event_type, ts, value)
    * relation — the testable core (identical halves ⇒ PSI exactly 0 and
    * no flag; a planted post-half shift ⇒ the hand-computed PSI and
    * single-half mass). The 2^31 envelope raise is not fixture-reachable
    * (the core takes raw rows, not counts) — the guard predicate is the
    * e_autocorr-audited pattern, shared verbatim with the oracle. */
  private[ops] def valueDriftFrom(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = ev.filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").as("dn"),
        // capped BOTH ends: without the bottom cap a negative value mints
        // an unbounded negative bin id and the per-type histogram
        // cardinality becomes value-range-dependent, breaking the
        // catalog × 20-bin grid scale contract (r14 advice)
        expr("greatest(least(CAST(floor(value / 25.0e0) AS BIGINT), 19L), 0L)")
          .as("bin"))
      .groupBy("event_type", "dn", "bin").agg(count(lit(1)).as("c"))
      .withColumn("lo", min(col("dn")).over(w.partitionBy("event_type")))
      .withColumn("hi", max(col("dn")).over(w.partitionBy("event_type")))
    val hist = base
      .withColumn("h", when(col("dn") * 2 <= col("lo") + col("hi"), 1)
        .otherwise(2))
      .groupBy("event_type", "bin")
      .agg(sum(when(col("h") === 1, col("c")).otherwise(0L)).as("c1"),
        sum(when(col("h") === 2, col("c")).otherwise(0L)).as("c2"))
      .withColumn("n1", sum(col("c1")).over(w.partitionBy("event_type")))
      .withColumn("n2", sum(col("c2")).over(w.partitionBy("event_type")))
      // ln inputs stay >= 1 on single-half rows (whose term the CASE
      // zeroes anyway — greatest() keeps the series well-defined there)
      .withColumn("pa", expr("greatest(c1 * n2, 1L)"))
      .withColumn("pb", expr("greatest(c2 * n1, 1L)"))
    val lns = Seq(("pa", "la"), ("pb", "lb"))
      .foldLeft(hist) { case (df, (n, p)) => DetMath.withLn(df, n, p) }
    val terms = lns.withColumn("q", expr("""CASE
        WHEN n1 >= 2147483648L OR n2 >= 2147483648L
        THEN raise_error('v_value_drift: half size exceeds the product envelope (n >= 2^31) — shard by period before the PSI pass')
        WHEN c1 > 0 AND c2 > 0
        THEN CAST(round(((c1 / n1 - c2 / n2) * (la_ln - lb_ln)) * 1.0e9) AS BIGINT)
        ELSE 0L END"""))
    terms.groupBy("event_type")
      .agg(max(col("n1")).as("n_pre"), max(col("n2")).as("n_post"),
        sum(col("q")).as("sq"),
        sum(when(col("c2") === 0L, col("c1")).otherwise(0L))
          .as("m_only_pre"),
        sum(when(col("c1") === 0L, col("c2")).otherwise(0L))
          .as("m_only_post"))
      .select(col("event_type"), col("n_pre"), col("n_post"),
        expr("sq / 1.0e9").as("psi"),
        expr("try_divide(CAST(m_only_pre AS DOUBLE), CAST(n_pre AS DOUBLE))")
          .as("frac_only_pre"),
        expr("try_divide(CAST(m_only_post AS DOUBLE), CAST(n_post AS DOUBLE))")
          .as("frac_only_post"))
      // coalesce to false: a single-day span leaves one half empty, its
      // frac_only_* NULL via try_divide, and 3VL would make drift NULL —
      // a consumer filtering WHERE drift vs WHERE NOT drift would drop
      // the type from BOTH sides (r14 advice)
      .withColumn("drift", expr("coalesce(" +
        "psi > 0.2e0 OR frac_only_pre > 0.05e0 OR frac_only_post > 0.05e0," +
        " false)"))
      .orderBy("event_type")
  }

  /** Vocabulary-level drift: per-source KL divergence of the token
    * distribution against the whole corpus, over the source's OBSERVED
    * support —
    *
    *   KL_obs(P_s ‖ Q) = Σ_{t∈s} (a_t/n_s) · ln( (a_t/n_s) / (c_t/N) )
    *
    * (observed-support form: zero-count vocabulary terms are skipped, so
    * the relation stays sparse — the dense smoothed grid would be
    * |vocab|×|sources| rows, pointless at scale; c_t ≥ a_t ≥ 1 keeps
    * every log finite without smoothing). The n_chars-bucket [[drift]]
    * catches length drift; this catches CONTENT drift — a source whose
    * vocabulary diverges from the mix. ln via [[DetMath]]; per-source Σ
    * through a 1e12-scaled BIGINT accumulator (terms are ≤ ~20·p, so the
    * scaled sum is ≤ ~2e13 — far inside BIGINT).
    *
    * Plan/scale: genuinely ONE pass over the token stream. The corpus
    * per-token counts and per-source totals are WINDOW sums over the
    * (source, tok) agg — not self-joins, which would re-expand the
    * explode subtree per consumer (measured: Catalyst does NOT reuse
    * those exchanges — the consumers prune differently). ln(N) never
    * appears in the per-row term at all: Σ_t p_t = 1 on the observed
    * support, so Σ p·ln N = ln N and it is added once AFTER the
    * per-source sum, from a window over the catalog-sized result. Three
    * vocab-sized shuffles total, zero joins, one scan. */
  def klSources(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val st = documents(s, d)
      .select(col("source"), explode(expr("split(text, ' ')")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("a"))
      .withColumn("c", sum(col("a")).over(w.partitionBy("tok")))
      .withColumn("n_s", sum(col("a")).over(w.partitionBy("source")))
    val lns = Seq(("a", "la"), ("c", "lc"), ("n_s", "lns"))
      .foldLeft(st) { case (df, (n, p)) => DetMath.withLn(df, n, p) }
    val perSrc = lns
      .withColumn("term", expr(
        "cast(round(((a / n_s) * ((la_ln - lns_ln) - lc_ln)) * 1.0e12) as bigint)"))
      .groupBy("source", "n_s").agg(sum(col("term")).as("st"))
    DetMath.withLn(
      perSrc.withColumn("n_tot", sum(col("n_s")).over(w.partitionBy())),
      "n_tot", "lnt")
      .select(col("source"), col("n_s").as("n_tokens"),
        expr("st / 1.0e12 + lnt_ln").as("kl_vs_corpus"))
      .orderBy("source")
  }

  /** Jensen–Shannon divergence of each source's unigram distribution vs
    * the REST of the corpus — the symmetric, bounded ([0, ln 2])
    * companion to [[klSources]]: KL explodes when the rest has mass the
    * source lacks, JS stays finite, so it is the metric a mixing
    * dashboard can threshold ("flag any source whose JS vs the blend
    * exceeds 0.3 nats").
    *
    * Exactness device: with p = a/n_s, q = b/n_r (b = rest count,
    * n_r = rest total), the two log-ratios reduce to INTEGER ratios —
    * p/m = 2·a·n_r / (a·n_r + b·n_s) and q/m = 2·b·n_s / (a·n_r + b·n_s)
    * — so both logs ride [[DetMath]]'s bit-deterministic ln over BIGINT
    * products and every per-token term is rounded to a 1e-12 BIGINT
    * ledger (order-independent sum). Tokens ABSENT from the source need
    * no grid: there p = 0 and m = q/2, so the q-side contribution is
    * exactly ln 2 · (missing rest mass), computed from the per-source
    * Σb in closed form. The 2^30 total-token envelope (products < 2^60,
    * den < 2^61) is folded into the load-bearing ln input — the
    * e_autocorr device — so both engines raise identically rather than
    * desync. A single-source corpus reads NULL (n_r = 0) via
    * try_divide ≡ DuckDB's native x/0.
    *
    * Plan/scale: token-level counts shuffle once on (source, tok); the
    * rest-count window is keyed by tok (uniform); per-source totals are
    * a CATALOG-sized relation broadcast back — deliberately NOT an
    * over-() window on the vocab-sized relation, which would funnel the
    * whole vocabulary through one partition. At 100 TB: vocab-keyed
    * shuffles and one broadcast of |sources| rows — the right shape. */
  def jsSources(s: SparkSession, d: String): DataFrame =
    jsSourcesFrom(documents(s, d)
      .select(col("source"), explode(expr("split(text, ' ')")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("a")))

  /** [[jsSources]] over a caller-supplied (source, tok, a) token-count
    * relation — the testable core (JS ≡ 0 for identical distributions,
    * ≡ ln 2 for disjoint vocabularies, and the BIGINT-envelope raise
    * all need constructed counts the gate corpus can't reach). */
  private[ops] def jsSourcesFrom(stIn: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // materialize the token-count relation ONCE (the dedupClustersFrom
    // checkpoint pattern): both the rest-count window and the per-source
    // totals read it, and exchange reuse across differently-partitioned
    // consumers is an optimizer courtesy, not a guarantee — without this
    // the corpus explode+agg runs twice
    val stM = stIn.localCheckpoint()
    val st = stM
      .withColumn("c", sum(col("a")).over(w.partitionBy("tok")))
    val totals = stM.groupBy("source").agg(sum(col("a")).as("n_s"))
      .withColumn("n_tot", sum(col("n_s")).over(w.partitionBy()))
      .withColumn("n_r", expr("n_tot - n_s"))
    val terms = st.join(broadcast(totals), "source")
      .withColumn("b", expr("c - a"))
      // envelope guard folded INTO the surviving ln input (a standalone
      // guard column is dead code the optimizer prunes — e_stl_anomaly
      // lesson); greatest(1, ·) keeps DetMath's bin() off zero when the
      // factor is legitimately 0 (the CASE'd term is 0/NULL there)
      .withColumn("np", expr(s"""CASE WHEN n_tot > 1073741824
        THEN raise_error('v_js_sources: token ledger exceeds BIGINT envelope (n_tot > 2^30) — shard sources before the JS pass')
        ELSE greatest(1L, 2L * a * n_r) END"""))
      .withColumn("nq", expr("greatest(1L, 2L * b * n_s)"))
      .withColumn("dn", expr("greatest(1L, a * n_r + b * n_s)"))
    val lns = Seq(("np", "lp"), ("nq", "lq"), ("dn", "ld"))
      .foldLeft(terms) { case (df, (n, p)) => DetMath.withLn(df, n, p) }
    val perSrc = lns
      .withColumn("tp", expr(
        "cast(round(((a / n_s) * (lp_ln - ld_ln)) * 1.0e12) as bigint)"))
      .withColumn("tq", expr(
        "CASE WHEN b >= 1 THEN cast(round(((b / n_r) * (lq_ln - ld_ln)) * 1.0e12) as bigint) ELSE 0L END"))
      .groupBy("source", "n_s", "n_r")
      .agg(sum(col("tp")).as("sp"), sum(col("tq")).as("sq"),
        sum(col("b")).as("sum_b"))
    perSrc
      .select(col("source"), col("n_s").as("n_tokens"),
        expr(s"""(sp + sq) / 2.0e12 + ${DetMath.dlit(0.5 * math.log(2.0))}
          * try_divide(CAST(n_r - sum_b AS DOUBLE), CAST(n_r AS DOUBLE))""")
          .as("js_vs_rest"))
      .orderBy("source")
  }

  /** Tukey IQR fences on the event VALUE distribution per type — the
    * per-measurement outlier screen beside the volume tiers ([[anomaly]]
    * watches row counts; this watches the metric itself, catching a
    * payment amount or latency reading that is wild while volumes look
    * fine). Exact DISCRETE quantiles via the value-histogram device
    * (the q_median_disc/v_mad_anomaly shape — never an approximate
    * percentile): q1/q3 at ranks ⌈n/4⌉/⌈3n/4⌉, fences q1∓1.5·IQR, and
    * the outlier count from the SAME histogram joined back against the
    * catalog-sized fence relation. 1.5 is exactly representable, so the
    * fence arithmetic is one identical IEEE chain in both engines;
    * NULL values are filtered explicitly (Spark orders NULLs first
    * ascending, DuckDB last — unfiltered they would desync the
    * cumulative ranks).
    *
    * Plan/scale: one scan → (type, value) histogram agg (materialized
    * once — the fence derivation and the outlier count both read it) →
    * two type-keyed windows → catalog-sized fence relation broadcast
    * back onto the histogram. Never a per-row sort of the raw events. */
  def valueFences(s: SparkSession, d: String): DataFrame =
    valueFencesFrom(events(s, d))

  /** [[valueFences]] over a caller-supplied (event_type, value)
    * relation — the testable core (hand-computed quartiles and a
    * planted outlier). */
  private[ops] def valueFencesFrom(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val h = ev
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value").as("v"))
      .groupBy("event_type", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val fences = h
      .withColumn("cum",
        sum(col("cnt")).over(w.partitionBy("event_type").orderBy("v")))
      .withColumn("n", sum(col("cnt")).over(w.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("n")).as("n"),
        min(when(expr("cum >= (n + 3) DIV 4"), col("v"))).as("q1"),
        min(when(expr("cum >= (3 * n + 3) DIV 4"), col("v"))).as("q3"))
      .withColumn("iqr", expr("q3 - q1"))
      .withColumn("lo_fence", expr("q1 - 1.5e0 * (q3 - q1)"))
      .withColumn("hi_fence", expr("q3 + 1.5e0 * (q3 - q1)"))
    val outliers = h.join(broadcast(fences), "event_type")
      .groupBy("event_type")
      .agg(sum(when(col("v") < col("lo_fence") ||
        col("v") > col("hi_fence"), col("cnt")).otherwise(0L))
        .as("n_outliers"))
    fences.join(outliers, "event_type")
      .select(col("event_type"), col("n"), col("q1"), col("q3"),
        col("iqr"), col("lo_fence"), col("hi_fence"), col("n_outliers"),
        expr("n_outliers / n").as("outlier_share"))
      .orderBy("event_type")
  }

  /** Two-sample KOLMOGOROV–SMIRNOV drift test on the event VALUE
    * distribution, each type's EARLY half vs its LATE half (days split
    * at the type's own calendar midpoint) — the distribution-shape
    * drift monitor beside [[valueFences]]'s outlier screen and
    * [[drift]]'s binned PSI: K-S needs no binning choice and sees any
    * CDF displacement. The whole statistic is EXACT integer
    * arithmetic: D = max|F₁−F₂| = max|cum1·n2 − cum2·n1| / (n1·n2),
    * where the max runs over the observed-value histogram's cumulative
    * counts — a pure BIGINT max. The α=0.05 verdict compares
    * A²·10⁶ > c²·10⁶·n1·n2·(n1+n2) (c = 1.358, c²·10⁶ = 1844164 —
    * one shared integer literal) in 128-bit integer arithmetic
    * (DECIMAL(38) Spark-side, HUGEINT oracle-side), so no float
    * touches the decision. Envelope: half sizes < 2²⁶ keep A²·10⁶
    * under 10³⁸ — folded into the load-bearing cumulative expression,
    * raising identically in both engines (shard by period first at
    * 100 TB). NULL values filtered explicitly (engines order them
    * differently); a type with an empty half reads D = 0 and a NULL
    * ratio via try_divide ≡ DuckDB x/0.
    *
    * Plan/scale: one scan → per-type midpoint (catalog agg, broadcast
    * back) → (type, value) histogram agg → two type-key windows →
    * catalog-sized verdict. Never a raw-event sort. */
  def ksHalves(s: SparkSession, d: String): DataFrame =
    ksHalvesFrom(events(s, d))

  /** [[ksHalves]] over a caller-supplied (event_type, ts, value)
    * relation — the testable core (identical halves ⇒ D exactly 0; a
    * planted location shift ⇒ the hand-computed D and a firing
    * verdict; the envelope raise). */
  private[ops] def ksHalvesFrom(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = ev.filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").as("dn"),
        col("value").as("v"))
    val mid = base.groupBy("event_type")
      .agg(min(col("dn")).as("lo"), max(col("dn")).as("hi"))
    val hist = base.join(broadcast(mid), "event_type")
      .withColumn("h", when(col("dn") * 2 <= col("lo") + col("hi"), 1)
        .otherwise(2))
      .groupBy("event_type", "v")
      .agg(sum(when(col("h") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("h") === 2, 1L).otherwise(0L)).as("c2"))
    val cum = hist
      .withColumn("n1",
        sum(col("c1")).over(w.partitionBy("event_type")))
      .withColumn("n2",
        sum(col("c2")).over(w.partitionBy("event_type")))
      // envelope folded INTO the surviving cumulative term (the
      // e_stl_anomaly lesson: a standalone guard column is dead code)
      .withColumn("cum1", expr("""sum(CASE
          WHEN n1 >= 67108864 OR n2 >= 67108864
          THEN raise_error('v_ks_halves: half size exceeds the 128-bit envelope (n >= 2^26) — shard by period before the K-S pass')
          ELSE c1 END) OVER (PARTITION BY event_type ORDER BY v)"""))
      .withColumn("cum2", expr(
        "sum(c2) OVER (PARTITION BY event_type ORDER BY v)"))
    cum
      .groupBy("event_type")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
          .as("a"))
      .select(col("event_type"), col("n1"), col("n2"),
        col("a").as("d_num"),
        expr("try_divide(CAST(a AS DOUBLE), CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))")
          .as("ks_d"),
        expr("""CAST(a AS DECIMAL(38, 0)) * a * 1000000
          > CAST(1844164 AS DECIMAL(38, 0)) * n1 * n2 * (n1 + n2)""")
          .as("is_drift"))
      .orderBy("event_type")
  }

  /** Equi-width document-length histogram (width 250, top bucket open) —
    * the profile plot behind [[drift]]'s PSI buckets, as queryable rows
    * with exact counts and fractions. One scan, one tiny agg, window
    * total over ≤10 rows. */
  def histogram(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    documents(s, d)
      .select(expr("least(cast(n_chars as bigint) div 250, cast(9 as bigint))")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_tot", sum(col("n_docs")).over(w.partitionBy()))
      .select(col("bucket"), (col("bucket") * 250).as("lo_chars"),
        ((col("bucket") + 1) * 250).as("hi_chars"),
        col("n_docs"), expr("n_docs / n_tot").as("frac"))
      .orderBy("bucket")
  }

  /** Daily-volume anomaly detection: per (event_type, day) counts flagged
    * when they sit more than 2 population standard deviations from the
    * type's daily mean — the ingest-monitoring alarm that catches a
    * broken producer or a backfill spike before it poisons a training
    * snapshot. All moments come from exact BIGINT sums, and the flag is a
    * PURE INTEGER comparison (dev² > 4·varnum, where dev = k·n − Σn and
    * varnum = k·Σn² − (Σn)² are k²-scaled): no float rounding can flip a
    * verdict at any scale. The reported z itself is the one double,
    * derived from those exact integers through an identical expression
    * tree in both engines.
    *
    * Plan/scale: one scan → (type, day) agg → per-type windows over the
    * catalog-sized day grid. The data shuffles once on a uniform
    * composite key; the window runs over ~days rows per type. */
  def anomaly(s: SparkSession, d: String): DataFrame =
    anomalyFromDaily(EventOps.dailyCountsFrom(
      events(s, d).select(col("event_type"), col("ts"))))

  /** [[anomaly]] over a pre-built [[EventOps.dailyCountsFrom]] ledger —
    * the shared-ledger core ([[EventOps.qAnomalyVotes]] feeds all three
    * tiers from ONE checkpointed ledger). Must NOT filter the null-day
    * group: the raw tier has always counted it into the per-type
    * moments. */
  private[ops] def anomalyFromDaily(daily: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    daily
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sn", sum(col("n")).over(w))
      .withColumn("sq", sum(col("n") * col("n")).over(w))
      .withColumn("dev", col("k") * col("n") - col("sn"))
      .withColumn("varnum", col("k") * col("sq") - col("sn") * col("sn"))
      .select(col("event_type"), col("day"), col("n"),
        expr("""CASE WHEN varnum = 0 THEN CAST(NULL AS DOUBLE)
                ELSE cast(dev as double) / sqrt(cast(varnum as double)) END""")
          .as("z"),
        (col("dev") * col("dev") > lit(4L) * col("varnum")).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Benford first-digit audit over order totals — the classic
    * fabricated-numbers screen: naturally-occurring money amounts follow
    * P(d) = ln(1+1/d)/ln(10), synthetic or tampered ones usually don't.
    * Per leading digit: observed count, observed share, the Benford
    * expectation, and the deviation. Expected shares are computed IN THE
    * PLAN as (ln(d+1) − ln(d)) / ln(10) over [[DetMath]]'s deterministic
    * integer-input ln, so every reported double is bit-identical across
    * engines (shares are single divisions of exact BIGINTs).
    *
    * Plan/scale: one pruned scan → a ≤9-key partial agg → 9-row window
    * for the total. Catalog-sized after the scan. */
  def benford(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    var digits = orders(s, d)
      .select(substring(
        floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .withColumn("total", sum(col("n_obs")).over(w))
    digits = DetMath.dropLnTmp(
      DetMath.withLn(digits, "CAST(digit AS BIGINT)", "ld"), "ld")
    digits = DetMath.dropLnTmp(
      DetMath.withLn(digits, "CAST(digit AS BIGINT) + 1", "ld1"), "ld1")
    digits = DetMath.dropLnTmp(DetMath.withLn(digits, "10", "l10"), "l10")
    digits
      .withColumn("share", col("n_obs") / col("total"))
      .withColumn("benford_expected",
        expr("(ld1_ln - ld_ln) / l10_ln"))
      .select(col("digit"), col("n_obs"), col("share"),
        col("benford_expected"),
        expr("share - benford_expected").as("deviation"))
      .orderBy("digit")
  }

  /** k-anonymity audit over a quasi-identifier set — the governance
    * check a dataset clears before release: every (nationkey,
    * mktsegment) equivalence class of `customer` with its member count
    * and a below-k flag (k = 5). A class of size < k means those rows
    * are re-identifiable by the quasi-identifiers alone — the
    * complement of [[graft.ops.CorpusOps]]'s PII scrub (scrub removes
    * direct identifiers; k-anonymity measures indirect ones).
    *
    * Plan/scale: one pruned scan → one partial-agg shuffle on the
    * catalog-sized class key. Pure integer counting — trivially
    * oracle-exact. */
  def kanon(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("below_k", col("class_size") < 5)
      .orderBy("nationkey", "mktsegment")

  /** l-diversity over the same quasi-identifier classes as [[kanon]] —
    * the disclosure check k-anonymity misses: a class can hold k ≥ 5
    * members and still leak, if every member shares the SENSITIVE value
    * (the attacker learns it without re-identifying anyone). Sensitive
    * attribute here: the account-balance band (negative / low / high);
    * a class is flagged when fewer than 2 distinct bands appear.
    * Reading `below_k` and `below_l` side by side is the release
    * decision — suppress or generalize classes failing either.
    *
    * Exactness: band edges compare the SAME doubles both engines read
    * from parquet (no arithmetic before the comparison); everything
    * after is integer counting.
    *
    * Plan/scale: one pruned scan → one partial-agg shuffle on the
    * catalog-sized class key, distinct-count riding the same shuffle. */
  def lDiversity(s: SparkSession, d: String): DataFrame =
    lDiversityFrom(customer(s, d))

  /** [[lDiversity]] over a caller-supplied customer relation — the
    * testable core (neither flag fires on the well-mixed testdata, so
    * the flag path is proven on a constructed class instead). */
  private[ops] def lDiversityFrom(cust: DataFrame): DataFrame =
    cust
      .select(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("CASE WHEN c_acctbal < 0.0D THEN 'neg' " +
          "WHEN c_acctbal < 5000.0D THEN 'low' ELSE 'high' END").as("band"))
      .groupBy("nationkey", "mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("band")).as("l_distinct"))
      .withColumn("below_l", col("l_distinct") < 2)
      .orderBy("nationkey", "mktsegment")

  /** Robust (median/MAD) daily-volume outliers per event type — the
    * heavy-tail-safe twin of [[anomaly]]'s mean/σ z-score: one genuine
    * outage day inflates the variance and can mask a second outage, but
    * it moves the median and MAD by at most one rank. Median is the
    * DISCRETE lower median via the value-histogram + cumulative-window
    * device ([[RelationalOps.qMedianDisc]]), so median, absolute
    * deviations, and MAD are all exact BIGINTs and the outlier verdict
    * `dev > 3·MAD` is a pure integer comparison — immune to float
    * rounding on both engines (a MAD of 0 — over half the days
    * identical — flags ANY deviation, the standard degenerate-MAD
    * convention; documented rather than fudged).
    *
    * Plan/scale: one scan → (type, day) partial agg; everything after is
    * catalog × days sized (two rounds of the histogram device + one
    * broadcast join back). */
  def madAnomaly(s: SparkSession, d: String): DataFrame =
    // checkpoint even standalone: the ledger feeds the median pass AND
    // the deviation join — unmaterialized, each pruned lineage re-runs
    // the (type, day) agg from its own full scan of the fact table
    madAnomalyFromDaily(EventOps.dailyCountsFrom(
      events(s, d).select(col("event_type"), col("ts"))).localCheckpoint())

  /** [[madAnomaly]] over a pre-built (checkpointed) ledger — see
    * [[anomalyFromDaily]]; the null-day group stays, as it always has
    * in this tier's median/MAD ranks. */
  private[ops] def madAnomalyFromDaily(daily: DataFrame): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(valueCol)
      df.groupBy(col("event_type"), col(valueCol))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("tot", sum(col("cnt")).over(wAll))
        .groupBy(col("event_type"))
        .agg(min(when(expr("cum >= (tot + 1) DIV 2"), col(valueCol))).as(out))
    }
    val med = lowerMedian(daily, "n", "median_n")
    val withDev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("n") - col("median_n")))
    val mad = lowerMedian(withDev, "dev", "mad")
    withDev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        col("median_n"), col("dev"), col("mad"),
        (col("dev") > lit(3L) * col("mad")).as("is_outlier"))
      .orderBy("event_type", "day")
  }

  /** Shuffle-key skew diagnosis: for each candidate partition key of
    * `events` (user_id, event_type, calendar day), the key cardinality,
    * the hottest key's row count, the mean rows per key, and the skew
    * ratio max/mean — the report that decides, BEFORE a 100 TB shuffle,
    * which keys need salting (q_skew_salted) or AQE skew handling and
    * which are safe to hash-partition on. A ratio near 1 is uniform;
    * event_type's ~n/4 hot keys show exactly why the salted form exists.
    *
    * Plan/scale: ONE scan — the three key columns melt through a single
    * 3-row Generate (the v_drift trick), then one (key_name, key_val)
    * agg and a key_name-grain rollup. Both aggregates partial-combine
    * map-side; output is 3 rows. */
  def skew(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(explode(expr(
        """array(
             named_struct('key_name', 'user_id',
                          'key_val', CAST(user_id AS STRING)),
             named_struct('key_name', 'event_type', 'key_val', event_type),
             named_struct('key_name', 'day',
                          'key_val', CAST(CAST(ts AS DATE) AS STRING)))"""))
        .as("k"))
      .groupBy(col("k.key_name").as("key_name"), col("k.key_val").as("key_val"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("key_name")
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_key_rows"))
      .select(col("key_name"), col("n_rows"), col("n_keys"),
        col("max_key_rows"),
        expr("n_rows / n_keys").as("avg_key_rows"),
        expr("max_key_rows * n_keys / n_rows").as("skew_ratio"))
      .orderBy("key_name")

  /** Referential-integrity audit across the warehouse FK graph — one row
    * per declared foreign key with child-row count, NULL-key count,
    * orphan count (non-NULL keys with no parent row) and a verdict. The
    * join-safety check a pipeline runs before it trusts a star join.
    *
    * Plan/scale: each edge first collapses the child side to
    * (key → count) — a partial-agg shuffle moving only distinct keys —
    * then probes the parent's distinct key set, so no row payload is
    * ever joined. Dim parents broadcast; the one big-big edge
    * (lineitem→orders) shuffles key-count pairs on a uniform key. The
    * union glues seven catalog-sized 1-row aggregates. */
  def referential(s: SparkSession, d: String): DataFrame = {
    def fk(name: String, child: DataFrame, ck: String,
           parent: DataFrame, pk: String): DataFrame = {
      val keys = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
      val pks = parent.select(col(pk).as("pk")).distinct
      keys.join(pks, col("k") === col("pk"), "left")
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("k").isNull, col("cnt"))), lit(0L))
            .as("n_null"),
          coalesce(sum(when(col("k").isNotNull && col("pk").isNull,
            col("cnt"))), lit(0L)).as("n_orphans"))
        .select(lit(name).as("fk_name"), col("n_rows"), col("n_null"),
          col("n_orphans"))
    }
    Seq(
      fk("customer.c_nationkey->nation", customer(s, d), "c_nationkey",
        nation(s, d), "n_nationkey"),
      fk("lineitem.l_orderkey->orders", lineitem(s, d), "l_orderkey",
        orders(s, d), "o_orderkey"),
      fk("lineitem.l_partkey->part", lineitem(s, d), "l_partkey",
        part(s, d), "p_partkey"),
      fk("lineitem.l_suppkey->supplier", lineitem(s, d), "l_suppkey",
        supplier(s, d), "s_suppkey"),
      fk("nation.n_regionkey->region", nation(s, d), "n_regionkey",
        region(s, d), "r_regionkey"),
      fk("orders.o_custkey->customer", orders(s, d), "o_custkey",
        customer(s, d), "c_custkey"),
      fk("supplier.s_nationkey->nation", supplier(s, d), "s_nationkey",
        nation(s, d), "n_nationkey"))
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_orphans") === 0L)
      .orderBy("fk_name")
  }

  /** Single-pass approximate quantiles from a fixed 256-bin histogram
    * (domain [0, 512), bin width exactly 2.0 — a power of two, so the
    * binning `floor(value / 2.0)` and the bin-edge arithmetic are
    * float-EXACT in both engines) with the exact discrete quantiles as
    * the validation twin and the per-percentile absolute error — the
    * sketch-dial measurement loop (d_minhash_est_quality's role for
    * quantiles). Production at 100 TB runs ONLY the histogram arm: one
    * partial-aggregatable pass, 256 rows per key, no sort of the data —
    * the exact arm (a per-key value sort) is what the sketch exists to
    * avoid and is priced here on a sample-sized run.
    *
    * Plan/scale: ONE scan, two shuffles — (type, value) partial agg,
    * then the event_type window; the final aggregate is co-located by
    * the window's partitioning. The sketch's answer needs no second
    * histogram pass at all: value-level cumulative counts are monotone
    * in value and the bin is monotone in value, so the first bin whose
    * cumulative count crosses the target IS the bin of the exact
    * quantile — the report derives the sketch's answer as the bin edge
    * of the exact answer (`(floor(q / width) + 1) · width`, capped),
    * and err ≤ bin width by construction. The production 100 TB path
    * materializes only the 256-row-per-key histogram and reads the
    * crossing bin from it; this query prices the sketch's error against
    * the exact sort-based answer it replaces. */
  def quantileSketch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(col("event_type"))
    def edge(c: String): org.apache.spark.sql.Column = expr(
      s"(least(CAST(floor($c / 2.0D) AS BIGINT), CAST(255 AS BIGINT)) + 1) * 2.0D")
    events(s, d)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum(col("cnt")).over(wAll.orderBy(col("value"))))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("event_type")).agg(
        max(col("n")).as("n"),
        min(when(expr("cum >= (n + 1) DIV 2"), col("value"))).as("p50_exact"),
        min(when(expr("cum >= (9 * n + 9) DIV 10"), col("value"))).as("p90_exact"),
        min(when(expr("cum >= (99 * n + 99) DIV 100"), col("value"))).as("p99_exact"))
      .select(col("event_type"), col("n"),
        col("p50_exact"), edge("p50_exact").as("p50_approx"),
        abs(edge("p50_exact") - col("p50_exact")).as("err_p50"),
        col("p90_exact"), edge("p90_exact").as("p90_approx"),
        abs(edge("p90_exact") - col("p90_exact")).as("err_p90"),
        col("p99_exact"), edge("p99_exact").as("p99_approx"),
        abs(edge("p99_exact") - col("p99_exact")).as("err_p99"))
      .orderBy("event_type")
  }

  /** Per-dimension embedding-column profile — the QA pass a pipeline
    * runs on a vector column BEFORE spending a cluster pass building an
    * index over it: component count, exact order-independent mean (a
    * dead dimension or a collapsed encoder shows up here first),
    * min/max range, and exact zero counts (sparsity / truncated-write
    * detector). The mean rides [[Exact.dsum]]'s micro-unit BIGINT
    * accumulator — float components widen to double exactly, so both
    * engines sum identical integers in any order; min/max/zero involve
    * no arithmetic at all.
    *
    * Plan/scale: one pruned scan → posexplode (Dim-fold fan-out,
    * inherent to the per-dimension grain) → one Dim-key partial-agg
    * shuffle. Nothing but `(dim_idx, component)` leaves the scan. */
  def embProfile(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim_idx", "comp")))
      .select(col("dim_idx").cast("long").as("dim_idx"),
        col("comp").cast("double").as("c"))
      .groupBy("dim_idx").agg(
        count(lit(1)).as("n"),
        Exact.davg(col("c")).as("mean_comp"),
        min(col("c")).as("min_comp"),
        max(col("c")).as("max_comp"),
        sum(when(col("c") === 0.0, 1L).otherwise(0L)).as("n_zero"))
      .orderBy("dim_idx")

  /** Chi-square independence audit over the (source, lang) contingency
    * grid — "is language balanced across crawls, or does some crawl
    * carry a language skew the mixture weights must correct?" — the
    * categorical complement of [[drift]]'s numeric PSI. Per cell:
    * observed count (INCLUDING structurally-zero cells — the densified
    * grid is what makes the statistic right), the expected count under
    * independence r·c/n, and the cell's X² contribution
    * (o·n − r·c)²/(n·r·c); the summary columns carry the exact total X²
    * and degrees of freedom (n_sources−1)(n_langs−1) for the lookup.
    *
    * Oracle-exactness: diff = o·n − r·c is exact BIGINT; each cell's
    * contribution is cast-square-divide of the same exact integers in a
    * FIXED operation order (bit-identical in both engines); the total
    * rides [[Exact.dsum]]'s micro-unit accumulator so the sum is
    * order-independent. At 100 TB the n·r·c BIGINT product approaches
    * Int64 range around n ≈ 2·10⁶ per-cell mass cubed — switch the
    * denominator to DOUBLE products there (the verdict tolerates it;
    * the diff stays exact).
    *
    * Plan/scale: one scan → ONE (source, lang) partial-agg shuffle;
    * everything after runs on the catalog²-sized cell grid
    * (checkpointed once, three consumers) with broadcast 1-row
    * totals. */
  def chisq(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val rowT = cells.groupBy("source").agg(sum(col("o")).as("r"))
    val colT = cells.groupBy("lang").agg(sum(col("o")).as("c"))
    val nT = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("source")).as("ns"),
      count_distinct(col("lang")).as("nl"))
    val dense = rowT.crossJoin(colT)
      .join(cells, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(nT))
      .withColumn("diff", expr("o * n - r * c"))
      .withColumn("expected", expr("CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("contrib", expr(
        "(CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE)) / CAST(n * r * c AS DOUBLE)"))
      .localCheckpoint()
    dense.crossJoin(broadcast(dense.agg(Exact.dsum(col("contrib")).as("chi2"))))
      .select(col("source"), col("lang"), col("o").as("n_obs"),
        col("expected"), col("contrib"),
        expr("CAST((ns - 1) * (nl - 1) AS BIGINT)").as("dof"), col("chi2"))
      .orderBy("source", "lang")
  }

  /** Per-source language-mix entropy + effective language count — the
    * mixing audit a multilingual curation run reads per crawl/source:
    * H(s) = ln(N_s) − (Σ_l c_l·ln(c_l))/N_s over the source's language
    * counts, and exp(H) — the "effective number of languages" (perplexity
    * of the mix: 3.0 means "as diverse as 3 equally-sized languages").
    * The continuous companion of [[chisq]]'s independence verdict: chisq
    * says WHETHER sources differ in language mix, this says how
    * concentrated each one is.
    *
    * Oracle-exactness: both engines compute ln over exact BIGINT counts
    * via DetMath, the Σ c·ln(c) term through the 1e-9-quantized BIGINT
    * ledger (order-independent), and exp(H) through DetMath's
    * deterministic exp — bit-identical end to end.
    *
    * Plan/scale: one scan → (source, lang) catalog-sized agg →
    * source-sized agg; ln/exp are narrow in-row chains. */
  def langEntropy(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val terms = DetMath.withLn(cells, "c", "lc")
      .withColumn("term", expr("cast(round((c * lc_ln) * 1.0e9) as bigint)"))
    val agg = terms.groupBy("source")
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("term")).as("sl"))
    val ent = DetMath.withLn(agg, "n_docs", "lnn")
      .withColumn("entropy", expr("lnn_ln - (sl / 1.0e9) / n_docs"))
    DetMath.withExp(ent, "entropy", "eff")
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("entropy"), col("eff_exp").as("eff_langs"))
      .orderBy("source")
  }

  /** The numeric lineitem columns [[corrMatrix]] correlates: (name,
    * exact BIGINT projection). Cents/basis-point scaling only preserves
    * exactness — Pearson r is scale-invariant. */
  private val CorrCols = Seq(
    ("disc", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice * 100) AS BIGINT)"),
    ("qty", "CAST(l_quantity AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 100) AS BIGINT)"))

  /** All ordered column pairs (x < y alphabetically) of [[CorrCols]]. */
  private val CorrPairs = for {
    (a, i) <- CorrCols.map(_._1).zipWithIndex
    b <- CorrCols.map(_._1).drop(i + 1)
  } yield (a, b)

  /** Pairwise Pearson correlation MATRIX over the fact table's numeric
    * columns — the multivariate step up from `q_stats_exact`'s single
    * pair, and the profiling readout that catches accidentally-coupled
    * columns (a price that silently encodes quantity, a tax column that
    * is a constant multiple of discount) before anyone trains on
    * "independent" features.
    *
    * Exactness: every moment is an exact integer sum — values as BIGINT
    * cents/basis points, per-row products fit BIGINT, and each
    * square/cross sum is carried as a LIMB-SPLIT BIGINT pair
    * ([[Exact.limbDbl]]: native wide-integer→DOUBLE casts disagree by
    * 1 ulp between engines above 2^53, observed at sf0.1) — so each r
    * comes from ONE fixed-shape double formula on bit-identical inputs.
    *
    * Plan/scale: ONE scan → a single partial-aggregated row holding all
    * 4 sums + 10 limb-pair moment sums (map-side combined, shuffle
    * volume = one row) → a 6-way stack melt. Adding columns grows the
    * agg quadratically but the data pass stays single-scan one-row. */
  def corrMatrix(s: SparkSession, d: String): DataFrame = {
    val L = Exact.Limb
    val base = lineitem(s, d)
      .select(CorrCols.map { case (n2, e) => expr(e).as(n2) }: _*)
    def limbAggs(term: String, p: String) = Seq(
      sum(expr(s"($term) DIV ${L}L")).as(s"${p}_h"),
      sum(expr(s"($term) % ${L}L")).as(s"${p}_l"))
    val aggs =
      CorrCols.map { case (n2, _) => sum(col(n2)).as(s"s_$n2") } ++
      CorrCols.flatMap { case (n2, _) => limbAggs(s"$n2 * $n2", s"ss_$n2") } ++
      CorrPairs.flatMap { case (a, b) => limbAggs(s"$a * $b", s"sp_${a}_$b") } :+
      // ADVICE r9: the cross-product limb terms are nonnegative only by
      // TPC-H data convention (a credit/return row would flip a sign and
      // silently desync the DIV/% recombination between engines) — so a
      // negative input fails LOUDLY, identically on both sides
      expr(Exact.negCount(
        s"least(${CorrCols.map(_._1).mkString(", ")}) < 0")).as("n_neg")
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)
    def corr(a: String, b: String) = {
      def dd(p: String) = Exact.limbDbl(s"${p}_h", s"${p}_l")
      Exact.guarded("n_neg > 0",
        "v_corr_matrix: negative input breaks the limb-device contract",
        s"""(n * ${dd(s"sp_${a}_$b")} - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) /
            (sqrt(n * ${dd(s"ss_$a")} - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) *
             sqrt(n * ${dd(s"ss_$b")} - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))""")
    }
    val branches = CorrPairs
      .map { case (a, b) => s"'$a', '$b', ${corr(a, b)}" }.mkString(",\n")
    m.select(col("n"), expr(
      s"stack(${CorrPairs.size}, $branches) AS (x, y, corr)"))
      .select(col("x"), col("y"), col("n"), col("corr"))
      .orderBy("x", "y")
  }

  /** Stale-feed threshold for [[freshness]]: a type whose newest event
    * lags the feed head by a full day is flagged. */
  private val StaleMinutes = 1440L

  /** Data-freshness audit per event type: event count, newest event
    * timestamp (epoch micros), minutes of lag behind the feed head (the
    * newest event ANY type shipped), and a stale verdict at
    * [[StaleMinutes]] — the monitor that catches a silently-dead
    * upstream producer BEFORE a training snapshot ships with a type
    * frozen at last week (volume anomaly detectors like [[anomaly]]
    * need a day of zeros to fire; lag-behind-head fires the moment the
    * snapshot is cut). All arithmetic is exact BIGINT microseconds; the
    * lag is one integer floor division, the verdict an integer compare
    * — no float anywhere. A type whose every `ts` is NULL reports NULL
    * lag/verdict in both engines (no calendar position, the
    * [[EventOps.denseDailyFrom]] discipline).
    *
    * Plan/scale: one catalog-sized (event_type) partial agg over the
    * scan, then a broadcast of the 1-row global max onto the
    * catalog-sized relation — nothing data-sized past the first agg. */
  def freshness(s: SparkSession, d: String): DataFrame =
    freshnessReport(freshnessCore(events(s, d)))

  /** The per-type (n_events, last_us) relation [[freshness]] reads —
    * count and max are both mergeable monoids, so the SAME definition
    * runs as an incremental streaming aggregation
    * (`StreamOps.freshnessStream`): stream state over any prefix equals
    * this batch relation over the same rows. */
  private[graft] def freshnessCore(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))

  /** The head-lag finishing step over a [[freshnessCore]]-shaped
    * relation — a SECOND aggregation level, so in streaming it runs
    * downstream of the maintained state (one streaming query cannot
    * stack two aggregates), exactly as a monitor reads a state table. */
  private[graft] def freshnessReport(per: DataFrame): DataFrame = {
    val g = per.agg(max(col("last_us")).as("g_us"))
    per.crossJoin(broadcast(g))
      .select(col("event_type"), col("n_events"), col("last_us"),
        expr("(g_us - last_us) DIV 60000000").as("lag_minutes"),
        (expr("(g_us - last_us) DIV 60000000") >= StaleMinutes).as("is_stale"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_freshness" -> freshness,
    "v_corr_matrix" -> corrMatrix,
    "v_lang_entropy" -> langEntropy,
    "v_chisq" -> chisq,
    "v_quantile_sketch" -> quantileSketch,
    "v_referential" -> referential,
    "v_skew" -> skew,
    "v_anomaly" -> anomaly,
    "v_mad_anomaly" -> madAnomaly,
    "v_kanon" -> kanon,
    "v_ldiversity" -> lDiversity,
    "v_benford" -> benford,
    "v_histogram" -> histogram,
    "v_profile" -> profile,
    "v_constraints" -> constraints,
    "v_drift" -> drift,
    "v_value_drift" -> valueDrift,
    "v_kl_sources" -> klSources,
    "v_js_sources" -> jsSources,
    "v_value_fences" -> valueFences,
    "v_ks_halves" -> ksHalves,
    "v_emb_profile" -> embProfile)

  /** One UNION ALL branch of the v_referential oracle — mirrors `fk`'s
    * (key → count) ⟕ distinct-parent shape so both engines aggregate the
    * same relation. */
  private def fkSql(name: String, child: String, ck: String,
                    parent: String, pk: String): String = s"""
      SELECT '$name' AS fk_name,
             sum(cnt)::BIGINT AS n_rows,
             coalesce(sum(CASE WHEN k IS NULL THEN cnt END), 0)::BIGINT
               AS n_null,
             coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL THEN cnt END),
               0)::BIGINT AS n_orphans
      FROM (SELECT $ck AS k, count(*)::BIGINT AS cnt FROM $child GROUP BY 1) c
      LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $parent) p ON c.k = p.pk"""

  /** The [[corrMatrix]] oracle, generated from the SAME column/pair
    * constants so a column-set change moves both engines together. */
  private def corrMatrixOracle: String = {
    val L = Exact.Limb
    val proj = CorrCols.map { case (n2, e) => s"$e AS $n2" }.mkString(", ")
    def limbSums(term: String, p: String) = Seq(
      s"sum(($term) // $L)::BIGINT AS ${p}_h",
      s"sum(($term) % $L)::BIGINT AS ${p}_l")
    val sums = (
      CorrCols.map { case (n2, _) => s"sum($n2)::BIGINT AS s_$n2" } ++
      CorrCols.flatMap { case (n2, _) =>
        limbSums(s"$n2 * $n2", s"ss_$n2") } ++
      CorrPairs.flatMap { case (a, b) =>
        limbSums(s"$a * $b", s"sp_${a}_$b") } :+
      s"""${Exact.negCount(
        s"least(${CorrCols.map(_._1).mkString(", ")}) < 0")}::BIGINT AS n_neg""")
      .mkString(",\n              ")
    def corr(a: String, b: String) = {
      def dd(p: String) = Exact.limbDblDuck(s"${p}_h", s"${p}_l")
      Exact.guardedDuck("n_neg > 0",
        "v_corr_matrix: negative input breaks the limb-device contract",
        s"""(n * ${dd(s"sp_${a}_$b")} - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) /
            (sqrt(n * ${dd(s"ss_$a")} - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) *
             sqrt(n * ${dd(s"ss_$b")} - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))""")
    }
    val branches = CorrPairs.map { case (a, b) =>
      s"SELECT '$a' AS x, '$b' AS y, n, ${corr(a, b)} AS corr FROM m" }
      .mkString("\n      UNION ALL ")
    s"""
      WITH t AS (SELECT $proj FROM lineitem),
      m AS (SELECT count(*)::BIGINT AS n,
              $sums
            FROM t)
      $branches
      ORDER BY x, y"""
  }

  val oracles: Map[String, String] = Map(
    "v_freshness" -> s"""
      WITH per AS (SELECT event_type, count(*)::BIGINT AS n_events,
                     max(epoch_us(CAST(ts AS TIMESTAMP)))::BIGINT AS last_us
                   FROM events GROUP BY 1),
      g AS (SELECT max(last_us) AS g_us FROM per)
      SELECT event_type, n_events, last_us,
             (g_us - last_us) // 60000000 AS lag_minutes,
             ((g_us - last_us) // 60000000) >= $StaleMinutes AS is_stale
      FROM per, g ORDER BY event_type""",
    "v_corr_matrix" -> corrMatrixOracle,
    "v_lang_entropy" -> s"""
      WITH cells AS (SELECT source, lang, count(*)::BIGINT AS c
                     FROM documents GROUP BY 1, 2),
      t AS (SELECT source, c,
             ${DetMath.lnDuckSelect("c", "lc")},
             round((c * lc_ln) * 1.0e9)::BIGINT AS term
            FROM cells),
      a AS (SELECT source, sum(c)::BIGINT AS n_docs,
              count(*)::BIGINT AS n_langs, sum(term)::BIGINT AS sl
            FROM t GROUP BY 1),
      f AS (SELECT source, n_docs, n_langs,
             ${DetMath.lnDuckSelect("n_docs", "lnn")},
             lnn_ln - (sl / 1.0e9) / n_docs AS entropy
            FROM a),
      g AS (SELECT source, n_docs, n_langs, entropy,
             ${DetMath.expDuckSelect("entropy", "eff")}
            FROM f)
      SELECT source, n_docs, n_langs, entropy, eff_exp AS eff_langs
      FROM g ORDER BY source""",
    "v_chisq" -> s"""
      WITH cells AS (SELECT source, lang, count(*)::BIGINT AS o
                     FROM documents GROUP BY 1, 2),
      rt AS (SELECT source, sum(o)::BIGINT AS r FROM cells GROUP BY 1),
      ct AS (SELECT lang, sum(o)::BIGINT AS c FROM cells GROUP BY 1),
      nt AS (SELECT sum(o)::BIGINT AS n,
               count(DISTINCT source)::BIGINT AS ns,
               count(DISTINCT lang)::BIGINT AS nl
             FROM cells),
      dense AS (SELECT rt.source, ct.lang, coalesce(cells.o, 0)::BIGINT AS o,
                  rt.r, ct.c, nt.n, nt.ns, nt.nl
                FROM rt CROSS JOIN ct
                LEFT JOIN cells
                  ON cells.source = rt.source AND cells.lang = ct.lang
                CROSS JOIN nt),
      x AS (SELECT *, (o * n - r * c)::BIGINT AS diff FROM dense),
      y AS (SELECT *,
              CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
              (CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE))
                / CAST(n * r * c AS DOUBLE) AS contrib
            FROM x),
      tot AS (SELECT ${Exact.dsumSql("contrib")} AS chi2 FROM y)
      SELECT source, lang, o AS n_obs, expected, contrib,
             ((ns - 1) * (nl - 1))::BIGINT AS dof, tot.chi2
      FROM y CROSS JOIN tot ORDER BY source, lang""",
    "v_benford" -> s"""
      WITH dg AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                      1, 1) AS digit,
               count(*)::BIGINT AS n_obs
        FROM orders GROUP BY 1),
      t AS (SELECT digit, n_obs, sum(n_obs) OVER ()::BIGINT AS total FROM dg),
      l AS (SELECT *,
             ${DetMath.lnDuckSelect("CAST(digit AS BIGINT)", "ld")},
             ${DetMath.lnDuckSelect("CAST(digit AS BIGINT) + 1", "ld1")},
             ${DetMath.lnDuckSelect("10", "l10")}
            FROM t)
      SELECT digit, n_obs, n_obs / total AS share,
             (ld1_ln - ld_ln) / l10_ln AS benford_expected,
             n_obs / total - (ld1_ln - ld_ln) / l10_ln AS deviation
      FROM l ORDER BY digit""",
    "v_kanon" -> """
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             count(*)::BIGINT AS class_size,
             count(*) < 5 AS below_k
      FROM customer GROUP BY 1, 2 ORDER BY 1, 2""",
    "v_ldiversity" -> """
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             count(*)::BIGINT AS class_size,
             count(DISTINCT CASE WHEN c_acctbal < 0.0 THEN 'neg'
               WHEN c_acctbal < 5000.0 THEN 'low' ELSE 'high' END)::BIGINT
               AS l_distinct,
             count(DISTINCT CASE WHEN c_acctbal < 0.0 THEN 'neg'
               WHEN c_acctbal < 5000.0 THEN 'low' ELSE 'high' END) < 2
               AS below_l
      FROM customer GROUP BY 1, 2 ORDER BY 1, 2""",
    "v_mad_anomaly" -> """
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      h1 AS (SELECT event_type, n, count(*)::BIGINT AS cnt
             FROM daily GROUP BY 1, 2),
      c1 AS (SELECT event_type, n,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY n
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS tot
             FROM h1),
      med AS (SELECT event_type,
                min(CASE WHEN cum >= (tot + 1) // 2 THEN n END) AS median_n
              FROM c1 GROUP BY 1),
      wd AS (SELECT d.event_type, d.day, d.n, m.median_n,
               abs(d.n - m.median_n) AS dev
             FROM daily d JOIN med m USING (event_type)),
      h2 AS (SELECT event_type, dev, count(*)::BIGINT AS cnt
             FROM wd GROUP BY 1, 2),
      c2 AS (SELECT event_type, dev,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY dev
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS tot
             FROM h2),
      mad AS (SELECT event_type,
                min(CASE WHEN cum >= (tot + 1) // 2 THEN dev END) AS mad
              FROM c2 GROUP BY 1)
      SELECT w.event_type, w.day, w.n AS n_events, w.median_n, w.dev,
             a.mad, w.dev > 3 * a.mad AS is_outlier
      FROM wd w JOIN mad a USING (event_type)
      ORDER BY w.event_type, w.day""",
    "v_emb_profile" -> s"""
      WITH u AS (SELECT j AS dim_idx, CAST(embedding[j + 1] AS DOUBLE) AS c
                 FROM embeddings,
                   generate_series(0, ${SimilarityOps.Dim} - 1) gs(j)
                 WHERE j < len(embedding))
      SELECT dim_idx::BIGINT AS dim_idx, count(*)::BIGINT AS n,
        ${Exact.davgSql("c")} AS mean_comp,
        min(c) AS min_comp, max(c) AS max_comp,
        sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero
      FROM u GROUP BY 1 ORDER BY dim_idx""",
    "v_quantile_sketch" -> """
      WITH bv AS (SELECT event_type, value, count(*)::BIGINT AS cnt
                  FROM events GROUP BY 1, 2),
      e AS (SELECT event_type, value, cnt,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY value)::BIGINT
                AS cum,
              sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
            FROM bv),
      ex AS (SELECT event_type, max(n)::BIGINT AS n,
               min(CASE WHEN cum >= (n + 1) // 2 THEN value END) AS p50_exact,
               min(CASE WHEN cum >= (9 * n + 9) // 10 THEN value END)
                 AS p90_exact,
               min(CASE WHEN cum >= (99 * n + 99) // 100 THEN value END)
                 AS p99_exact
             FROM e GROUP BY 1)
      SELECT event_type, n, p50_exact,
             (least(CAST(floor(p50_exact / 2.0) AS BIGINT), 255) + 1)
               * 2.0::DOUBLE AS p50_approx,
             abs((least(CAST(floor(p50_exact / 2.0) AS BIGINT), 255) + 1)
               * 2.0::DOUBLE - p50_exact) AS err_p50,
             p90_exact,
             (least(CAST(floor(p90_exact / 2.0) AS BIGINT), 255) + 1)
               * 2.0::DOUBLE AS p90_approx,
             abs((least(CAST(floor(p90_exact / 2.0) AS BIGINT), 255) + 1)
               * 2.0::DOUBLE - p90_exact) AS err_p90,
             p99_exact,
             (least(CAST(floor(p99_exact / 2.0) AS BIGINT), 255) + 1)
               * 2.0::DOUBLE AS p99_approx,
             abs((least(CAST(floor(p99_exact / 2.0) AS BIGINT), 255) + 1)
               * 2.0::DOUBLE - p99_exact) AS err_p99
      FROM ex ORDER BY event_type""",
    "v_referential" -> s"""
      WITH u AS (${Seq(
        fkSql("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        fkSql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        fkSql("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        fkSql("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        fkSql("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        fkSql("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        fkSql("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey")).mkString(" UNION ALL ")})
      SELECT fk_name, n_rows, n_null, n_orphans, n_orphans = 0 AS passed
      FROM u ORDER BY fk_name""",
    "v_skew" -> """
      WITH m AS (
        SELECT 'user_id' AS key_name, CAST(user_id AS VARCHAR) AS key_val
        FROM events
        UNION ALL
        SELECT 'event_type', event_type FROM events
        UNION ALL
        SELECT 'day', CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR)
        FROM events),
      g AS (SELECT key_name, key_val, count(*)::BIGINT AS cnt
            FROM m GROUP BY 1, 2),
      r AS (SELECT key_name, sum(cnt)::BIGINT AS n_rows,
              count(*)::BIGINT AS n_keys, max(cnt)::BIGINT AS max_key_rows
            FROM g GROUP BY 1)
      SELECT key_name, n_rows, n_keys, max_key_rows,
             n_rows / n_keys AS avg_key_rows,
             max_key_rows * n_keys / n_rows AS skew_ratio
      FROM r ORDER BY key_name""",
    "v_anomaly" -> """
      WITH g AS (SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   count(*)::BIGINT AS n
                 FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, day, n,
              count(*) OVER (PARTITION BY event_type)::BIGINT AS k,
              sum(n) OVER (PARTITION BY event_type)::BIGINT AS sn,
              sum(n * n) OVER (PARTITION BY event_type)::BIGINT AS sq
            FROM g),
      t AS (SELECT event_type, day, n,
              k * n - sn AS dev, k * sq - sn * sn AS varnum
            FROM w)
      SELECT event_type, day, n,
             CASE WHEN varnum = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE CAST(dev AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE)) END
               AS z,
             dev * dev > 4 * varnum AS is_anomaly
      FROM t ORDER BY event_type, day""",
    "v_histogram" -> """
      WITH b AS (SELECT least(n_chars::BIGINT // 250, 9::BIGINT) AS bucket
                 FROM documents),
      g AS (SELECT bucket, count(*)::BIGINT AS n_docs FROM b GROUP BY 1),
      t AS (SELECT bucket, n_docs, sum(n_docs) OVER ()::BIGINT AS n_tot
            FROM g)
      SELECT bucket, bucket * 250 AS lo_chars, (bucket + 1) * 250 AS hi_chars,
             n_docs, n_docs / n_tot AS frac
      FROM t ORDER BY bucket""",
    "v_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS col_name,
              sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
              count(DISTINCT $c)::BIGINT AS n_distinct,
              min($c)::VARCHAR AS min_val,
              max($c)::VARCHAR AS max_val
            FROM documents"""
      }.mkString("", "\n      UNION ALL ", "\n      ORDER BY col_name")
    },
    "v_constraints" -> """
      WITH l AS (
        SELECT 'doc_id_not_null' AS constraint_name,
               sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_violations
        FROM documents
        UNION ALL
        SELECT 'n_chars_consistent',
               sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT
        FROM documents
        UNION ALL
        SELECT 'lang_in_domain',
               sum(CASE WHEN lang NOT IN ('en','fr','es','de','zh') THEN 1 ELSE 0 END)::BIGINT
        FROM documents
        UNION ALL
        SELECT 'text_nonempty',
               sum(CASE WHEN length(text) <= 0 THEN 1 ELSE 0 END)::BIGINT
        FROM documents
        UNION ALL
        SELECT 'doc_id_unique',
               coalesce(sum(n), 0)::BIGINT
        FROM (SELECT doc_id, count(*)::BIGINT n FROM documents
              GROUP BY 1 HAVING count(*) > 1))
      SELECT constraint_name, n_violations, n_violations = 0 AS passed
      FROM l ORDER BY constraint_name""",
    "v_drift" -> s"""
      WITH dd AS (SELECT source,
                    least(n_chars::BIGINT // 250, 9::BIGINT) AS b
                  FROM documents),
      bysrc AS (SELECT source, b, count(*)::BIGINT AS a FROM dd GROUP BY 1, 2),
      st AS (SELECT source, count(*)::BIGINT AS n_s FROM dd GROUP BY 1),
      cb AS (SELECT b, count(*)::BIGINT AS r FROM dd GROUP BY 1),
      nt AS (SELECT count(*)::BIGINT AS n_tot FROM dd),
      grid AS (SELECT source, n_s, unnest(generate_series(0, 9))::BIGINT AS b
               FROM st),
      j AS (SELECT g.source, g.n_s, g.b,
              coalesce(bysrc.a, 0)::BIGINT AS a,
              coalesce(cb.r, 0)::BIGINT AS r, nt.n_tot
            FROM grid g
            LEFT JOIN bysrc ON g.source = bysrc.source AND g.b = bysrc.b
            LEFT JOIN cb ON g.b = cb.b
            CROSS JOIN nt),
      t AS (SELECT source, n_s,
              a + 1 AS a1, n_s + 10 AS ns1, r + 1 AS r1, n_tot + 10 AS nt1,
              ${DetMath.lnDuckSelect("a1", "la")},
              ${DetMath.lnDuckSelect("ns1", "lns")},
              ${DetMath.lnDuckSelect("r1", "lr")},
              ${DetMath.lnDuckSelect("nt1", "lnt")},
              round(((a1 / ns1 - r1 / nt1)
                     * ((la_ln - lns_ln) - (lr_ln - lnt_ln))) * 1.0e9)::BIGINT
                AS term
            FROM j)
      SELECT source, n_s AS n_docs, (sum(term)::BIGINT / 1.0e9) AS psi
      FROM t GROUP BY 1, 2 ORDER BY source""",
    "v_value_drift" -> s"""
      WITH base AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT
                 AS dn,
               greatest(least(CAST(floor(value / 25.0e0) AS BIGINT), 19), 0)
                 AS bin
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      dayc AS (SELECT event_type, dn, bin, count(*)::BIGINT AS c
               FROM base GROUP BY 1, 2, 3),
      sp AS (SELECT *, min(dn) OVER (PARTITION BY event_type) AS lo,
               max(dn) OVER (PARTITION BY event_type) AS hi
             FROM dayc),
      hist AS (SELECT event_type, bin,
                 sum(CASE WHEN dn * 2 <= lo + hi THEN c ELSE 0 END)::BIGINT
                   AS c1,
                 sum(CASE WHEN dn * 2 > lo + hi THEN c ELSE 0 END)::BIGINT
                   AS c2
               FROM sp GROUP BY 1, 2),
      g AS (SELECT *, sum(c1) OVER (PARTITION BY event_type)::BIGINT AS n1,
              sum(c2) OVER (PARTITION BY event_type)::BIGINT AS n2
            FROM hist),
      pg AS (SELECT *, greatest(c1 * n2, 1)::BIGINT AS pa,
               greatest(c2 * n1, 1)::BIGINT AS pb FROM g),
      l AS (SELECT *, ${graft.ops.DetMath.lnDuckSelect("pa", "la")},
              ${graft.ops.DetMath.lnDuckSelect("pb", "lb")} FROM pg),
      t AS (SELECT *, CASE
              WHEN n1 >= 2147483648 OR n2 >= 2147483648
              THEN error('v_value_drift: half size exceeds the product envelope (n >= 2^31) — shard by period before the PSI pass')
              WHEN c1 > 0 AND c2 > 0
              THEN CAST(round(((c1 / n1 - c2 / n2) * (la_ln - lb_ln))
                        * 1.0e9) AS BIGINT)
              ELSE 0 END AS q
            FROM l),
      a AS (SELECT event_type, max(n1)::BIGINT AS n_pre,
              max(n2)::BIGINT AS n_post, sum(q)::BIGINT AS sq,
              sum(CASE WHEN c2 = 0 THEN c1 ELSE 0 END)::BIGINT
                AS m_only_pre,
              sum(CASE WHEN c1 = 0 THEN c2 ELSE 0 END)::BIGINT
                AS m_only_post
            FROM t GROUP BY 1),
      f AS (SELECT event_type, n_pre, n_post, sq / 1.0e9 AS psi,
              CAST(m_only_pre AS DOUBLE) / CAST(n_pre AS DOUBLE)
                AS frac_only_pre,
              CAST(m_only_post AS DOUBLE) / CAST(n_post AS DOUBLE)
                AS frac_only_post
            FROM a)
      SELECT *, coalesce(psi > 0.2e0 OR frac_only_pre > 0.05e0
                 OR frac_only_post > 0.05e0, false) AS drift
      FROM f ORDER BY event_type""",
    "v_kl_sources" -> s"""
      WITH st AS (SELECT source, tok, count(*)::BIGINT AS a
                  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  GROUP BY 1, 2),
      win AS (SELECT source, a,
                sum(a) OVER (PARTITION BY tok)::BIGINT AS c,
                sum(a) OVER (PARTITION BY source)::BIGINT AS n_s
              FROM st),
      t AS (SELECT source, n_s,
              ${DetMath.lnDuckSelect("a", "la")},
              ${DetMath.lnDuckSelect("c", "lc")},
              ${DetMath.lnDuckSelect("n_s", "lns")},
              round(((a / n_s) * ((la_ln - lns_ln) - lc_ln))
                    * 1.0e12)::BIGINT AS term
            FROM win),
      g AS (SELECT source, n_s, sum(term)::BIGINT AS st
            FROM t GROUP BY 1, 2),
      f AS (SELECT source, n_s, st, sum(n_s) OVER ()::BIGINT AS n_tot FROM g),
      l AS (SELECT source, n_s, st, ${DetMath.lnDuckSelect("n_tot", "lnt")}
            FROM f)
      SELECT source, n_s AS n_tokens, st / 1.0e12 + lnt_ln AS kl_vs_corpus
      FROM l ORDER BY source""",
    "v_ks_halves" -> """
      WITH base AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                 CAST(CAST(ts AS TIMESTAMP) AS DATE))::BIGINT AS dn,
               value AS v
        FROM events WHERE value IS NOT NULL),
      mid AS (SELECT event_type, min(dn) AS lo, max(dn) AS hi
              FROM base GROUP BY 1),
      hist AS (
        SELECT b.event_type, b.v,
               sum(CASE WHEN b.dn * 2 <= m.lo + m.hi THEN 1 ELSE 0 END)::BIGINT
                 AS c1,
               sum(CASE WHEN b.dn * 2 <= m.lo + m.hi THEN 0 ELSE 1 END)::BIGINT
                 AS c2
        FROM base b JOIN mid m ON b.event_type = m.event_type
        GROUP BY 1, 2),
      cum0 AS (
        SELECT event_type, v, c1, c2,
               sum(c1) OVER (PARTITION BY event_type)::BIGINT AS n1,
               sum(c2) OVER (PARTITION BY event_type)::BIGINT AS n2
        FROM hist),
      cum AS (
        SELECT event_type, v, n1, n2,
               sum(CASE
                 WHEN n1 >= 67108864 OR n2 >= 67108864
                 THEN error('v_ks_halves: half size exceeds the 128-bit envelope (n >= 2^26) — shard by period before the K-S pass')
                 ELSE c1 END)
                 OVER (PARTITION BY event_type ORDER BY v)::BIGINT AS cum1,
               sum(c2) OVER (PARTITION BY event_type ORDER BY v)::BIGINT
                 AS cum2
        FROM cum0),
      g AS (SELECT event_type, max(n1) AS n1, max(n2) AS n2,
              max(abs(cum1 * n2 - cum2 * n1))::BIGINT AS a
            FROM cum GROUP BY 1)
      SELECT event_type, n1, n2, a AS d_num,
             CAST(a AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
               AS ks_d,
             a::HUGEINT * a * 1000000
               > 1844164::HUGEINT * n1 * n2 * (n1 + n2) AS is_drift
      FROM g ORDER BY event_type""",
    "v_value_fences" -> """
      WITH h AS (SELECT event_type, value AS v, count(*)::BIGINT AS cnt
                 FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      c AS (SELECT event_type, v, cnt,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY v)::BIGINT
                AS cum,
              sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
            FROM h),
      q AS (SELECT event_type, max(n) AS n,
              min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
              min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
            FROM c GROUP BY 1),
      f AS (SELECT event_type, n, q1, q3, q3 - q1 AS iqr,
              q1 - 1.5e0 * (q3 - q1) AS lo_fence,
              q3 + 1.5e0 * (q3 - q1) AS hi_fence
            FROM q),
      o AS (SELECT h.event_type,
              sum(CASE WHEN h.v < f.lo_fence OR h.v > f.hi_fence
                  THEN h.cnt ELSE 0 END)::BIGINT AS n_outliers
            FROM h JOIN f ON h.event_type = f.event_type GROUP BY 1)
      SELECT f.event_type, f.n, f.q1, f.q3, f.iqr, f.lo_fence, f.hi_fence,
             o.n_outliers, o.n_outliers / f.n AS outlier_share
      FROM f JOIN o ON f.event_type = o.event_type
      ORDER BY f.event_type""",
    "v_js_sources" -> jsDuckFrom(
      """SELECT source, tok, count(*)::BIGINT AS a
                  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  GROUP BY 1, 2"""))

  /** The whole v_js_sources DuckDB chain over ANY (source, tok, a)
    * token-count SQL — the oracle-side twin of [[jsSourcesFrom]],
    * parameterized the same way so a consumer keyed by something other
    * than `source` (the vocab-drift halves) replays the IDENTICAL
    * arithmetic. */
  private[ops] def jsDuckFrom(countsSql: String): String = s"""
      WITH st AS ($countsSql),
      stc AS (SELECT source, tok, a,
                sum(a) OVER (PARTITION BY tok)::BIGINT AS c
              FROM st),
      totals AS (SELECT source, sum(a)::BIGINT AS n_s FROM st GROUP BY 1),
      tt AS (SELECT source, n_s, sum(n_s) OVER ()::BIGINT AS n_tot
             FROM totals),
      tr AS (SELECT source, n_s, n_tot, n_tot - n_s AS n_r FROM tt),
      j AS (SELECT stc.source, stc.a, stc.c - stc.a AS b,
              tr.n_s, tr.n_r, tr.n_tot
            FROM stc JOIN tr ON stc.source = tr.source),
      g AS (SELECT source, a, b, n_s, n_r,
              CASE WHEN n_tot > 1073741824
                THEN error('v_js_sources: token ledger exceeds BIGINT envelope (n_tot > 2^30) — shard sources before the JS pass')
                ELSE greatest(1::BIGINT, 2 * a * n_r) END AS np,
              greatest(1::BIGINT, 2 * b * n_s) AS nq,
              greatest(1::BIGINT, a * n_r + b * n_s) AS dn
            FROM j),
      l AS (SELECT source, a, b, n_s, n_r,
              ${DetMath.lnDuckSelect("np", "lp")},
              ${DetMath.lnDuckSelect("nq", "lq")},
              ${DetMath.lnDuckSelect("dn", "ld")}
            FROM g),
      t AS (SELECT source, n_s, n_r, b,
              round(((a / n_s) * (lp_ln - ld_ln)) * 1.0e12)::BIGINT AS tp,
              CASE WHEN b >= 1
                THEN round(((b / n_r) * (lq_ln - ld_ln)) * 1.0e12)::BIGINT
                ELSE 0::BIGINT END AS tq
            FROM l),
      p AS (SELECT source, n_s, n_r, sum(tp)::BIGINT AS sp,
              sum(tq)::BIGINT AS sq, sum(b)::BIGINT AS sum_b
            FROM t GROUP BY 1, 2, 3)
      SELECT source, n_s AS n_tokens,
             (sp + sq) / 2.0e12 + ${DetMath.dlit(0.5 * math.log(2.0))}
               * (CAST(n_r - sum_b AS DOUBLE) / CAST(n_r AS DOUBLE))
               AS js_vs_rest
      FROM p ORDER BY source"""
}
