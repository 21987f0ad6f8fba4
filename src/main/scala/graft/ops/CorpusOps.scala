package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * between raw text and the trainer: benchmark decontamination, sequence
  * packing, stratified mixture sampling, corpus-frequency rarity scoring,
  * and PII/deny-list scrubbing. (Extensions beyond the reference — its
  * whole dataflow is the zip→parquet pipeline, src/builder.rs:23-119; these
  * are the operations the produced parquet feeds at 100 TB.)
  *
  * Oracle-exactness strategy (same as [[TextOps]]): exact integer
  * arithmetic everywhere, one double division at the end where a ratio is
  * reported, md5 as the only hash primitive — Spark and DuckDB agree
  * bit-for-bit.
  */
object CorpusOps {
  import Tables._

  // Shingle/tokenize expressions shared with DedupOps — these strings
  // must stay bit-identical across the whole oracle surface, so they
  // live in one place.
  private val Toks = DedupOps.Toks
  private val ShinglesOfText = DedupOps.ShinglesOfText
  private val ShinglesSql = DedupOps.ShinglesSql

  /** (doc_id, n_sh, sh) — one row per distinct shingle per document,
    * carrying the doc's shingle count (no join-back later). */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), expr(ShinglesOfText).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("bigint").as("n_sh"),
        explode(col("shs")).as("sh"))

  /** Benchmark decontamination: flag training documents sharing any
    * n-token shingle with the held-out eval set (here doc_id % 50 == 0 —
    * in production the benchmark suite), reporting the overlap fraction.
    * The Gopher/GPT-3 style 13-gram test-set filter; n=3 at test scale so
    * the synthetic corpus actually collides.
    *
    * Plan/scale: the eval side is benchmark data — thousands of docs, not
    * corpus-scale — so its distinct-shingle set is broadcast and the train
    * side never shuffles: scan → shingle → broadcast-hash-join → one
    * partial-agg shuffle on doc_id. No frequency cap here on purpose —
    * ANY eval overlap is signal (contrast the Jaccard DF cap, where hot
    * shingles are noise). */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val rows = shingleRows(s, d)
    val eval_ = rows.filter(col("doc_id") % 50 === 0)
      .select(col("sh")).distinct()
    rows.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(eval_), "sh")
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_hit"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        expr("n_hit / n_sh").as("contamination"))
      .orderBy("doc_id")
  }

  /** Tokens per packed training sequence. */
  val SeqBudget = 256

  /** Sequence packing, concat-and-chunk style: within each source shard,
    * documents are laid end-to-end in doc_id order and cut into
    * [[SeqBudget]]-token windows; each doc reports the sequence it starts
    * in and its offset there — the bookkeeping a trainer's data loader
    * needs. Exact: window SUM over BIGINT.
    *
    * Plan/scale: the running sum is a window PARTITIONED BY source — one
    * shuffle on the shard key, each shard's prefix sum local to its
    * partition. Packing is per-shard by design (matching how training data
    * is sharded on disk); a single GLOBAL concatenation order would
    * serialize the window into one partition at 100 TB — if ever needed,
    * do per-partition sums + a driver-side prefix of the (tiny)
    * per-partition totals, then a map-side add. */
  def seqPack(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"),
        expr(s"size($Toks)").cast("bigint").as("n_tokens"))
      .withColumn("start_tok",
        sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source")).orderBy(col("doc_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok DIV $SeqBudget").as("seq_id"),
        expr(s"start_tok % $SeqBudget").as("tok_offset"))
      .orderBy("doc_id")

  /** GLOBAL concat-and-chunk packing — documents laid end-to-end in
    * (source, doc_id) order across the WHOLE corpus — via the two-phase
    * prefix sum [[seqPack]]'s scaladoc promises: phase 1 computes
    * per-shard token totals (tiny — one row per shard), a window over
    * that tiny relation turns them into shard base offsets, and phase 2
    * broadcast-joins the bases back so each shard's local window only adds
    * a constant. The single-partition window runs over shard COUNT rows,
    * not corpus rows — the pattern that makes a global running sum scale.
    * Output is bit-identical to a global `SUM OVER (ORDER BY source,
    * doc_id)`, which is exactly what the oracle runs. */
  def seqPackGlobal(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"),
        expr(s"size($Toks)").cast("bigint").as("n_tokens"))
    val bases = docs.groupBy("source")
      .agg(sum(col("n_tokens")).as("shard_toks"))
      .withColumn("base",
        coalesce(
          sum(col("shard_toks")).over(
            w.orderBy(col("source")).rowsBetween(w.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("source"), col("base"))
    docs
      .withColumn("local_start",
        sum(col("n_tokens")).over(
          w.partitionBy(col("source")).orderBy(col("doc_id"))
            .rowsBetween(w.unboundedPreceding, 0)) - col("n_tokens"))
      .join(broadcast(bases), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("base") + col("local_start")).as("start_tok"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok DIV $SeqBudget").as("seq_id"),
        expr(s"start_tok % $SeqBudget").as("tok_offset"))
      .orderBy("doc_id")
  }

  /** Per-language keep-rate (percent) — the mixture weights of a
    * stratified corpus sample. */
  private val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 80, "fr" -> 50, "es" -> 30, "de" -> 20)
  private val DefaultRate = 10

  private def rateCase(col: String): String =
    SampleRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString(s"CASE $col ", " ", s" ELSE $DefaultRate END")

  /** Deterministic stratified sampling: keep a document iff
    * md5-hash(doc_id) mod 100 falls under its language's rate — the
    * mixture-weighting step that rebalances a corpus before training.
    * Deterministic (same sample on re-run, no RNG state), exact in both
    * engines (md5 is the shared primitive).
    *
    * Plan/scale: a narrow per-row filter — no shuffle, no sort, prunes to
    * (doc_id, lang) + text never read. Embarrassingly parallel at any
    * scale. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr(s"${DedupOps.h60("CAST(doc_id AS STRING)")} % 100").as("bucket"))
      .filter(expr(s"bucket < ${rateCase("lang")}"))
      .orderBy("doc_id")

  /** Corpus-frequency rarity scoring: per document, the document-frequency
    * stats of its distinct tokens (mean and min DF) — the unigram-LM-style
    * signal quality filters threshold on (rare-token-heavy docs are noise
    * or gold, frequent-token docs are boilerplate). Integer sums, one
    * double division — exact.
    *
    * Plan/scale: pass 1 builds the DF table (one shuffle on token,
    * partial-agg so map output is per-partition vocabulary); the table is
    * vocabulary-sized — millions of rows at web scale, ≪ corpus — so pass
    * 2 broadcast-joins it onto the exploded tokens and re-aggregates per
    * doc. If the vocab outgrows broadcast, drop the hint: AQE plans a
    * shuffled hash join on the same key and the shape still holds. */
  def rarity(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), expr(s"array_distinct($Toks)").as("td"))
      .select(col("doc_id"), explode(col("td")).as("tok"))
    val df = toks.groupBy("tok").agg(count(lit(1)).cast("bigint").as("df"))
    toks.join(broadcast(df), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct"), sum(col("df")).as("df_sum"),
        min(col("df")).as("min_df"))
      .select(col("doc_id"), col("n_distinct"), col("df_sum"),
        expr("df_sum / n_distinct").as("mean_df"), col("min_df"))
      .orderBy("doc_id")
  }

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private val NumberPat = "[0-9]{6,}"
  /** Deny-list term for the redaction demo — in production a generated
    * alternation over the configured terms. */
  private val DenyPat = "customer"

  /** PII / deny-list scrubbing: redact emails, long digit runs and
    * deny-listed terms, reporting per-doc hit counts alongside the cleaned
    * text. Patterns are ASCII-class-only, no lookaround — Java regex
    * (Spark) and RE2 (DuckDB) match identically; replacement is
    * all-occurrences in both (Spark's default; DuckDB's 'g' flag).
    *
    * Plan/scale: narrow per-row regex work, fully codegen'd, no shuffle —
    * the text column never moves between executors. */
  def piiScrub(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        expr(s"size(regexp_extract_all(text, '$EmailPat', 0))").cast("bigint").as("n_email"),
        expr(s"size(regexp_extract_all(text, '$NumberPat', 0))").cast("bigint").as("n_number"),
        expr(s"size(regexp_extract_all(text, '$DenyPat', 0))").cast("bigint").as("n_denied"),
        expr(s"""regexp_replace(regexp_replace(regexp_replace(text,
            '$EmailPat', '[EMAIL]'),
            '$NumberPat', '[NUMBER]'),
            '$DenyPat', '[REDACTED]')""").as("clean_text"))
      .orderBy("doc_id")

  /** End-to-end training-shard export — the deployment composition the
    * individual operators exist for, as ONE job: quality gate → exact
    * dedup (keep smallest doc_id per content hash) → deterministic shard
    * assignment (uniform md5 hash — never skewed) → per-shard
    * concat-and-chunk packing → one sorted parquet file per shard, plus a
    * shard manifest. The write is `partitionBy(shard)` with rows sorted by
    * (shard, start_tok), so a trainer's loader reads each shard
    * sequentially in packing order.
    *
    * Plan: the whole pipeline is one lineage — Catalyst pushes the cheap
    * length gate below the dedup shuffle; the packing window shuffles on
    * the shard key (uniform); repartition(shard) aligns the write with the
    * window partitioning so the sort feeds the writer directly. Returns
    * the shard manifest (shard → docs, tokens, sequences). */
  def exportTrainingShards(s: SparkSession, d: String, outDir: String,
      shards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val gated = documents(s, d)
      .withColumn("n_tokens", expr(s"size($Toks)").cast("bigint"))
      .filter(col("n_tokens") >= 20)
    val kept = gated
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .withColumn("shard",
        expr(s"${DedupOps.h60("CAST(doc_id AS STRING)")} % $shards").cast("int"))
    val packed = kept
      .withColumn("start_tok",
        sum(col("n_tokens")).over(
          w.partitionBy(col("shard")).orderBy(col("doc_id"))
            .rowsBetween(w.unboundedPreceding, 0)) - col("n_tokens"))
      .withColumn("seq_id", expr(s"start_tok DIV $SeqBudget"))
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("start_tok"))
      .select(col("shard"), col("doc_id"), col("text"), col("n_tokens"),
        col("start_tok"), col("seq_id"))
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "snappy").parquet(outDir)
    s.read.parquet(outDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      // sequences the loader will chunk = ceil(total/budget): the last doc
      // can straddle a window boundary, so max(seq_id)+1 would undercount
      .withColumn("n_seqs",
        expr(s"(n_tokens + ${SeqBudget - 1}) DIV $SeqBudget"))
      .orderBy("shard")
  }

  /** Gopher-rules-style multi-flag quality gate — the industrial pre-filter
    * a web corpus passes before dedup: per-document rule flags (length
    * bounds, mean word length band, type-token ratio floor, stopword
    * presence, repeated-token ceiling) plus the conjunction `keep_doc`.
    * Emitting per-rule flags (not just the verdict) is what lets a curator
    * measure each rule's kill rate before committing to it. Thresholds are
    * tuned to split the synthetic corpus; in production they're config.
    *
    * Exactness: every FLAG is an integer comparison (e.g. ttr ≥ 0.4 is
    * `5*nd >= 2*nt`) so no float threshold can straddle an engine
    * difference; the reported ratios are single double divisions of exact
    * ints. The repeated-token count comes from a sorted-run fold — O(n log
    * n) per row, whole-stage codegen, NO shuffle: the entire gate is one
    * narrow projection, embarrassingly parallel at any scale. (The oracle
    * counts the same maximum naively per distinct token — quadratic but
    * exact, and oracle-side only.) */
  /** The gate's rule inputs + verdict appended to ANY (doc_id, text, …)
    * relation — batch or streaming micro-batch (every expression is
    * narrow, so it gates a stream unchanged). Used by [[qualityGate]] for
    * the metrics report and by [[gateKept]] / streaming ingest as a
    * filter. */
  private[ops] def gateFlags(docs: DataFrame): DataFrame = {
    // max run length over the sorted token array = max token frequency
    val maxRun =
      """aggregate(sort_array(toks),
           named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
           (a, t) -> named_struct('prev', t,
             'run',  IF(t = a.prev, a.run + 1L, 1L),
             'best', GREATEST(a.best, IF(t = a.prev, a.run + 1L, 1L))),
           a -> a.best)"""
    docs
      .withColumn("toks", expr(Toks))
      .withColumn("nt", expr("size(toks)").cast("long"))
      .withColumn("nd", expr("size(array_distinct(toks))").cast("long"))
      .withColumn("nc", (length(col("text")) - col("nt") + 1).cast("long"))
      .withColumn("sh", expr(TextOps.hitsExpr(TextOps.EnglishStops)).cast("long"))
      .withColumn("mc", expr(maxRun).cast("long"))
  }

  private val GateRuleCols =
    Seq("toks", "nt", "nd", "nc", "sh", "mc")

  /** The gate rules as ONE (flag-name, predicate) list — the per-flag
    * report ([[qualityGate]]), the `keep_doc` conjunction, and the
    * streaming-ingest filter ([[gateKept]]) all derive from it, so a
    * threshold edit cannot silently desynchronize the reported verdicts
    * from the filter actually applied. (The oracle SQL intentionally
    * stays an independent literal copy — it is the check.) */
  private[ops] val GateRules: Seq[(String, String)] = Seq(
    "ok_len" -> "nt >= 30",
    "ok_word_len" -> "nc >= 4*nt AND nc <= 5*nt",
    "ok_ttr" -> "5*nd >= 2*nt",
    "ok_stop" -> "sh >= 2",
    "ok_rep" -> "8*mc <= nt")

  /** Conjunction of every [[GateRules]] predicate. */
  private[ops] val GateKeepExpr: String =
    GateRules.map { case (_, p) => s"($p)" }.mkString(" AND ")

  /** Rows of `docs` that pass every gate rule, original schema preserved —
    * the filter form of [[qualityGate]] (batch or streaming). */
  def gateKept(docs: DataFrame): DataFrame =
    gateFlags(docs)
      .filter(expr(GateKeepExpr))
      .drop(GateRuleCols: _*)

  def qualityGate(s: SparkSession, d: String): DataFrame =
    gateFlags(documents(s, d).select(col("doc_id"), col("text")))
      .select(Seq(col("doc_id"), col("nt").as("n_tokens"),
        expr("nc / nt").as("mean_tok_len"),
        expr("nd / nt").as("ttr"),
        col("sh").as("stop_hits"),
        expr("mc / nt").as("top_tok_ratio")) ++
        GateRules.map { case (name, p) => expr(p).as(name) } :+
        expr(GateKeepExpr).as("keep_doc"): _*)
      .orderBy("doc_id")

  /** Per-SOURCE quality-gate report — the "which crawl fails which rule"
    * roll-up of [[qualityGate]] (its per-doc verdicts are the audit
    * trail; a curator deciding where to spend cleaning effort reads the
    * source grain): per source, document count, per-rule FAILURE counts,
    * survivors of the full conjunction, and the pass rate. A source
    * failing mostly `ok_rep` is template spam (route to dedup); one
    * failing `ok_word_len`/`ok_stop` is non-prose or a language/encoding
    * problem (route to langid / re-extraction) — the rule mix IS the
    * diagnosis. Derives from the SAME [[GateRules]] list as the gate and
    * the streaming filter, so a threshold edit moves all three together.
    *
    * Plan/scale: one pruned scan through [[gateFlags]]'s narrow in-row
    * feature pass, then ONE source-key agg (catalog-sized output);
    * per-rule failure counts are conditional sums in the same agg —
    * no per-rule passes, no joins, one shuffle. */
  def gateBySource(s: SparkSession, d: String): DataFrame =
    gateBySourceFrom(
      documents(s, d).select(col("doc_id"), col("source"), col("text")))

  /** [[gateBySource]] over a caller-supplied (doc_id, source, text)
    * relation — the testable core (hand-built docs with known rule
    * verdicts pin each failure counter independently). */
  private[ops] def gateBySourceFrom(docsIn: DataFrame): DataFrame = {
    val failCols = GateRules.map { case (name, p) =>
      sum(when(!expr(p), 1L).otherwise(0L)).as(s"fail_${name.stripPrefix("ok_")}")
    }
    gateFlags(docsIn)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        failCols :+
          sum(when(expr(GateKeepExpr), 1L).otherwise(0L)).as("n_pass"): _*)
      .withColumn("pass_rate",
        expr("CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
      .orderBy("source")
  }

  /** Naive-Bayes quality classifier bootstrapped from the rule gate — the
    * learned-filter stage real curation pipelines distill their heuristic
    * gate into (a la the GPT-3/CCNet quality classifier, trained there on
    * curated-vs-crawl): class labels come from [[GateKeepExpr]] (the SAME
    * predicate the gate applies, so the training signal cannot drift from
    * the deployed rules), the model is add-one-smoothed multinomial NB
    * over tokens, and every document gets a smooth mean log-odds score —
    * the graded signal the binary gate can't give (for thresholding,
    * curriculum, or mixture reweighting).
    *
    * Per token w:  llr(w) = ln((c_pos(w)+1)·(N_neg+V)) − ln((c_neg(w)+1)·(N_pos+V))
    * Per doc:      nb_logodds = Σ_occurrences llr / n_tokens,  nb_keep = Σ > 0
    *
    * Exactness: counts are exact BIGINTs, both ln arguments are single
    * BIGINT products through [[DetMath]]'s cross-engine-deterministic ln,
    * per-token terms are 1e-9-scaled BIGINTs so the per-doc sum is
    * order-independent, and the verdict compares the exact integer sum
    * (not the rounded double). The product form keeps one ln per side;
    * its BIGINT ceiling (c·(N+V) < 2⁶³, i.e. ~3·10⁹ tokens per class at
    * equal counts) is far above any single-job shard — beyond that, split
    * into ln(c+1)+ln(N+V) at double the ln cost.
    *
    * Plan/scale: ONE documents scan feeds the token stream; the model is
    * one uniform token-key partial-agg shuffle down to a vocabulary-sized
    * relation (+ a 1-row constants broadcast); scoring re-joins tokens to
    * the model on the same uniform key (at 100 TB the DF-capped model is
    * a broadcast candidate) and aggregates once per doc_id. No driver
    * loop, no UDF — every expression codegens. */
  /** The gate-labeled token stream [[nbQuality]] trains and scores on. */
  private def nbToks(s: SparkSession, d: String): DataFrame =
    gateFlags(documents(s, d).select(col("doc_id"), col("text")))
      .withColumn("keep", expr(GateKeepExpr))
      .select(col("doc_id"), col("keep"), explode(col("toks")).as("tok"))

  /** The TRAINED model of [[nbQuality]]: one (tok, term) row per
    * vocabulary token, term = the 1e-9-scaled-BIGINT log-likelihood
    * ratio. Exposed so the streaming serve path
    * ([[graft.streaming.StreamOps.nbScoredIngestStream]]) broadcasts the
    * SAME relation the batch query trains — one definition, no
    * train/serve skew. The vocabulary-sized count relation is
    * materialized ONCE (the [[DedupOps.dedupClusters]] localCheckpoint
    * pattern): both the 1-row constants agg and the term projection
    * consume it, and without the checkpoint Spark re-derives each branch
    * from its own documents scan + token shuffle. */
  def nbModel(s: SparkSession, d: String): DataFrame = {
    val ct = nbToks(s, d).groupBy("tok").agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("cp"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("cn"))
      .localCheckpoint()
    val consts = ct.agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
      count(lit(1)).as("v"))
    val scored = ct.crossJoin(broadcast(consts))
      .withColumn("num", expr("(cp + 1) * (nn + v)"))
      .withColumn("den", expr("(cn + 1) * (np + v)"))
    DetMath.withLn(DetMath.withLn(scored, "num", "ln1"), "den", "ln2")
      .withColumn("term", expr(
        """cast(round(ln1_ln * 1.0e9) as bigint)
           - cast(round(ln2_ln * 1.0e9) as bigint)"""))
      .select(col("tok"), col("term"))
  }

  /** Rows of `docs` the NB `model` keeps (Σ term > 0), original schema
    * preserved — the filter form of [[nbQuality]], applied to ANY
    * (doc_id, text, …) relation: batch or streaming micro-batch. Tokens
    * outside the model vocabulary contribute nothing (dropped by the
    * join) — unseen evidence stays at its smoothed prior. Serve loops
    * should pass a MATERIALIZED model (localCheckpoint) so each
    * micro-batch broadcasts the trained relation instead of retraining
    * it. */
  def nbKept(docs: DataFrame, model: DataFrame): DataFrame = {
    val keep = docs.select(col("doc_id"), explode(expr(Toks)).as("tok"))
      .join(broadcast(model), "tok")
      .groupBy("doc_id").agg(sum(col("term")).as("sl"))
      .filter(col("sl") > 0).select("doc_id")
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** The per-doc scored relation (doc_id, keep_label, n_tokens, sl) —
    * the single core [[nbQuality]], [[nbAuc]] and [[nbCalibration]] all
    * consume, so the score definition and every metric computed over it
    * move in lockstep. `sl` is the exact 1e-9-scaled BIGINT log-odds sum
    * (order-independent), `n_tokens` counts only in-vocabulary
    * occurrences (the inner model join — unseen tokens stay at the
    * smoothed prior and contribute no evidence). */
  private[ops] def nbScored(s: SparkSession, d: String): DataFrame =
    nbToks(s, d).join(nbModel(s, d), "tok")
      .groupBy("doc_id")
      .agg(max(col("keep")).as("keep_label"), count(lit(1)).as("n_tokens"),
        sum(col("term")).as("sl"))

  def nbQuality(s: SparkSession, d: String): DataFrame =
    nbScored(s, d)
      .select(col("doc_id"), col("keep_label"), col("n_tokens"),
        expr("(sl / 1.0e9) / n_tokens").as("nb_logodds"),
        expr("sl > 0").as("nb_keep"))
      .orderBy("doc_id")

  /** Exact ROC-AUC of the NB quality classifier against its own gate
    * labels — THE threshold-free number a curator reads before picking a
    * keep cutoff on [[nbQuality]]'s smooth score (the confusion matrix
    * [[nbConfusion]] is one operating point; this integrates all of
    * them). The ranking score is the LENGTH-NORMALIZED mean log-odds
    * (`nb_logodds` — the graded signal downstream consumers threshold,
    * and the same axis [[nbCalibration]] bins), quantized to exact
    * integer micro-units per token (⌊sl/(1000·n_tokens)⌋ of the 1e-9
    * ledger = 1e-6 log-odds units) so tie blocks have an exact
    * cross-engine key; 1e-6 is far below any meaningful score
    * distinction, and the quantized AUC is itself exactly defined.
    * Mann–Whitney form with the standard tie treatment:
    * AUC = (#{pos > neg pairs} + ½·#{tied pairs}) / (n_pos·n_neg).
    *
    * The positive-negative pair count never materializes: within a tie
    * block of score m (p positives, q negatives, Q negatives strictly
    * below), the block contributes p·(2Q + q) to the ×2 ledger — so the
    * whole statistic is tie-block closed form (the [[EventOps.qGini]]
    * device), and Q itself decomposes bucket-locally: a window
    * PARTITIONED by fixed-width score bucket (0.001 log-odds units —
    * ≤ 88k buckets by the |llr| < 44 bound, ~hundreds populated where
    * the mean concentrates) plus a broadcast prefix-sum base over the
    * bucket-sized relation (the [[curriculum]] two-phase shape) — no
    * unpartitioned window ever touches a data-sized frame. The ledger
    * rides DECIMAL(38,0) (p·Q overflows BIGINT at ~10¹⁰ docs per
    * class); one double division at the end, identical in both engines
    * on the same exact integers.
    *
    * Plan/scale: the [[nbScored]] pass (one scan + token shuffle +
    * checkpointed model), one (bucket, mkey) partial agg, one
    * partitioned prefix window, one bounded bases pass, one 1-row final
    * agg. */
  def nbAuc(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // shifted truncating division == floor (numerator kept positive by
    // the +64e6-bin offset; |mean llr| < 44 ≪ 64); truncation toward
    // zero is monotone, so bucket order refines score order and equal
    // scores share a bucket by construction
    // tie blocks materialized ONCE (the nbModel checkpoint device): the
    // in-bucket prefix window and the bucket-bases branch both read the
    // distinct-score relation instead of re-running the scored core
    val tb = nbScored(s, d)
      .withColumn("mkey", expr(
        "(sl + 64000000000L * n_tokens) DIV (1000 * n_tokens) - 64000000"))
      .withColumn("bkt", expr("mkey DIV 1000"))
      .groupBy("bkt", "mkey")
      .agg(sum(when(col("keep_label"), 1L).otherwise(0L)).as("p"),
        sum(when(col("keep_label"), 0L).otherwise(1L)).as("q"))
      .localCheckpoint()
    val local = tb.withColumn("qloc", coalesce(
      sum(col("q")).over(w.partitionBy(col("bkt")).orderBy(col("mkey"))
        .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
    val bases = tb.groupBy("bkt").agg(sum(col("q")).as("qb"))
      .withColumn("qbase", coalesce(
        sum(col("qb")).over(w.orderBy(col("bkt"))
          .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("qbase"))
    local.join(broadcast(bases), "bkt")
      .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        // ×2 ledger: 2·p·(negatives strictly below) + p·q ties
        sum(expr("CAST(p AS DECIMAL(38,0)) * (2 * (qbase + qloc) + q)"))
          .as("s2"))
      // try_divide: a single-class corpus (every doc kept, or none — the
      // 10x open-mode ScaleGen corpus reaches it) has NO defined AUC;
      // NULL is DuckDB's native x/0 and the honest verdict, not a crash
      .select(col("n_pos"), col("n_neg"), expr(
        """try_divide(CAST(s2 AS DOUBLE),
           CAST(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg AS DOUBLE))""")
        .as("auc"))
  }

  /** Calibration (reliability) bins for the NB score: documents bucketed
    * by MEAN per-token log-odds in 0.005-unit bins, each bin reporting
    * its empirical keep rate beside its corpus share — the curve that
    * says whether a higher score actually means "kept more often" before
    * anyone trusts the score as a sampling weight
    * ([[dsirWeights]]-style) rather than a ranking. Bins are fine
    * because the signal is: individual token evidence is weak, so the
    * per-token MEAN concentrates near zero on any real corpus.
    *
    * The bin is an EXACT integer floor division of the 1e-9 BIGINT
    * ledger — bin = ⌊(sl/1e9/n_tokens)/0.005⌋ = ⌊2·sl/(1e7·n_tokens)⌋
    * computed as a shifted truncating division (numerator offset +16384
    * bins keeps it positive, where truncation equals floor in both
    * engines; |mean llr| < 44 → |bin| < 8800 < 16384 guarantees the
    * shift suffices, and the shifted numerator stays under 2⁶³ for docs
    * up to ~3·10⁷ tokens) — so bin identity is bit-exact cross-engine,
    * no double ever decides a boundary.
    *
    * Plan/scale: the [[nbScored]] pass + one narrow bin projection + a
    * bounded bin agg (≤ ~17.6k bins by the llr bound; tens populated in
    * practice — the mean concentrates) with map-side partials; the share
    * window runs over the bin relation, scale-free. */
  def nbCalibration(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    nbScored(s, d)
      .withColumn("bin", expr(
        "(2 * sl + 163840000000L * n_tokens) DIV (10000000L * n_tokens) - 16384"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_label"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("share",
        col("n_docs") / sum(col("n_docs")).over(w.partitionBy()))
      .select(col("bin"), expr("CAST(bin AS DOUBLE) * 0.005e0").as("bin_lo"),
        col("n_docs"), col("n_keep"),
        (col("n_keep") / col("n_docs")).as("keep_rate"), col("share"))
      .orderBy("bin")
  }

  /** DSIR feature-space size: hashed unigram buckets. Tiny here so every
    * bucket is exercised at test scale; production uses 10k–100k. The
    * POINT of the hashed space is that the model is O(B) regardless of
    * vocabulary — always broadcastable. */
  private val DsirBuckets = 64

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much more
    * likely its hashed-unigram bag is under a TARGET distribution (here
    * the `src0` source, standing in for the curated corpus) than under
    * the RAW corpus distribution — the resampling weight that tilts a
    * 100 TB crawl toward a curated domain without training a model.
    * Unlike [[nbQuality]] (vocabulary-sized model, gate-derived labels)
    * the feature space is [[DsirBuckets]] hash buckets, so the model is
    * fixed-size and the add-one smoothing covers the whole space.
    *
    *   lw(bkt) = ln((c_tgt+1)·(N_raw+B)) − ln((c_raw+1)·(N_tgt+B))
    *   dsir_logw = Σ_occurrences lw(bucket(tok))
    *
    * Exactness: same ledger as [[nbQuality]] — exact BIGINT counts, one
    * BIGINT-product [[DetMath]] ln per side, 1e-9-scaled BIGINT terms so
    * the per-doc sum is order-independent; the bucket hash is the repo's
    * md5-derived h60 (bit-identical in both engines).
    *
    * Plan/scale: ONE documents scan → narrow hash+explode; the model is
    * a B-key partial-agg shuffle materialized once (localCheckpoint, both
    * the constants agg and the scoring join read it); scoring is a
    * BROADCAST join (the model is 64 rows by construction — at any corpus
    * scale) + one doc-key agg. This is the shape DSIR exists for: the
    * raw-corpus pass never shuffles anything wider than doc_id. */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    dsirScored(s, d)
      .select(col("doc_id"), col("is_target"), col("n_tokens"),
        expr("sl / 1.0e9").as("dsir_logw"),
        expr("(sl / 1.0e9) / n_tokens").as("mean_logw"))
      .orderBy("doc_id")

  /** The exact-BIGINT core of [[dsirWeights]]: one `(doc_id, is_target,
    * n_tokens, sl)` row per document, `sl` the 1e-9-scaled log importance
    * weight. Kept in the scaled-integer ledger (no division back to
    * double) so downstream consumers — [[gumbelSample]]'s sampling keys —
    * stay order-independent and engine-exact. */
  private def dsirScored(s: SparkSession, d: String): DataFrame = {
    val B = DsirBuckets
    val toks = documents(s, d)
      .select(col("doc_id"), (col("source") === "src0").as("is_target"),
        explode(expr(Toks)).as("tok"))
      .withColumn("bkt", expr(s"${DedupOps.h60("tok")} % $B"))
    val ct = toks.groupBy("bkt").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("cnt_t"),
      count(lit(1)).as("cnt_r"))
      .localCheckpoint()
    val consts = ct.agg(sum(col("cnt_t")).as("nt_tot"),
      sum(col("cnt_r")).as("nr_tot"))
    val scored = ct.crossJoin(broadcast(consts))
      .withColumn("num", expr(s"(cnt_t + 1) * (nr_tot + $B)"))
      .withColumn("den", expr(s"(cnt_r + 1) * (nt_tot + $B)"))
    val terms = DetMath.withLn(DetMath.withLn(scored, "num", "ln1"), "den", "ln2")
      .withColumn("term", expr(
        """cast(round(ln1_ln * 1.0e9) as bigint)
           - cast(round(ln2_ln * 1.0e9) as bigint)"""))
      .select(col("bkt"), col("term"))
    toks.join(broadcast(terms), "bkt")
      .groupBy("doc_id")
      .agg(max(col("is_target")).as("is_target"),
        count(lit(1)).as("n_tokens"), sum(col("term")).as("sl"))
  }

  /** Power-of-2 length-bucketed batching report — the padding-waste dial
    * for fixed-shape training batches: bucket each document at the
    * smallest power-of-two sequence length that holds it (the dynamic-
    * batching ladder), then price the padding a bucketed batcher pays
    * (`cap − n_tokens` per doc). Everything is integer-exact — the bucket
    * cap comes from the binary bit length, never a float log2 — and the
    * waste fraction is one division of exact BIGINTs at the end.
    *
    * Plan/scale: ONE pruned documents scan → narrow all-codegen bucket
    * assignment → a partial-agg shuffle over ≤ ~30 bucket keys. Nothing
    * wider than the bucket id ever crosses the wire. */
  def lengthBuckets(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(expr(s"cast(size($Toks) as bigint)").as("nt"))
      .withColumn("k", expr("length(bin(nt)) - 1"))
      .withColumn("cap", expr(
        """case when nt = shiftleft(cast(1 as bigint), cast(k as int))
           then nt else shiftleft(cast(1 as bigint), cast(k + 1 as int))
           end"""))
      .groupBy("cap").agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("sum_tokens"))
      .select(col("cap").as("bucket_cap"), col("n_docs"), col("sum_tokens"),
        expr("cap * n_docs - sum_tokens").as("pad_tokens"),
        expr("""cast(cap * n_docs - sum_tokens as double)
                / cast(cap * n_docs as double)""").as("waste_frac"))
      .orderBy("bucket_cap")

  /** Sample size for [[gumbelSample]]. Tiny here; production sets the
    * token/document budget the resampled corpus should hit. */
  private val GumbelK = 50

  /** `ln(2^60 + 1)` and `ln(1e9)` operands as integer literals — both
    * engines run the same [[DetMath]] ln over them, so the constants can
    * never diverge by a ulp the way a precomputed double literal could. */
  private val U60 = "1152921504606846977"

  /** Gumbel-top-k importance RESAMPLING — the step DSIR exists for:
    * draw [[GumbelK]] documents without replacement with probability
    * proportional to `exp(dsir_logw)` (Xie et al. 2023's resampling;
    * Gumbel-max top-k trick). Each doc gets
    *
    *   samp_key = logw + g,   g = −ln(−ln u) ~ Gumbel(0,1)
    *
    * and the top-k keys ARE the weighted sample. The noise is
    * hash-deterministic (reproducible pipelines re-run identically):
    * `u = (h60('gs' || doc_id) + 1) / (2^60 + 1)`, and every transcendental
    * step stays in the cross-engine-exact ledger — `−ln u` via two integer
    * [[DetMath]] lns, quantized to 1e-9-scaled BIGINT (floored at 1), then
    * `g = ln(1e9) − ln(X)` via two more. The key is a pure BIGINT sum of
    * the scaled logw and scaled noise, so ordering is bit-identical in
    * both engines.
    *
    * Plan/scale: [[dsirScored]]'s plan (one documents scan, broadcast
    * 64-row model) → a narrow all-codegen key projection → global top-k
    * via TakeOrdered (never a full sort); the rank window runs over the
    * K-row result only (the [[tokenBudget]] pattern). */
  def gumbelSample(s: SparkSession, d: String): DataFrame = {
    val base = dsirScored(s, d).withColumn("h1",
      expr(s"${DedupOps.h60("concat('gs', cast(doc_id as string))")} + 1"))
    val lns = DetMath.withLn(DetMath.withLn(base, "h1", "lh"), U60, "lc")
      .withColumn("xs", expr(
        "greatest(cast(round((lc_ln - lh_ln) * 1.0e9) as bigint), 1)"))
    val keyed = DetMath.withLn(DetMath.withLn(lns, "xs", "lx"),
        "1000000000", "l9")
      .withColumn("gs", expr("cast(round((l9_ln - lx_ln) * 1.0e9) as bigint)"))
      .withColumn("samp_key", expr("sl + gs"))
      .select("doc_id", "is_target", "n_tokens", "sl", "gs", "samp_key")
    val top = keyed.orderBy(col("samp_key").desc, col("doc_id")).limit(GumbelK)
    top.select(
      expr("cast(row_number() over (order by samp_key desc, doc_id) as bigint)")
        .as("rank"),
      col("doc_id"), col("is_target"), col("n_tokens"),
      expr("sl / 1.0e9").as("dsir_logw"),
      expr("gs / 1.0e9").as("gumbel"),
      col("samp_key"))
      .orderBy("rank")
  }

  /** NB-vs-gate confusion matrix — the measurement loop for
    * [[nbQuality]], as `s_ann_recall` is for the ANN tier and
    * `d_minhash_est_quality` for MinHash: how often the learned
    * classifier's verdict agrees with the rule gate that trained it,
    * per (label, prediction) cell with corpus shares. The off-diagonal
    * cells are the docs where the smooth model generalizes past (or
    * fails) its own training rule — the number a curator reads before
    * swapping the gate for the classifier.
    *
    * Plan/scale: [[nbQuality]]'s plan (single source of truth — the
    * confusion is GROUP BY over its output, so model and report can
    * never diverge) plus a 4-key agg; the share window runs over the
    * 4-row matrix, scale-free. */
  def nbConfusion(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    nbQuality(s, d)
      .groupBy("keep_label", "nb_keep").agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / sum(col("n")).over(w.partitionBy()))
      .orderBy("keep_label", "nb_keep")
  }

  /** Leakage-free train/val/test split report: assignment is a pure
    * function of the CONTENT hash (8/1/1 by h60(text) mod 10), so
    * byte-identical duplicates land in the same split by construction —
    * the property that keeps test data out of training when the corpus
    * still carries exact dupes. The report counts docs and distinct
    * content hashes per split AND verifies the invariant: per-hash
    * distinct-split counts roll up to `n_leaked_hashes`, which must be 0
    * for any content-keyed assignment (and immediately is not if someone
    * re-keys the split on doc_id or a random() — the regression this
    * report exists to catch).
    *
    * Plan/scale: one scan → narrow hash + split assign; ONE uniform
    * md5-key shuffle to hash grain; the split rollup is a 3-key agg.
    * Nothing driver-side; the same two-shuffle shape as [[DedupOps
    * .exactDedup]]. */
  def dataSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("bkt", expr(s"${DedupOps.h60("text")} % 10"))
      .withColumn("sp", expr(
        "CASE WHEN bkt < 8 THEN 'train' WHEN bkt = 8 THEN 'val' ELSE 'test' END"))
      .groupBy("h").agg(max(col("sp")).as("sp"), count(lit(1)).as("nd"),
        count_distinct(col("sp")).as("nsp"))
      .groupBy("sp").agg(sum(col("nd")).as("n_docs"),
        count(lit(1)).as("n_hashes"),
        sum(when(col("nsp") > 1, 1L).otherwise(0L)).as("n_leaked_hashes"))
      .select(col("sp").as("split"), col("n_docs"), col("n_hashes"),
        col("n_leaked_hashes"))
      .orderBy("split")

  /** Chunk window width / stride (tokens). Stride < width → overlapping
    * windows, the standard RAG-embedding layout. */
  val ChunkW = 64
  val ChunkS = 48

  /** Fixed-window document chunking with overlap — the fan-out step of an
    * embedding/RAG pipeline: every document becomes ceil(nt / stride)
    * windows of [[ChunkW]] tokens starting every [[ChunkS]], the last
    * window(s) short. Emits the bookkeeping an embedder needs (chunk id,
    * token offset, window length) beside the re-joined text.
    *
    * Plan/scale: one pruned scan and one Generate — `sequence` over the
    * chunk count then a per-chunk `slice` of the bound token array; fully
    * narrow, no shuffle, embarrassingly parallel. Output rows ≈ corpus
    * tokens / stride. */
  def chunkWindows(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), expr(Toks).as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("size(toks)").cast("long").as("nt"))
      .select(col("doc_id"), col("nt"), col("toks"),
        explode(expr(s"sequence(0L, (nt - 1) DIV $ChunkS)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkS).as("start_tok"),
        least(lit(ChunkW), col("nt") - col("chunk_id") * ChunkS)
          .as("n_chunk_toks"),
        expr(s"array_join(slice(toks, CAST(chunk_id * $ChunkS + 1 AS INT), $ChunkW), ' ')")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  /** Temperature-based mixture reweighting — the multilingual rebalancing
    * rule (w_l ∝ n_l^α, α = 0.5 here, the exponentiated-count smoothing
    * mBERT/XLM-R popularized): per-language doc and token counts, the
    * normalized sampling weight, and the up/down-sampling factor vs the
    * natural frequency (>1 = low-resource language gets oversampled).
    *
    * Exactness: sqrt is correctly-rounded IEEE in both engines; the
    * denominator — a SUM of K sqrt doubles, which would be partition
    * -order-dependent — goes through [[Exact.dsum]] (micro-rounded
    * integer sum), and every later step is one fixed-shape division of
    * identical doubles. Plan: one partial-agg shuffle to K language
    * rows, a one-row broadcast for the denominator — scale-free. */
  def mixWeights(s: SparkSession, d: String): DataFrame = {
    val perLang = documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr(s"size($Toks)")).cast("long").as("n_tokens"))
    val denomRow = perLang.agg(
      Exact.dsum(sqrt(col("n_docs").cast("double"))).as("denom"),
      sum(col("n_docs")).as("total"))
    perLang.crossJoin(broadcast(denomRow))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("sqrt(CAST(n_docs AS DOUBLE)) / denom").as("weight"),
        expr("""(sqrt(CAST(n_docs AS DOUBLE)) / denom)
                / (CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))""")
          .as("sample_factor"))
      .orderBy("lang")
  }

  /** Training-token budget for [[budgetAlloc]]. */
  val TokenBudget = 1000000L

  /** Largest-remainder allocation of a fixed token budget across the
    * [[mixWeights]] mixture: each language gets floor(budget · weight)
    * tokens, then the languages with the largest fractional remainders
    * (ties → language asc) absorb the leftover one token each — the exact
    * integer split a data loader needs (Σ alloc = budget EXACTLY; naive
    * rounding misses by up to K/2).
    *
    * Exactness: weights are the bit-identical mixWeights doubles; floor
    * is exact; the remainder ranking compares identical doubles with a
    * deterministic tie-break; the deficit is integer arithmetic. Plan:
    * everything after the K-row mixture agg is window work over K rows —
    * scale-free. */
  def budgetAlloc(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // deficit via an unpartitioned window over the SAME K rows — a second
    // aggregation branch would fork the plan and re-execute the mixture
    // lineage (K is the language count, so the single-partition window is
    // exactly the tiny-relation case where it's free)
    val all = w.rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    mixWeights(s, d)
      .select(col("lang"), col("weight"),
        expr(s"CAST(floor(weight * ${TokenBudget}D) AS BIGINT)").as("base"),
        expr(s"weight * ${TokenBudget}D - floor(weight * ${TokenBudget}D)").as("rem"))
      .withColumn("rk", row_number().over(
        w.orderBy(col("rem").desc, col("lang"))))
      .withColumn("deficit", lit(TokenBudget) - sum(col("base")).over(all))
      .select(col("lang"), col("weight"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .orderBy("lang")
  }

  /** Curriculum staging: every document globally ranked by the
    * [[TextOps.quality]] score (best first, doc_id tie-break) and split
    * into 4 stages — the easy→hard ordering a curriculum-trained run
    * consumes, with the rank kept so a scheduler can stream in order.
    *
    * The global rank is NOT a single-partition window: it decomposes as
    * bucket-local row_number + a prefix-sum base over fixed-width score
    * buckets (floor(score·20)) — the [[seqPackGlobal]] two-phase shape.
    * Local windows partition by bucket; the base table is catalog-sized
    * and broadcast. stage = 4·(rank−1) DIV N + 1 with N a broadcast
    * 1-row count. At 100 TB: widen to ~1e4 buckets (still catalog-sized)
    * so each bucket's local sort fits an executor; everything else is
    * unchanged. */
  def curriculum(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val scored = TextOps.quality(s, d)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("bkt", expr(
        "least(greatest(cast(floor(quality_score * 20.0e0) as bigint), -20L), 40L)"))
    // n_tot rides the catalog-sized bases relation as a window sum — a
    // separate count branch would re-expand the scoring scan
    val bases = scored.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("base", coalesce(
        sum(col("cnt")).over(
          w.orderBy(col("bkt").desc).rowsBetween(w.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_tot", sum(col("cnt")).over(w.partitionBy()))
      .select(col("bkt"), col("base"), col("n_tot"))
    scored
      .withColumn("lr", row_number().over(
        w.partitionBy(col("bkt"))
          .orderBy(col("quality_score").desc, col("doc_id"))).cast("bigint"))
      .join(broadcast(bases), "bkt")
      .select(col("doc_id"), col("quality_score"),
        (col("base") + col("lr")).as("rank"),
        expr("(4 * (base + lr - 1)) DIV n_tot + 1").as("stage"))
      .orderBy("doc_id")
  }

  /** Quality-budget curve: cumulative docs/tokens retained when keeping
    * everything scoring ABOVE each bin — the dial a curator reads to
    * pick the keep threshold on [[nbQuality]]'s score ("a cutoff at
    * +0.01 keeps 46% of tokens"), exactly as [[DedupOps
    * .thresholdSweep]] is the dial for the dedup tier. Same exact
    * integer binning as [[nbCalibration]] (one rule, both queries);
    * cumulation runs top-down so each row IS a candidate cutoff's
    * retained mass. `n_tokens` is the full per-doc token count: the
    * model's vocabulary is built from this corpus, so every occurrence
    * survives the scoring join.
    *
    * Plan/scale: the [[nbScored]] pass + a bin-sized agg; both
    * cumulative sums ride ONE descending window over the bin relation
    * (bounded by the llr bound — the catalog-window argument), and the
    * token total is a window over the same relation. */
  def qualityBudget(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val wDesc = w.orderBy(col("bin").desc)
      .rowsBetween(w.unboundedPreceding, 0)
    nbScored(s, d)
      .withColumn("bin", expr(
        "(2 * sl + 163840000000L * n_tokens) DIV (10000000L * n_tokens) - 16384"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("cum_docs", sum(col("n_docs")).over(wDesc))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wDesc))
      .withColumn("cum_token_share",
        col("cum_tokens") / sum(col("n_tokens")).over(w.partitionBy()))
      .select(col("bin"), expr("CAST(bin AS DOUBLE) * 0.005e0").as("bin_lo"),
        col("n_docs"), col("n_tokens"), col("cum_docs"), col("cum_tokens"),
        col("cum_token_share"))
      .orderBy("bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_quality_budget" -> qualityBudget,
    "t_curriculum" -> curriculum,
    "t_decontaminate" -> decontaminate,
    "t_seq_pack" -> seqPack,
    "t_seq_pack_global" -> seqPackGlobal,
    "q_stratified_sample" -> stratifiedSample,
    "t_rarity" -> rarity,
    "t_pii_scrub" -> piiScrub,
    "t_mix_weights" -> mixWeights,
    "t_quality_gate" -> qualityGate,
    "t_gate_by_source" -> gateBySource,
    "t_nb_quality" -> nbQuality,
    "t_auc" -> nbAuc,
    "t_calibration" -> nbCalibration,
    "t_dsir" -> dsirWeights,
    "t_data_split" -> dataSplit,
    "t_nb_confusion" -> nbConfusion,
    "t_chunk_windows" -> chunkWindows,
    "t_budget_alloc" -> budgetAlloc,
    "t_gumbel_sample" -> gumbelSample,
    "t_length_buckets" -> lengthBuckets)

  private val H60DocId = DedupOps.h60Sql("doc_id::VARCHAR")

  /** The [[dsirScored]] oracle CTE chain up to the per-doc `ag` relation
    * (doc_id, is_target, n_tokens, sl) — shared by the t_dsir and
    * t_gumbel_sample oracles so the weight model and the sample drawn
    * from it replay ONE definition. */
  private val DsirCtes = s"""t AS (SELECT doc_id, source = 'src0' AS is_target,
                   unnest(string_split(text, ' ')) AS tok
                 FROM documents),
      b AS (SELECT doc_id, is_target,
              ${DedupOps.h60Sql("tok")} % $DsirBuckets AS bkt
            FROM t),
      ct AS (SELECT bkt,
               sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT cnt_t,
               count(*)::BIGINT cnt_r
             FROM b GROUP BY 1),
      k AS (SELECT sum(cnt_t)::BIGINT nt_tot, sum(cnt_r)::BIGINT nr_tot
            FROM ct),
      sc AS (SELECT bkt, ((cnt_t + 1) * (nr_tot + $DsirBuckets))::BIGINT num,
               ((cnt_r + 1) * (nt_tot + $DsirBuckets))::BIGINT den
             FROM ct CROSS JOIN k),
      l1 AS (SELECT bkt, den,
               ${DetMath.lnDuckSelect("num", "ln1")}
             FROM sc),
      l2 AS (SELECT bkt, ln1_ln,
               ${DetMath.lnDuckSelect("den", "ln2")}
             FROM l1),
      w AS (SELECT bkt,
              CAST(round(ln1_ln * 1.0e9) AS BIGINT)
              - CAST(round(ln2_ln * 1.0e9) AS BIGINT) AS term
            FROM l2),
      ag AS (SELECT b.doc_id, max(b.is_target) AS is_target,
               count(*)::BIGINT AS n_tokens, sum(w.term)::BIGINT AS sl
             FROM b JOIN w USING (bkt) GROUP BY 1)"""

  /** The [[nbQuality]] oracle's CTE chain up to the per-doc `ag` relation
    * (doc_id, keep_label, n_tokens, sl) — shared by the t_nb_quality and
    * t_nb_confusion oracles so the two checks replay ONE model. */
  private val NbCtes = s"""t AS (SELECT doc_id, text, string_split(text, ' ') toks FROM documents),
      s AS (SELECT doc_id, toks, len(toks)::BIGINT nt,
              len(list_distinct(toks))::BIGINT nd,
              (length(text) - len(toks) + 1)::BIGINT nc,
              ${TextOps.hitsSql(TextOps.EnglishStops)}::BIGINT sh,
              list_max(list_transform(list_distinct(toks),
                t2 -> len(list_filter(toks, u -> u = t2))))::BIGINT mc
            FROM t),
      lab AS (SELECT doc_id,
                ($GateKeepExpr) AS keep, toks
              FROM s),
      tok AS (SELECT doc_id, keep, unnest(toks) AS tok FROM lab),
      ct AS (SELECT tok,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT cp,
               sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT cn
             FROM tok GROUP BY 1),
      k AS (SELECT sum(cp)::BIGINT np, sum(cn)::BIGINT nn,
              count(*)::BIGINT v
            FROM ct),
      sc AS (SELECT tok, ((cp + 1) * (nn + v))::BIGINT num,
               ((cn + 1) * (np + v))::BIGINT den
             FROM ct CROSS JOIN k),
      l1 AS (SELECT tok, den,
               ${DetMath.lnDuckSelect("num", "ln1")}
             FROM sc),
      l2 AS (SELECT tok, ln1_ln,
               ${DetMath.lnDuckSelect("den", "ln2")}
             FROM l1),
      w AS (SELECT tok,
              CAST(round(ln1_ln * 1.0e9) AS BIGINT)
              - CAST(round(ln2_ln * 1.0e9) AS BIGINT) AS term
            FROM l2),
      ag AS (SELECT t.doc_id, max(t.keep) AS keep_label,
               count(*)::BIGINT AS n_tokens, sum(w.term)::BIGINT AS sl
             FROM tok t JOIN w USING (tok) GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    // the quality subquery IS the t_quality oracle text — one source of
    // truth, so a scoring change moves both queries in lockstep
    "t_curriculum" -> s"""
      WITH q AS (SELECT doc_id, quality_score
                 FROM (${TextOps.oracles("t_quality")})),
      r AS (SELECT doc_id, quality_score,
              row_number() OVER (ORDER BY quality_score DESC, doc_id)::BIGINT
                AS rank,
              count(*) OVER ()::BIGINT AS n_tot
            FROM q)
      SELECT doc_id, quality_score, rank,
             (4 * (rank - 1)) // n_tot + 1 AS stage
      FROM r ORDER BY doc_id""",
    "t_mix_weights" -> s"""
      WITH pl AS (SELECT lang, count(*)::BIGINT AS n_docs,
                    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
                  FROM documents GROUP BY 1),
      dn AS (SELECT ${Exact.dsumSql("sqrt(CAST(n_docs AS DOUBLE))")} AS denom,
                    CAST(sum(n_docs) AS BIGINT) AS total
             FROM pl)
      SELECT lang, n_docs, n_tokens,
             sqrt(CAST(n_docs AS DOUBLE)) / denom AS weight,
             (sqrt(CAST(n_docs AS DOUBLE)) / denom)
               / (CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) AS sample_factor
      FROM pl CROSS JOIN dn ORDER BY lang""",
    "t_decontaminate" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      s AS (SELECT doc_id, $ShinglesSql shs FROM t),
      ev AS (SELECT DISTINCT unnest(shs) sh FROM s WHERE doc_id % 50 = 0),
      tr AS (SELECT doc_id, len(shs)::BIGINT n_sh, unnest(shs) sh
             FROM s WHERE doc_id % 50 <> 0),
      hit AS (SELECT doc_id, n_sh, count(*)::BIGINT n_hit
              FROM tr JOIN ev USING (sh) GROUP BY 1, 2)
      SELECT doc_id, n_sh, n_hit, n_hit / n_sh AS contamination
      FROM hit ORDER BY doc_id""",
    "t_seq_pack" -> s"""
      WITH t AS (SELECT doc_id, source,
                   len(string_split(text, ' '))::BIGINT n_tokens FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens)::BIGINT AS start_tok
            FROM t)
      SELECT doc_id, source, n_tokens, start_tok,
             start_tok // $SeqBudget AS seq_id,
             start_tok % $SeqBudget AS tok_offset
      FROM c ORDER BY doc_id""",
    "t_seq_pack_global" -> s"""
      WITH t AS (SELECT doc_id, source,
                   len(string_split(text, ' '))::BIGINT n_tokens FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              (sum(n_tokens) OVER (ORDER BY source, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens)::BIGINT AS start_tok
            FROM t)
      SELECT doc_id, source, n_tokens, start_tok,
             start_tok // $SeqBudget AS seq_id,
             start_tok % $SeqBudget AS tok_offset
      FROM c ORDER BY doc_id""",
    "q_stratified_sample" -> s"""
      WITH t AS (SELECT doc_id, lang, $H60DocId % 100 AS bucket FROM documents)
      SELECT doc_id, lang, bucket FROM t
      WHERE bucket < ${rateCase("lang")}
      ORDER BY doc_id""",
    "t_rarity" -> """
      WITH e AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) tok
                 FROM documents),
      df AS (SELECT tok, count(*)::BIGINT df FROM e GROUP BY 1),
      j AS (SELECT doc_id, count(*)::BIGINT n_distinct, sum(df)::BIGINT df_sum,
              min(df)::BIGINT min_df
            FROM e JOIN df USING (tok) GROUP BY 1)
      SELECT doc_id, n_distinct, df_sum, df_sum / n_distinct AS mean_df, min_df
      FROM j ORDER BY doc_id""",
    "t_gate_by_source" -> s"""
      WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') toks
                 FROM documents),
      s AS (SELECT doc_id, source, len(toks)::BIGINT nt,
              len(list_distinct(toks))::BIGINT nd,
              (length(text) - len(toks) + 1)::BIGINT nc,
              ${TextOps.hitsSql(TextOps.EnglishStops)}::BIGINT sh,
              list_max(list_transform(list_distinct(toks),
                t2 -> len(list_filter(toks, u -> u = t2))))::BIGINT mc
            FROM t)
      SELECT source, count(*)::BIGINT AS n_docs,
        ${GateRules.map { case (name, p) =>
          s"sum(CASE WHEN NOT ($p) THEN 1 ELSE 0 END)::BIGINT" +
            s" AS fail_${name.stripPrefix("ok_")}"
        }.mkString(",\n        ")},
        sum(CASE WHEN ($GateKeepExpr) THEN 1 ELSE 0 END)::BIGINT AS n_pass,
        CAST(sum(CASE WHEN ($GateKeepExpr) THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pass_rate
      FROM s GROUP BY source ORDER BY source""",
    "t_quality_gate" -> s"""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') toks FROM documents),
      s AS (SELECT doc_id, len(toks)::BIGINT nt,
              len(list_distinct(toks))::BIGINT nd,
              (length(text) - len(toks) + 1)::BIGINT nc,
              ${TextOps.hitsSql(TextOps.EnglishStops)}::BIGINT sh,
              list_max(list_transform(list_distinct(toks),
                t2 -> len(list_filter(toks, u -> u = t2))))::BIGINT mc
            FROM t)
      SELECT doc_id, nt AS n_tokens, nc / nt AS mean_tok_len, nd / nt AS ttr,
        sh AS stop_hits, mc / nt AS top_tok_ratio,
        ${GateRules.map { case (name, p) => s"($p) AS $name" }
          .mkString(",\n        ")},
        ($GateKeepExpr) AS keep_doc
      FROM s ORDER BY doc_id""",
    "t_nb_quality" -> s"""
      WITH $NbCtes
      SELECT doc_id, keep_label, n_tokens,
        (sl / 1.0e9) / n_tokens AS nb_logodds, sl > 0 AS nb_keep
      FROM ag ORDER BY doc_id""",
    "t_nb_confusion" -> s"""
      WITH $NbCtes,
      cm AS (SELECT keep_label, sl > 0 AS nb_keep, count(*)::BIGINT AS n
             FROM ag GROUP BY 1, 2)
      SELECT keep_label, nb_keep, n,
        n / (SELECT sum(n)::BIGINT FROM cm) AS share
      FROM cm ORDER BY keep_label, nb_keep""",
    // the oracle replays the rank-sum directly (one global window — fine
    // at oracle scale; the Spark side decomposes it, see nbAuc)
    "t_auc" -> s"""
      WITH $NbCtes,
      tb AS (SELECT (sl + 64000000000 * n_tokens)
                      // (1000 * n_tokens) - 64000000 AS mkey,
               sum(CASE WHEN keep_label THEN 1 ELSE 0 END)::BIGINT p,
               sum(CASE WHEN keep_label THEN 0 ELSE 1 END)::BIGINT q
             FROM ag GROUP BY 1),
      pr AS (SELECT p, q,
               coalesce(sum(q) OVER (ORDER BY mkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT qb
             FROM tb)
      SELECT sum(p)::BIGINT AS n_pos, sum(q)::BIGINT AS n_neg,
        CAST(sum(p::HUGEINT * (2 * qb + q)) AS DOUBLE)
          / CAST(2 * sum(p)::HUGEINT * sum(q)::HUGEINT AS DOUBLE) AS auc
      FROM pr""",
    "t_quality_budget" -> s"""
      WITH $NbCtes,
      b AS (SELECT (2 * sl + 163840000000 * n_tokens)
                     // (10000000 * n_tokens) - 16384 AS bin,
              n_tokens
            FROM ag),
      g AS (SELECT bin, count(*)::BIGINT n_docs,
              sum(n_tokens)::BIGINT n_tokens
            FROM b GROUP BY 1),
      c AS (SELECT bin, n_docs, n_tokens,
              sum(n_docs) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS cum_docs,
              sum(n_tokens) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS cum_tokens
            FROM g)
      SELECT bin, CAST(bin AS DOUBLE) * 0.005 AS bin_lo, n_docs, n_tokens,
        cum_docs, cum_tokens,
        cum_tokens / (SELECT sum(n_tokens)::BIGINT FROM g)
          AS cum_token_share
      FROM c ORDER BY bin""",
    "t_calibration" -> s"""
      WITH $NbCtes,
      b AS (SELECT (2 * sl + 163840000000 * n_tokens)
                     // (10000000 * n_tokens) - 16384 AS bin,
              keep_label
            FROM ag),
      g AS (SELECT bin, count(*)::BIGINT n_docs,
              sum(CASE WHEN keep_label THEN 1 ELSE 0 END)::BIGINT n_keep
            FROM b GROUP BY 1)
      SELECT bin, CAST(bin AS DOUBLE) * 0.005 AS bin_lo, n_docs, n_keep,
        n_keep / n_docs AS keep_rate,
        n_docs / (SELECT sum(n_docs)::BIGINT FROM g) AS share
      FROM g ORDER BY bin""",
    "t_dsir" -> s"""
      WITH $DsirCtes
      SELECT doc_id, is_target, n_tokens, sl / 1.0e9 AS dsir_logw,
        (sl / 1.0e9) / n_tokens AS mean_logw
      FROM ag ORDER BY doc_id""",
    "t_gumbel_sample" -> s"""
      WITH $DsirCtes,
      gh AS (SELECT doc_id, is_target, n_tokens, sl,
               ${DedupOps.h60Sql("'gs' || doc_id::VARCHAR")} + 1 AS h1
             FROM ag),
      g1 AS (SELECT *, ${DetMath.lnDuckSelect("h1", "lh")} FROM gh),
      g2 AS (SELECT doc_id, is_target, n_tokens, sl, lh_ln,
               ${DetMath.lnDuckSelect(U60, "lc")}
             FROM g1),
      g3 AS (SELECT doc_id, is_target, n_tokens, sl,
               greatest(CAST(round((lc_ln - lh_ln) * 1.0e9) AS BIGINT),
                 1::BIGINT) AS xs
             FROM g2),
      g4 AS (SELECT *, ${DetMath.lnDuckSelect("xs", "lx")} FROM g3),
      g5 AS (SELECT doc_id, is_target, n_tokens, sl, lx_ln,
               ${DetMath.lnDuckSelect("1000000000", "l9")}
             FROM g4),
      g6 AS (SELECT doc_id, is_target, n_tokens, sl,
               CAST(round((l9_ln - lx_ln) * 1.0e9) AS BIGINT) AS gs
             FROM g5),
      g7 AS (SELECT *, (sl + gs)::BIGINT AS samp_key FROM g6),
      tk AS (SELECT * FROM g7 ORDER BY samp_key DESC, doc_id LIMIT $GumbelK)
      SELECT row_number() OVER (ORDER BY samp_key DESC, doc_id)::BIGINT
          AS rank,
        doc_id, is_target, n_tokens, sl / 1.0e9 AS dsir_logw,
        gs / 1.0e9 AS gumbel, samp_key
      FROM tk ORDER BY rank""",
    "t_length_buckets" -> """
      WITH t AS (SELECT len(string_split(text, ' '))::BIGINT nt
                 FROM documents),
      kk AS (SELECT nt, length(bin(nt)) - 1 AS k FROM t),
      c AS (SELECT nt, CASE WHEN nt = (1::BIGINT << k) THEN nt
                            ELSE (1::BIGINT << (k + 1)) END AS cap
            FROM kk),
      a AS (SELECT cap, count(*)::BIGINT n_docs, sum(nt)::BIGINT sum_tokens
            FROM c GROUP BY 1)
      SELECT cap AS bucket_cap, n_docs, sum_tokens,
        (cap * n_docs - sum_tokens)::BIGINT AS pad_tokens,
        CAST(cap * n_docs - sum_tokens AS DOUBLE)
          / CAST(cap * n_docs AS DOUBLE) AS waste_frac
      FROM a ORDER BY bucket_cap""",
    "t_data_split" -> s"""
      WITH a AS (SELECT md5(text) h, ${DedupOps.h60Sql("text")} % 10 AS bkt
                 FROM documents),
      b AS (SELECT h, CASE WHEN bkt < 8 THEN 'train'
                           WHEN bkt = 8 THEN 'val'
                           ELSE 'test' END sp
            FROM a),
      c AS (SELECT h, max(sp) sp, count(*)::BIGINT nd,
              count(DISTINCT sp)::BIGINT nsp
            FROM b GROUP BY 1)
      SELECT sp AS split, sum(nd)::BIGINT AS n_docs,
        count(*)::BIGINT AS n_hashes,
        sum(CASE WHEN nsp > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaked_hashes
      FROM c GROUP BY 1 ORDER BY split""",
    "t_budget_alloc" -> s"""
      WITH pl AS (SELECT lang, count(*)::BIGINT AS n_docs
                  FROM documents GROUP BY 1),
      dn AS (SELECT ${Exact.dsumSql("sqrt(CAST(n_docs AS DOUBLE))")} AS denom
             FROM pl),
      mw AS (SELECT lang, sqrt(CAST(n_docs AS DOUBLE)) / denom AS weight
             FROM pl CROSS JOIN dn),
      b AS (SELECT lang, weight,
              CAST(floor(weight * $TokenBudget) AS BIGINT) AS base,
              weight * $TokenBudget - floor(weight * $TokenBudget) AS rem
            FROM mw),
      r AS (SELECT lang, weight, base,
              row_number() OVER (ORDER BY rem DESC, lang) rk FROM b),
      df AS (SELECT $TokenBudget - sum(base) AS deficit FROM b)
      SELECT lang, weight,
        (base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END)::BIGINT AS alloc_tokens
      FROM r CROSS JOIN df ORDER BY lang""",
    "t_chunk_windows" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      n AS (SELECT doc_id, toks, len(toks)::BIGINT nt FROM t),
      e AS (SELECT doc_id, nt, toks, unnest(generate_series(0, (nt - 1) // $ChunkS)) chunk_id
            FROM n)
      SELECT doc_id, chunk_id,
        (chunk_id * $ChunkS)::BIGINT AS start_tok,
        least($ChunkW, nt - chunk_id * $ChunkS)::BIGINT AS n_chunk_toks,
        array_to_string(toks[chunk_id*$ChunkS+1 : chunk_id*$ChunkS+$ChunkW], ' ')
          AS chunk_text
      FROM e ORDER BY doc_id, chunk_id""",
    "t_pii_scrub" -> s"""
      SELECT doc_id,
        len(regexp_extract_all(text, '$EmailPat'))::BIGINT n_email,
        len(regexp_extract_all(text, '$NumberPat'))::BIGINT n_number,
        len(regexp_extract_all(text, '$DenyPat'))::BIGINT n_denied,
        regexp_replace(regexp_replace(regexp_replace(text,
          '$EmailPat', '[EMAIL]', 'g'),
          '$NumberPat', '[NUMBER]', 'g'),
          '$DenyPat', '[REDACTED]', 'g') AS clean_text
      FROM documents ORDER BY doc_id""")
}
