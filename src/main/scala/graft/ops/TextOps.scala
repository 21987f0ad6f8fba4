package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token stats, n-gram language ID, quality scoring, document
  * fingerprinting, n-gram frequency. (Extensions beyond the reference —
  * SURVEY.md §7.2 M2; the reference's only text-adjacent op is the SHA-256
  * hash, src/builder.rs:196-209.)
  *
  * Oracle-exactness strategy: every number is either exact integer
  * arithmetic, a fold in a fixed order, or a fixed-shape IEEE-double
  * expression over exact ints — so Spark and DuckDB produce bit-identical
  * values. Hash primitives are md5 (both engines) and a 31-base polynomial
  * rolling hash mod 1e9+7 (plain arithmetic in both).
  *
  * Scale: every query is scan → narrow per-row HOF expressions (+ one
  * shuffle where grouped). Whole-stage-codegen keeps the lambdas in
  * generated code; no UDFs, no collect.
  */
object TextOps {
  import Tables._

  private val Toks = "split(text, ' ')"
  /** split('') in Spark appends a trailing "" (Java split limit -1) which
    * DuckDB's string_split_regex does not — filter keeps both aligned. */
  private val Chars = "filter(split(text, ''), c -> c <> '')"

  /** Stopword lists for the n-gram/stopword language-ID heuristic. */
  private[ops] val stops = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "et", "de", "un", "est", "les"),
    "es" -> Seq("el", "la", "de", "y", "un", "es", "los"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu"))

  /** The English list looked up BY KEY — the quality/gate queries that want
    * specifically English must not silently re-point if [[stops]] is ever
    * reordered or prepended to (positional `stops.head` would). */
  private[ops] val EnglishStops: Seq[String] =
    stops.collectFirst { case ("en", ws) => ws }.get

  private[ops] def hitsExpr(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString(", ")
    s"size(filter($Toks, t -> array_contains(array($arr), t)))"
  }
  private[ops] def hitsSql(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> list_contains([$arr], t)))"
  }

  /** Per-document token statistics: counts, distinct counts, type-token
    * ratio, mean token length — all from exact ints, divisions in double. */
  def tokenStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("nt", expr(s"size($Toks)").cast("long"))
      .withColumn("nd", expr(s"size(array_distinct($Toks))").cast("long"))
      .select(
        col("doc_id"), col("nt").as("n_tokens"), col("nd").as("n_distinct"),
        expr("nd / nt").as("ttr"),
        expr("(length(text) - nt + 1) / nt").as("mean_tok_len"))
      .orderBy("doc_id")

  /** Language ID via stopword-hit scoring (n-gram heuristic): count hits
    * per language wordlist, argmax with a fixed tie-break (first entry in
    * [[stops]] order wins ties). The argmax is `array_min` over
    * `(-hits, ord, lang)` structs — O(K) generated code per row (the
    * [[SimilarityOps.kmeansAssign]] shape), vs a pairwise >=-CASE chain
    * whose O(K²) conditions would hit Janino's 64KB method ceiling at
    * realistic language counts; negating the exact BIGINT hit counts
    * keeps the comparison exact. The oracle keeps the equivalent greedy
    * CASE, generated from the SAME list ([[predLangSql]]) so the two
    * engines' tie-breaks move in lockstep. */
  def langId(s: SparkSession, d: String): DataFrame = {
    val hits = stops.map { case (l, ws) => expr(hitsExpr(ws)).cast("long").as(s"${l}_hits") }
    val structs = stops.zipWithIndex.map { case ((l, _), i) =>
      s"named_struct('nh', -${l}_hits, 'ord', $i, 'lang', '$l')"
    }.mkString(", ")
    documents(s, d)
      .select(col("doc_id") +: col("lang") +: hits: _*)
      .withColumn("pred_lang", expr(s"array_min(array($structs)).lang"))
      .orderBy("doc_id")
  }

  /** Language-ID confusion matrix: labeled lang × predicted lang counts
    * with row-conditional recall — the accuracy read-out of the
    * [[langId]] heuristic against the corpus labels (zh has no stopword
    * list, so its rows measure the heuristic's out-of-domain behavior).
    *
    * Plan/scale: the same ONE narrow scan as t_langid (per-language hit
    * counts + struct argmin) followed by a partial-agg count on the
    * K² = catalog-sized (lang, pred) grid; recall rides a window over
    * that grid, never a second scan of documents. */
  def langConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = stops.map { case (l, ws) =>
      expr(hitsExpr(ws)).cast("long").as(s"${l}_hits")
    }
    val structs = stops.zipWithIndex.map { case ((l, _), i) =>
      s"named_struct('nh', -${l}_hits, 'ord', $i, 'lang', '$l')"
    }.mkString(", ")
    documents(s, d)
      .select(col("lang") +: hits: _*)
      .withColumn("pred_lang", expr(s"array_min(array($structs)).lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("recall",
        col("n") / sum(col("n")).over(Window.partitionBy(col("lang"))))
      .orderBy("lang", "pred_lang")
  }

  /** Greedy argmax CASE over the per-language hit columns for the DuckDB
    * oracle, generated from [[stops]]: language j wins iff its hits are >=
    * every LATER language's (earlier languages already failed their
    * guard), so ties go to the first list entry — exactly the struct
    * argmin's `(−hits, ord)` ordering in [[langId]]. */
  private def predLangSql: String = {
    val langs = stops.map(_._1)
    langs.init.zipWithIndex.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"${l}_hits >= ${o}_hits").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
  }

  /** Quality score: weighted blend of type-token ratio, stopword ratio and
    * mean token length (fixed parenthesization → bit-identical doubles). */
  /** Code-vs-prose detection — the tokenizer-routing gate every mixed
    * crawl needs before BPE training: source code wants a code
    * tokenizer and its own mixture weight, and a 2% stream of
    * unrecognized JavaScript silently wrecks a prose tokenizer's merge
    * table. Scores each document by exact counts of the five
    * syntax-character families no natural-language style uses at code
    * density (braces, semicolons, equals, parens, underscores), a
    * weighted integer code_score (braces are the strongest signal at
    * 4×, semicolons 2×), the symbol density, and an exact-integer
    * verdict 100·score > n_chars — no floats touch the decision.
    * [[langId]] answers "which natural language"; this answers
    * "is it natural language at all".
    *
    * Plan/scale: one pruned scan through the native
    * [[graft.functions.CharCounts]] kernel — ONE byte pass per
    * document inside whole-stage codegen, where the SQL spelling
    * (K × `length − length(replace(…))`) copies the payload K times;
    * the oracle keeps the replace() spelling (exact integer counting,
    * property-proven equal). No explode, no shuffle but the output
    * order. Empty docs read NULL density via try_divide ≡ DuckDB
    * x/0. */
  def codeDetect(s: SparkSession, d: String): DataFrame = {
    documents(s, d)
      // targets in family order: { } ; = ( ) _
      .withColumn("cc", expr("char_counts(text, '{};=()_')"))
      .withColumn("n_braces", expr("cc[0] + cc[1]"))
      .withColumn("n_semi", expr("cc[2]"))
      .withColumn("n_eq", expr("cc[3]"))
      .withColumn("n_paren", expr("cc[4] + cc[5]"))
      .withColumn("n_underscore", expr("cc[6]"))
      .withColumn("code_score",
        expr("4L * n_braces + 2L * n_semi + n_eq + n_paren + n_underscore"))
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        col("n_braces"), col("n_semi"), col("n_eq"), col("n_paren"),
        col("n_underscore"), col("code_score"),
        expr("""try_divide(
          CAST(n_braces + n_semi + n_eq + n_paren + n_underscore AS DOUBLE),
          CAST(length(text) AS DOUBLE))""").as("symbol_density"),
        expr("100L * code_score > length(text)").as("is_code"))
      .orderBy("doc_id")
  }

  def quality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("nt", expr(s"size($Toks)").cast("long"))
      .withColumn("nd", expr(s"size(array_distinct($Toks))").cast("long"))
      .withColumn("sh", expr(hitsExpr(EnglishStops)).cast("long"))
      .select(
        col("doc_id"), col("nt").as("n_tokens"),
        expr("nd / nt").as("ttr"),
        expr("sh / nt").as("stop_ratio"),
        expr("((nd / nt) * 0.5 + (sh / nt) * 0.3) + (((length(text) - nt + 1) / nt) / 8.0) * 0.2")
          .as("quality_score"))
      .orderBy("doc_id")

  private val P = 1000000007L
  /** Power-table chunk width: two 1024-entry literal tables (b^j and
    * (b^1024)^j) factor any exponent k < 1024² as
    * b^k = big[k DIV 1024] * small[k % 1024] mod P — so the distributive
    * rolling-hash SUM covers documents up to ~1M positions with fixed-size
    * inlined literals and no driver-side max-length pass. */
  private val PowChunk = 1024
  /** Maximum supported positions = PowChunk² (~1.05M chars/tokens). */
  private val MaxFpLen: Long = PowChunk.toLong * PowChunk

  /** Expression for base^(`k`) mod P via the two-table factorization.
    * Both factors are < P (~1e9) so their product fits a BIGINT exactly. */
  private def powExpr(base: Long, k: String): String = {
    val small = Iterator.iterate(1L)(x => x * base % P)
      .take(PowChunk).mkString("array(", "L, ", "L)")
    val bigStep = Iterator.iterate(1L)(x => x * base % P).drop(PowChunk).next()
    val big = Iterator.iterate(1L)(x => x * bigStep % P)
      .take(PowChunk).mkString("array(", "L, ", "L)")
    s"(element_at($big, CAST(($k) DIV $PowChunk AS INT) + 1)" +
      s" * element_at($small, CAST(($k) % $PowChunk AS INT) + 1)) % $P"
  }

  /** Hash-bucket count for [[featureHash]] — 64 dims keeps the gate
    * output readable; production would use 2¹⁸⁺ (the trick's accuracy
    * scales with dims, its cost does not). */
  private val FhDims = 64L

  /** Hashing-trick document featurization (Weinberger et al. 2009) —
    * the featurize step that gives every document a fixed-width sparse
    * vector with NO vocabulary pass: dim = token-hash mod [[FhDims]],
    * value = Σ of a second hash bit mapped to ±1 (the sign hash that
    * makes collisions cancel in expectation instead of biasing
    * upward). Emitted SPARSE — (doc_id, dim, val) rows, zero
    * coordinates dropped — which is both the storage convention at
    * scale and what keeps the gate comparison exact-integer.
    *
    * Why it matters at 100 TB: every vocabulary-based featurizer (BoW,
    * TF-IDF) needs a corpus-wide vocabulary build + broadcast per run;
    * the hashing trick is a pure per-row map — no shuffle before the
    * per-doc agg, no state, trivially incremental. Both hashes derive
    * from the ONE shared 60-bit md5 device ([[DedupOps.h60]]): sign =
    * bit 0, dim = the next 6 bits — one md5 per token, and h ≥ 0 so
    * DIV/% cross-engine sign conventions never engage.
    *
    * Plan/scale: one scan → explode → codegen'd hash map → (doc_id,
    * dim) partial agg (map-side combine collapses token repeats). */
  def featureHash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(expr(DedupOps.Toks)).as("tok"))
      .select(col("doc_id"), expr(DedupOps.h60("tok")).as("h"))
      .select(col("doc_id"), expr(s"(h DIV 2) % $FhDims").as("dim"),
        expr("CASE WHEN h % 2 = 0 THEN 1L ELSE -1L END").as("sgn"))
      .groupBy("doc_id", "dim").agg(sum(col("sgn")).as("val"))
      .filter(col("val") =!= 0L)
      .orderBy("doc_id", "dim")

  /** Document fingerprints: a char-level 31-base rolling hash and a
    * token-sequence hash chaining md5-derived token ids — both mod 1e9+7
    * (classic Rabin-Karp). The defining fold `acc = (acc*b + h) % P` is
    * sequential, which as a per-row HOF `aggregate()` runs interpreted;
    * instead we use `fold == SUM(h_i * b^(n-1-i)) mod P` — a DISTRIBUTIVE
    * aggregation over exploded positions: every expression (md5 included)
    * is whole-stage codegen'd flat-row work, partial aggregation applies,
    * and the b^k tables are driver-inlined literals. Each term is
    * (h%P)*(b^k%P) <= ~1e18 < 2^63, and partial sums stay exact because
    * per-term mod keeps addends < P. */
  def fingerprint(s: SparkSession, d: String): DataFrame = {
    // posexplode_outer + coalesce: a zero-length document still yields a
    // row, with fingerprint 0 — the fold's value over an empty sequence.
    // Guard: positions beyond MaxFpLen would silently index past the power
    // tables; raise_error makes the failure deterministic and loud in both
    // ANSI settings (with ANSI off, element_at OOB returns null and the
    // SUM would quietly skip terms — a wrong fingerprint, not an error).
    def guarded(fp: String) =
      s"CASE WHEN max(n) > $MaxFpLen THEN " +
        s"raise_error(concat('fingerprint: document longer than $MaxFpLen positions (', " +
        s"CAST(max(n) AS STRING), ')')) ELSE $fp END"
    // One aggregation for both fingerprints, fed by ONE scan: project both
    // element arrays from a single pass over `documents`, explode a
    // 2-struct (kind, es) array so each doc emits both streams, then
    // posexplode the elements. The per-position hash dispatches on the
    // kind tag (CASE evaluates lazily — the md5 only runs for token
    // rows, and stays OUT of any HOF lambda). vs the union-of-two-scans
    // shape this halves the `documents` IO; vs join-of-two-aggregations
    // it is one shuffle and no join.
    val terms = documents(s, d)
      .select(col("doc_id"), expr(Chars).as("cs"), expr(Toks).as("toks"))
      .select(col("doc_id"), explode(expr(
        "array(struct(0 AS kind, cs AS es), struct(1 AS kind, toks AS es))"))
        .as("ke"))
      .select(col("doc_id"), col("ke.kind").as("kind"),
        size(col("ke.es")).as("n"),
        posexplode_outer(col("ke.es")).as(Seq("i", "e")))
      .select(col("doc_id"), col("kind"), col("n"), col("i"),
        expr(s"CASE WHEN kind = 0 THEN ascii(e) % $P " +
          s"ELSE ${DedupOps.h60("e")} % $P END").as("h"))
    terms
      .groupBy("doc_id")
      .agg(
        expr(guarded(s"coalesce(sum(CASE WHEN kind = 0 THEN " +
          s"h * (${powExpr(31, "n - 1 - i")}) % $P END) % $P, 0L)")).as("fp_chars"),
        expr(guarded(s"coalesce(sum(CASE WHEN kind = 1 THEN " +
          s"h * (${powExpr(131, "n - 1 - i")}) % $P END) % $P, 0L)")).as("fp_tokens"))
      .orderBy("doc_id")
  }

  /** Global top-20 token bigrams: generate per-doc bigrams, explode, count.
    * One shuffle on the bigram key; partial aggregation makes map output
    * proportional to distinct bigrams, not rows. */
  def ngramFreq(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      // `toks` must be a bound attribute: split() inlined into the lambda
      // body would be re-evaluated per element (O(tokens²) splits/doc).
      .select(expr(Toks).as("toks"))
      .select(expr(
        """explode(CASE WHEN size(toks) >= 2 THEN
              transform(sequence(1, size(toks) - 1),
                        i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
            ELSE array() END)""").as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** Bigram next-token prediction: for the 20 most frequent head tokens,
    * the argmax continuation and its conditional probability
    * P(next | head) — the 2-gram language-model read-out (the unigram
    * twin is t_unigram_lm). Ties break by count desc then token asc.
    *
    * Plan/scale: ONE explode pass builds (head, next) partial-agg counts
    * (shuffle volume = distinct bigrams, not corpus tokens); the per-head
    * argmax and head totals ride a single window over that
    * vocabulary²-sized relation, and top-20 is a TakeOrdered — no second
    * scan of documents at any scale. */
  def bigramNext(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHead = Window.partitionBy(col("head"))
    documents(s, d)
      .select(expr(Toks).as("toks"))
      .select(expr(
        """explode(CASE WHEN size(toks) >= 2 THEN
              transform(sequence(1, size(toks) - 1),
                        i -> struct(element_at(toks, i) AS head,
                                    element_at(toks, i + 1) AS nxt))
            ELSE array() END)""").as("bg"))
      .select(col("bg.head").as("head"), col("bg.nxt").as("nxt"))
      .groupBy("head", "nxt").agg(count(lit(1)).as("n"))
      .withColumn("head_n", sum(col("n")).over(byHead))
      .withColumn("rn",
        row_number().over(byHead.orderBy(col("n").desc, col("nxt"))))
      .filter(col("rn") === 1)
      .select(col("head"), col("head_n"), col("nxt").as("next_tok"),
        col("n").as("next_n"), (col("n") / col("head_n")).as("p_next"))
      .orderBy(col("head_n").desc, col("head"))
      .limit(20)
  }

  /** GPT-style pre-tokenizer pattern: a leading-space word, number, or
    * punctuation run, or residual whitespace. ASCII classes + no lookahead
    * so Java regex (Spark) and RE2 (DuckDB) agree; both engines match
    * leftmost-first. */
  private val BpePat = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Token counting, whitespace vs BPE-ish regex pre-tokenization: the two
    * standard corpus-size measures, plus their ratio. */
  def bpeTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_ws", expr(s"size($Toks)").cast("long"))
      .withColumn("n_bpe", expr(s"size(regexp_extract_all(text, '$BpePat', 0))").cast("long"))
      .select(col("doc_id"), col("n_ws"), col("n_bpe"),
        expr("n_bpe / n_ws").as("bpe_per_ws"))
      .orderBy("doc_id")

  /** Fixed merge count for the BPE trainer — small so the oracle can
    * unroll it as a CTE chain (the [[graft.ops.SimilarityOps.kmeans]]
    * replay pattern). */
  val BpeMerges = 3

  /** BPE tokenizer TRAINING — the real merge loop, not just counting:
    * start from the character vocabulary of every corpus word (weighted by
    * word frequency), then [[BpeMerges]] times pick the most frequent
    * adjacent symbol pair (ties → lexicographically smallest) and merge
    * its occurrences leftmost-first, non-overlapping, within every word.
    * Output is the learned merge table — the artifact a tokenizer ships.
    *
    * Plan/scale per iteration (the Lloyd shape, cf. [[SimilarityOps
    * .kmeans]]): the state is the VOCABULARY relation (word, freq, syms) —
    * types, not corpus tokens, so each pass is vocabulary-sized; pair
    * counting is one explode + partial-agg shuffle on the (l, r) key;
    * the winning pair is a 1-row driver collect inlined as literals into
    * the next narrow merge fold (`aggregate` over the symbol array).
    * The word-count relation is PERSISTED so the corpus scan and its
    * shuffle run once; each iteration's action then replays only the
    * accumulated merge folds over the cached vocabulary (i narrow
    * projections of a vocabulary-sized relation — cheap), unpersisted
    * once the merge table is on the driver.
    *
    * Leftmost-first semantics ride the fold: a merged symbol lands at the
    * accumulator tail and the next comparison sees the MERGED string, so
    * it cannot chain into a second merge in the same pass — byte-for-byte
    * the classical algorithm. Symbols are corpus characters; the driver
    * refuses (loudly) quote/backslash symbols rather than inline them. */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainMergeTable(s, d).toDF("merge_idx", "l_sym", "r_sym", "pair_count")
      .orderBy("merge_idx")
  }

  /** One leftmost-first non-overlapping merge pass of pair (`l`,`r`) over
    * a symbol-array column — the defining fold of both BPE training and
    * application, so both use this ONE definition (a semantics change
    * cannot desynchronize them). */
  private def mergeFoldExpr(syms: String, l: String, r: String): String = s"""
    aggregate($syms, CAST(array() AS ARRAY<STRING>),
      (acc, s2) -> CASE WHEN size(acc) > 0
                        AND element_at(acc, -1) = '$l' AND s2 = '$r'
        THEN concat(slice(acc, 1, size(acc) - 1), array('$l$r'))
        ELSE concat(acc, array(s2)) END)"""

  /** The [[bpeTrain]] merge loop, returning the learned
    * (idx, l, r, pair_count) table driver-side — shared by [[bpeTrain]]
    * (which reports it) and [[bpeApply]] (which applies it). */
  private def trainMergeTable(
      s: SparkSession, d: String): Seq[(Long, String, String, Long)] = {
    val words = documents(s, d)
      .select(explode(expr(Toks)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("freq"))
      .persist()
    var state = words
      .withColumn("syms", expr("filter(split(word, ''), c -> c <> '')"))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    try for (it <- 0 until BpeMerges) {
      val top = state.select(col("freq"),
          explode(expr("""CASE WHEN size(syms) >= 2 THEN
              transform(sequence(1, size(syms) - 1),
                i -> named_struct('l', element_at(syms, i),
                                  'r', element_at(syms, i + 1)))
            ELSE array() END""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE iteration $it: no adjacent pairs left to merge (vocabulary " +
          "is all single-symbol words) — fewer merges than BpeMerges")
      val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      require(!(l + r).exists(c => c == '\'' || c == '\\'),
        s"BPE merge symbol '$l$r' contains a quote/backslash — literal " +
          "inlining into the merge fold is unsupported for such corpora")
      merges += ((it.toLong, l, r, cnt))
      state = state.withColumn("syms", expr(mergeFoldExpr("syms", l, r)))
    } finally words.unpersist(blocking = true)
    // blocking unpersist: Bench showed the trainer's cached vocabulary
    // bleeding GC/JIT cost into the NEXT query's wall-clock (r6's
    // t_ngram_freq 1.73s-after vs 0.58s-isolated)
    merges.result()
  }

  /** BPE tokenizer APPLICATION — completes the train→encode loop: train
    * the [[BpeMerges]]-entry merge table ([[trainMergeTable]]), apply the
    * merges in training order to every word's symbol sequence (the same
    * leftmost-first fold the trainer used — [[mergeFoldExpr]]), then
    * report per document: word count, symbol count before any merge
    * (= characters) and after all merges, and the compression ratio.
    *
    * Plan/scale: the merge folds run over the VOCABULARY relation (one
    * fold per distinct WORD, not per occurrence — type-frequency is the
    * whole reason tokenizers encode via a vocabulary); documents then
    * explode to words and join the encoded vocabulary on the word key —
    * vocabulary-sized build side (broadcastable in production), one
    * uniform word-key shuffle, then the per-doc partial agg. */
  def bpeApply(s: SparkSession, d: String): DataFrame = {
    val merges = trainMergeTable(s, d)
    val vocab0 = documents(s, d)
      .select(explode(expr(Toks)).as("word")).distinct()
      .withColumn("syms", expr("filter(split(word, ''), c -> c <> '')"))
      .withColumn("n_before", expr("size(syms)").cast("long"))
    val encoded = merges.foldLeft(vocab0) { case (df, (_, l, r, _)) =>
      df.withColumn("syms", expr(mergeFoldExpr("syms", l, r)))
    }
    val wordLens = encoded.select(col("word"), col("n_before"),
      expr("size(syms)").cast("long").as("n_after"))
    documents(s, d)
      .select(col("doc_id"), explode(expr(Toks)).as("word"))
      .join(wordLens, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_before")).as("n_syms_before"),
        sum(col("n_after")).as("n_syms_after"))
      .select(col("doc_id"), col("n_words"), col("n_syms_before"),
        col("n_syms_after"),
        expr("IF(n_syms_before = 0, CAST(NULL AS DOUBLE), n_syms_after / n_syms_before)")
          .as("compression"))
      .orderBy("doc_id")
  }

  /** Repetition metrics (the Gopher-style repetition filters a training
    * corpus is cleaned with): per document, the most frequent bigram's
    * share of all bigrams and the duplicate-shingle fraction. Plan: one
    * explode → (doc, bigram) partial-agg count → per-doc max — shuffle
    * volume is distinct bigrams per doc, not token count. */
  def repetition(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), expr(Toks).as("toks"))
      .select(col("doc_id"),
        expr("size(toks)").cast("long").as("n_tokens"),
        expr("""CASE WHEN size(toks) >= 2 THEN
                  transform(sequence(1, size(toks) - 1),
                    i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
                ELSE array() END""").as("bigrams"))
    // total and distinct bigram counts ride the same two-level aggregation
    // that finds the max — one bigram-construction pass, no second scan of
    // the bigram arrays; the join back to `base` only supplies n_tokens
    // (and keeps sub-2-token documents, which produce no bigram rows)
    val top = base
      .select(col("doc_id"), explode(col("bigrams")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        max(col("c")).as("top_bigram_n"),
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bg"))
    base
      .select(col("doc_id"), col("n_tokens"))
      .join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        expr("IF(coalesce(n_bigrams, 0L) = 0, 0.0D, top_bigram_n / n_bigrams)")
          .as("top_bigram_frac"),
        expr("IF(coalesce(n_bigrams, 0L) = 0, 0.0D, (n_bigrams - n_distinct_bg) / n_bigrams)")
          .as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Count-min sketch width (counters per hash row) and depth. */
  val CmsWidth = 1024
  val CmsDepth = 2

  private def cmsPos(r: Int) =
    s"${DedupOps.h60(s"concat(tok, '|c$r')")} % $CmsWidth"

  /** Count-min-sketch heavy hitters: token frequencies estimated from a
    * [[CmsDepth]]×[[CmsWidth]] counter grid (est = min over rows of the
    * hashed cell), reported for the top-20 tokens next to their exact
    * counts so the sketch's one-sided overestimate is visible. The grid is
    * the 100 TB point: counter state is fixed-size (2×1024 cells) and
    * mergeable regardless of corpus or vocabulary size — the shuffle
    * reduces to it via partial aggregation, and point queries then
    * broadcast it. Hash rows are md5-derived (deterministic), so the
    * oracle replays the grid cell-for-cell.
    *
    * Plan: one explode → per-cell partial-agg count (grid build, ~2k
    * rows), one vocab aggregation (candidate set + exact twin), then the
    * grid collapses to a ONE-ROW `map_from_entries` broadcast onto the
    * vocab and probed with `element_at` (the [[DedupOps.bloomPrune]]
    * shape) — constant-depth, zero per-row joins, no corpus-scale join
    * anywhere. */
  /** The CMS counter grid over a `tok` relation: per (row, position)
    * cell counts — a commutative monoid, so the SAME definition serves
    * the batch sketch and [[graft.streaming.StreamOps.cmsCellStream]]'s
    * incremental maintenance (spec-proven merge == batch). */
  private[graft] def cmsCells(toks: DataFrame): DataFrame =
    toks
      .select(explode(array((0 until CmsDepth).map(r =>
        struct(lit(r).as("r"), expr(cmsPos(r)).as("p"))): _*)).as("rp"))
      .groupBy(col("rp.r").as("r"), col("rp.p").as("p"))
      .agg(count(lit(1)).as("c"))

  def cmsTopk(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(explode(expr(Toks)).as("tok"))
    val cells = cmsCells(toks)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    // flat cell key r*width+p — an int map key probes with element_at
    val gridRow = cells.agg(map_from_entries(collect_list(struct(
      (col("r") * CmsWidth + col("p")).cast("int").as("k"), col("c")))).as("grid"))
    val est = (0 until CmsDepth).map(r =>
      s"coalesce(element_at(grid, CAST($r * $CmsWidth + (${cmsPos(r)}) AS INT)), 0L)")
      .mkString("least(", ", ", ")")
    vocab.crossJoin(broadcast(gridRow))
      .select(col("tok"), col("exact_n"), expr(est).as("cms_est"))
      .orderBy(col("cms_est").desc, col("exact_n").desc, col("tok"))
      .limit(20)
  }

  /** End-to-end corpus-cleaning pipeline — the composition a real
    * training-data job runs as ONE plan (each stage stays declarative, so
    * Catalyst fuses the scans and pushes the cheap filters below the
    * dedup shuffle): quality gate → exact dedup (keep smallest doc_id per
    * content hash) → English-majority gate → per-doc stats out. */
  def pipeline(s: SparkSession, d: String): DataFrame = {
    val scored = documents(s, d)
      .withColumn("nt", expr(s"size($Toks)").cast("long"))
      .withColumn("nd", expr(s"size(array_distinct($Toks))").cast("long"))
      .withColumn("en_hits", expr(hitsExpr(EnglishStops)).cast("long"))
      .filter(col("nt") >= 20 && expr("nd / nt") > 0.3)
    val kept = scored
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    scored.join(kept, Seq("doc_id"))
      .filter(col("en_hits") >= 2)
      .select(col("doc_id"), col("nt").as("n_tokens"),
        expr("nd / nt").as("ttr"),
        expr("en_hits / nt").as("stop_ratio"))
      .orderBy("doc_id")
  }

  /** Per-document character entropy (nats) — the Shannon diversity of the
    * character distribution, a cheap quality/garbage signal (base64 blobs
    * and repeated-char spam sit far from prose on this axis):
    *
    *   H = ln(n) − (Σ_ch c_ch·ln(c_ch)) / n
    *
    * with [[DetMath]]'s deterministic ln so the doubles hash-match DuckDB.
    * The Σ is routed through round(term·1e9)::BIGINT before the SUM —
    * double addition is order-dependent and Spark's partial-agg order
    * differs from DuckDB's; the scaled-integer accumulator makes the sum
    * exact in both engines (the [[Exact.dsum]] pattern).
    *
    * Plan/scale: explode chars → count per (doc_id, ch) → per-doc agg —
    * two shuffles on uniform composite keys, all expressions codegen'd,
    * no UDFs. The (doc, char) grid is ≤ alphabet-size × docs rows, far
    * smaller than the token grids the shingle queries already move. */
  def entropy(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(col("doc_id"), explode(expr(Chars)).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val terms = DetMath.withLn(counts, "c", "lc")
      .withColumn("term", expr("cast(round((c * lc_ln) * 1.0e9) as bigint)"))
    val agg = terms.groupBy("doc_id")
      .agg(sum(col("c")).as("n"), sum(col("term")).as("sl"))
    DetMath.withLn(agg, "n", "lnn")
      .select(col("doc_id"), col("n").as("n_chars_counted"),
        expr("lnn_ln - (sl / 1.0e9) / n").as("entropy"))
      .orderBy("doc_id")
  }

  /** Per-document mean token log-probability under the corpus unigram LM
    * with add-one smoothing — the classic cheap perplexity proxy for
    * quality filtering (CCNet-style: prose scores high, garbage low):
    *
    *   logp(t) = ln(c_t + 1) − ln(N + V)     (c_t corpus count, N tokens,
    *   score(doc) = (Σ_t logp(t)) / n_doc     V vocabulary size)
    *
    * ln via [[DetMath]]; the per-doc Σ through the scaled-BIGINT
    * accumulator (order-independent, engine-exact).
    *
    * Plan/scale: the corpus count c_t is a WINDOW count over the token
    * stream — not a tokens⋈vocab join, which would re-expand the explode
    * subtree (Catalyst does not reuse differently-pruned exchanges); the
    * constant ln(N+V) never enters the per-token term (it subtracts
    * once per doc AFTER the sum), so the scoring path is explode →
    * token-key window → per-doc agg: two uniform-key shuffles, one
    * scan. The (N,V) constants are the only second pass, and their
    * explode feeds straight into a partial-aggregated count — no wide
    * rows move. "the" is the standard hot token: AQE splits the window
    * partition's skew, or pre-cap the window with a salted two-level
    * count at 100 TB; the shape is unchanged. */
  /** Shared per-doc unigram-LM scoring relation — (doc_id, n_tokens,
    * avg_logprob), consumed by [[unigramLm]] and [[perplexity]]. */
  private def unigramScored(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val toks = documents(s, d).select(col("doc_id"), explode(expr(Toks)).as("tok"))
    val denom = DetMath.withLn(
      toks.agg(count(lit(1)).as("n_total"), count_distinct(col("tok")).as("v_size"))
        .withColumn("nv", col("n_total") + col("v_size")),
      "nv", "ld")
      .select(col("ld_ln").as("ln_denom"))
    val scored = DetMath.withLn(
      toks
        .withColumn("c1", count(lit(1)).over(w.partitionBy("tok")) + lit(1L)),
      "c1", "lnum")
      .withColumn("term", expr("cast(round(lnum_ln * 1.0e9) as bigint)"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("term")).as("sl"))
      .crossJoin(broadcast(denom))
      .select(col("doc_id"), col("n_tokens"),
        expr("(sl / 1.0e9) / n_tokens - ln_denom").as("avg_logprob"))
  }

  def unigramLm(s: SparkSession, d: String): DataFrame =
    unigramScored(s, d).orderBy("doc_id")

  /** Per-document perplexity under the corpus unigram LM —
    * ppl = exp(−avg_logprob), the number actually quoted when a corpus is
    * filtered "by perplexity" (CCNet keeps the low-ppl tail). Uses
    * [[DetMath]]'s deterministic exp, so the doubles hash-match DuckDB's
    * replay of the same steps. Plan identical to [[unigramLm]] plus four
    * narrow codegen'd columns. */
  /** Tokenizer FERTILITY by language — tokens emitted per word under the
    * trained BPE merge table ([[bpeApply]]'s encoding), rolled up to the
    * language grain: the tokenizer-fairness number multilingual pipelines
    * audit (a tokenizer trained on English-heavy data "taxes" other
    * languages with higher fertility, which silently skews an equal-token
    * budget away from them — the readout [[CorpusOps]]' budget allocator
    * would consume). All tallies are exact BIGINT sums; the single
    * division happens once per language row.
    *
    * Plan/scale: [[bpeApply]]'s vocabulary-sized encode + doc rollup,
    * then one doc-key join against the pruned (doc_id, lang) projection
    * and a catalog-sized language agg. */
  def fertilityByLang(s: SparkSession, d: String): DataFrame =
    bpeApply(s, d)
      .join(documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
        sum(col("n_syms_after")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        expr("n_tokens / n_words").as("fertility"))
      .orderBy("lang")

  /** Per-document mean log-probability under a Jelinek-Mercer
    * INTERPOLATED BIGRAM LM (λ = 1/2) — the next model up from
    * [[unigramLm]]'s perplexity proxy, and the score that actually
    * separates fluent prose from shuffled-word salad (unigram scores are
    * order-blind; repetitive boilerplate also lights up here through its
    * inflated conditional probabilities):
    *
    *   p(w2|w1) = ½·c(w1w2)/c(w1·) + ½·(c(·w2)+1)/(N_b+V_2)
    *
    * The cross-engine-exactness device: the interpolation is evaluated as
    * ONE rational — num = c_b·(N_b+V_2) + (c_2+1)·c_1, den = 2·c_1·(N_b
    * +V_2), both exact BIGINTs from window counts — so the only
    * floating-point is ln(num) − ln(den) via [[DetMath]] and the per-doc
    * mean rides the scaled-BIGINT accumulator. Every bigram scored occurs
    * in the corpus, so c_b ≥ 1 and num/den are always ≥ 1/valid. BIGINT
    * headroom: num ≤ N_b·(N_b+V_2) — exact to N_b ≈ 3·10⁹ bigrams;
    * production beyond that drops to double logs (same plan).
    *
    * Plan/scale: ONE scan and ONE Generate; the three count families ride
    * three windows over the SAME bigram stream (uniform token keys —
    * (w1,w2), w1, w2; the hot-token caveat and remedies are
    * [[unigramLm]]'s), the (N_b, V_2) constants broadcast from a 1-row
    * agg, and the per-doc mean is one partial-agg shuffle. */
  /** The (doc_id, w1, w2) adjacent-bigram stream — ONE definition shared
    * by [[bigramLm]] and [[knLm]], so the two LMs score exactly the same
    * events and differ only in smoothing. */
  private def bigramStream(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), expr(Toks).as("toks"))
      .select(col("doc_id"), explode(expr(
        """transform(filter(sequence(0, size(toks) - 1), p -> p + 1 < size(toks)),
             p -> named_struct('w1', element_at(toks, p + 1),
                               'w2', element_at(toks, p + 2)))""")).as("u"))
      .select(col("doc_id"), col("u.w1").as("w1"), col("u.w2").as("w2"))

  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val bg = bigramStream(s, d)
    val consts = bg.agg(count(lit(1)).as("nb"),
        count_distinct(col("w2")).as("v2"))
      .select((col("nb") + col("v2")).as("nv"))
    val counted = bg
      .withColumn("cb", count(lit(1)).over(w.partitionBy("w1", "w2")))
      .withColumn("c1", count(lit(1)).over(w.partitionBy("w1")))
      .withColumn("c2", count(lit(1)).over(w.partitionBy("w2")))
      .crossJoin(broadcast(consts))
      .withColumn("num", expr("cb * nv + (c2 + 1) * c1"))
      .withColumn("den", expr("2 * c1 * nv"))
    DetMath.withLn(DetMath.withLn(counted, "num", "ln1"), "den", "ln2")
      .withColumn("term", expr(
        """cast(round(ln1_ln * 1.0e9) as bigint)
           - cast(round(ln2_ln * 1.0e9) as bigint)"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("sl"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(sl / 1.0e9) / n_bigrams").as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Per-document mean log-probability under an interpolated KNESER-NEY
    * bigram LM (absolute discount D = ½) — the smoothing that actually
    * ships in production n-gram LMs: the lower-order distribution is the
    * CONTINUATION probability (in how many distinct left contexts does
    * w2 appear) rather than raw frequency, which stops high-count but
    * context-bound tokens (the "Francisco" problem) from inflating
    * backoff scores the way [[bigramLm]]'s JM unigram interpolation does.
    *
    *   p_KN(w2|w1) = (c(w1w2) − ½)/c(w1·) + (½·N1+(w1·)/c(w1·))·p_cont(w2)
    *   p_cont(w2)  = N1+(·w2) / N_t      (N_t = distinct bigram types)
    *
    * Σ_w2 p_KN(w2|w1) = 1 exactly (the discount mass ½·N1+(w1·) is what
    * the continuation term redistributes), and every scored bigram
    * occurs in the corpus (c ≥ 1) so the discounted term never clips
    * and p > 0. As ONE exact rational:
    *   num = (2·c_b − 1)·N_t + N1+(w1·)·N1+(·w2),   den = 2·c_1·N_t —
    * all BIGINT window/type counts; the only floating point is
    * ln(num) − ln(den) via [[DetMath]], and the per-doc mean rides the
    * scaled-BIGINT accumulator. Headroom: num ≤ 2·N_b·N_t ≤ 2·N_b² —
    * exact to N_b ≈ 2·10⁹ bigrams; production beyond that drops to
    * double logs (same plan).
    *
    * Plan/scale: the shared bigram stream + its distinct-TYPE relation;
    * continuation counts are two windows over the type relation (uniform
    * w1 / w2 keys, type-sized — smaller than the stream); the stream
    * joins the types on the same uniform (w1, w2) hash the c_b window
    * uses, so the window stacks over the join exchange; N_t broadcasts
    * from a 1-row agg; the per-doc mean is one partial-agg shuffle. The
    * hot-token caveat and remedies are [[unigramLm]]'s. */
  def knLm(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val bg = bigramStream(s, d)
    // the distinct-type relation is materialized ONCE (the nbModel
    // checkpoint device): the N_t constant, both continuation windows,
    // and the scoring join all read it — not three distinct shuffles
    val ty = bg.select("w1", "w2").distinct().localCheckpoint()
    val types = ty
      .withColumn("n1w1", count(lit(1)).over(w.partitionBy("w1")))
      .withColumn("nc2", count(lit(1)).over(w.partitionBy("w2")))
    val nt = ty.agg(count(lit(1)).as("nt"))
    val counted = bg
      .join(types, Seq("w1", "w2"))
      .withColumn("cb", count(lit(1)).over(w.partitionBy("w1", "w2")))
      .withColumn("c1", count(lit(1)).over(w.partitionBy("w1")))
      .crossJoin(broadcast(nt))
      .withColumn("num", expr("(2 * cb - 1) * nt + n1w1 * nc2"))
      .withColumn("den", expr("2 * c1 * nt"))
    DetMath.withLn(DetMath.withLn(counted, "num", "ln1"), "den", "ln2")
      .withColumn("term", expr(
        """cast(round(ln1_ln * 1.0e9) as bigint)
           - cast(round(ln2_ln * 1.0e9) as bigint)"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("sl"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(sl / 1.0e9) / n_bigrams").as("avg_logprob"))
      .orderBy("doc_id")
  }

  def perplexity(s: SparkSession, d: String): DataFrame =
    DetMath.withExp(
      unigramScored(s, d).withColumn("nl", expr("-avg_logprob")), "nl", "px")
      .select(col("doc_id"), col("n_tokens"), col("avg_logprob"),
        col("px_exp").as("ppl"))
      .orderBy("doc_id")

  /** Top-3 TF-IDF terms per document — the keyword/topic extraction pass a
    * curation pipeline runs for faceting and mixture reporting:
    *
    *   score(t, doc) = tf_{t,doc} · (ln(D) − ln(df_t))
    *
    * ln via [[DetMath]] (bit-identical doubles → identical ordering in
    * both engines); ties broken by term so the top-3 is fully
    * deterministic.
    *
    * Plan/scale: ONE pass — explode → (doc, term) count → document
    * frequency as `count over (partition by term)` on that same relation
    * (a tf⋈df self-join would re-expand the explode subtree — Catalyst
    * does not reuse differently-pruned exchanges) → per-doc row_number
    * window (doc key — uniform). D rides in as a broadcast 1-row
    * aggregate; its count-only scan reads zero parquet columns. The
    * window's top-k gets the WindowGroupLimit partial/final pushdown
    * (rank ≤ 3 filtered below the shuffle) on Spark 4. */
  /** Vocabulary-growth (Heaps' law) curve: distinct-token count after
    * the first 64 / 128 / … / 8192 documents (by doc_id) — the
    * corpus-health curve that says whether new data still brings new
    * vocabulary (a flattening curve means diminishing returns; a curve
    * that never flattens means noise/PII-like token churn). Each token
    * contributes through its FIRST document only (min doc_id), so the
    * whole curve reads off one token-key aggregate melted against the
    * checkpoint list — never one pass per checkpoint.
    *
    * Plan/scale: one scan → explode → (tok) partial agg (min doc_id) →
    * an 8-way checkpoint melt → 8-key agg. The doc-count side rides the
    * same melt over the pruned doc_id projection. */
  /** Corpus-BLEU-2 between the two sides of every near-dup candidate
    * pair — the overlap-quality score on the dedup worklist: Jaccard
    * over shingle SETS (what found the pair) ignores repetition and
    * length; BLEU's clipped n-gram precisions + brevity penalty are
    * the standard answer to "how much of A is literally B, weighted by
    * how often". The triage between verbatim mirrors (log-BLEU ≈ 0),
    * templated rewrites (mid), and set-overlap false friends (low).
    * Emitted in LOG space — log_bleu2 = ½(ln p₁ + ln p₂) + min(0,
    * 1 − r/c) — so the transcendentals are [[DetMath]]'s
    * bit-deterministic ln over the exact BIGINT clip/total counts and
    * no cross-engine exp() exists; a pair with any zero precision
    * reads NULL (BLEU 0, unrepresentable in log space) via the CASE.
    *
    * Plan/scale: the pair worklist is [[graft.ops.DedupOps.ngramJaccard]]'s
    * DF-CAPPED candidate relation — pair enumeration cost was already
    * paid and bounded there; this adds one (doc, n, gram) count agg
    * and one pair×gram join whose size is Σ_pairs |grams(hyp)| — linear
    * in the worklist, never corpus². The hypothesis length r falls out
    * of the n=1 totals for free; only the reference length needs the
    * one extra uniform join. */
  def bleuPairs(s: SparkSession, d: String): DataFrame =
    bleuPairsFrom(
      DedupOps.ngramJaccard(s, d).select(col("a_id"), col("b_id")),
      documents(s, d))

  /** The shared clipped-n-gram base behind [[bleuPairsFrom]] and
    * [[rougePairsFrom]]: per candidate pair, the clipped unigram/bigram
    * match counts against the a-side's totals, plus the b-side
    * (reference) token length — every BLEU/ROUGE variant is arithmetic
    * over exactly these five BIGINTs (ROUGE's recall denominators are
    * the reference's total gram counts, which are `rlen` and `rlen − 1`
    * by construction — no extra join). The gram relation is built over
    * the pair ENDPOINTS only (one semi-join before the explode), not the
    * corpus: the 10× scale run measured the whole-corpus spelling at
    * exponent ~1.1 in CORPUS size when the cost should be linear in the
    * WORKLIST — at 100 TB with a capped worklist that difference is the
    * whole job. One endpoint semi-join + one (doc, n, gram) count agg +
    * one pair×gram join, all linear in the capped worklist. */
  private[ops] def pairGramBaseFrom(prsIn: DataFrame,
                                    docsIn: DataFrame): DataFrame = {
    // The worklist is referenced four times below (pair join, two
    // endpoint semi-joins, the lens semi-join); an unmaterialized pair
    // subtree would re-expand its whole shingle pipeline per reference
    // (observed: scan 4 → 9 in the plan pin) — checkpoint it ONCE, the
    // shared-subtree discipline every pair consumer follows.
    val prs = prsIn.select(col("a_id"), col("b_id")).localCheckpoint()
    val endpoints = prs.select(col("a_id").as("doc_id"))
      .union(prs.select(col("b_id").as("doc_id"))).distinct()
    val grams = docsIn
      .join(endpoints, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), expr(s"$Toks").as("tk"))
      .select(col("doc_id"), explode(expr(
        """concat(
             transform(tk, g -> named_struct('n', 1, 'gram', g)),
             CASE WHEN size(tk) >= 2
               THEN transform(sequence(1, size(tk) - 1),
                 i -> named_struct('n', 2, 'gram', concat(tk[i-1], ' ', tk[i])))
               ELSE CAST(array() AS ARRAY<STRUCT<n: INT, gram: STRING>>) END)""")).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
    val agg = prs
      .join(grams.as("ca"), col("a_id") === col("ca.doc_id"))
      .join(grams.as("cb"),
        col("b_id") === col("cb.doc_id") && col("ca.n") === col("cb.n") &&
          col("ca.gram") === col("cb.gram"), "left")
      .select(col("a_id"), col("b_id"), col("ca.n").as("n"),
        col("ca.c").as("ch"), coalesce(col("cb.c"), lit(0L)).as("cr"))
      .groupBy("a_id", "b_id")
      .agg(
        sum(when(col("n") === 1, least(col("ch"), col("cr"))).otherwise(0L))
          .as("clip1"),
        sum(when(col("n") === 1, col("ch")).otherwise(0L)).as("tot1"),
        sum(when(col("n") === 2, least(col("ch"), col("cr"))).otherwise(0L))
          .as("clip2"),
        sum(when(col("n") === 2, col("ch")).otherwise(0L)).as("tot2"))
    val lens = docsIn
      .join(prs.select(col("b_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), expr("size(split(text, ' '))").cast("long")
        .as("rlen"))
    agg.join(lens, col("b_id") === col("doc_id")).drop("doc_id")
  }

  /** [[bleuPairs]] over caller-supplied (a_id, b_id) pair and
    * (doc_id, text) document relations — the testable core (the
    * log-BLEU ≡ 0 identical-pair contract, the brevity penalty sign,
    * and the zero-overlap NULL all want constructed pairs). */
  private[ops] def bleuPairsFrom(prs: DataFrame,
                                 docsIn: DataFrame): DataFrame = {
    val base = pairGramBaseFrom(prs, docsIn)
    val lns = Seq(("greatest(1L, clip1)", "l1"), ("tot1", "t1"),
      ("greatest(1L, clip2)", "l2"), ("greatest(1L, tot2)", "t2"))
      .foldLeft(base) { case (df, (e, p)) => DetMath.withLn(df, e, p) }
    lns
      .select(col("a_id"), col("b_id"), col("clip1"), col("tot1"),
        col("clip2"), col("tot2"), col("rlen").as("ref_len"),
        expr("""CASE WHEN clip1 >= 1 AND clip2 >= 1
          THEN 0.5e0 * (l1_ln - t1_ln) + 0.5e0 * (l2_ln - t2_ln)
            + least(0.0e0, 1.0e0 - CAST(rlen AS DOUBLE) / CAST(tot1 AS DOUBLE))
          ELSE CAST(NULL AS DOUBLE) END""").as("log_bleu2"))
      .orderBy("a_id", "b_id")
  }

  /** Corpus-ROUGE-1/2 of every near-dup candidate pair — the RECALL
    * companion to [[bleuPairs]]'s clipped precision: BLEU asks "how much
    * of A is drawn from B", ROUGE asks "how much of B does A cover",
    * and the pair of numbers separates the two ways a near-dup worklist
    * entry can be asymmetric (A is a snippet of B → high BLEU, low
    * ROUGE; A is B plus noise → the reverse). ROUGE-N recall =
    * clipN / (reference's total N-grams), which is `rlen` (unigrams)
    * and `rlen − 1` (bigrams) BY CONSTRUCTION — so the whole score
    * family is single divisions of the exact BIGINTs the shared
    * [[pairGramBaseFrom]] already carries, zero transcendentals, and
    * the F1 folds to 2·clip/(hyp_total + ref_total) exactly. A 1-token
    * reference has no bigrams: ROUGE-2 reads NULL through an explicit
    * CASE (never a divide-by-zero dependency) in both engines.
    *
    * Plan/scale: the shared base's shape — one (doc, n, gram) agg + one
    * pair×gram join linear in the DF-capped worklist; this adds only
    * per-row arithmetic. */
  def rougePairs(s: SparkSession, d: String): DataFrame =
    rougePairsFrom(
      DedupOps.ngramJaccard(s, d).select(col("a_id"), col("b_id")),
      documents(s, d))

  /** [[rougePairs]] over caller-supplied relations — the testable core
    * (identical pair ≡ 1, disjoint pair ≡ 0, the 1-token-reference NULL,
    * and the snippet asymmetry all want constructed pairs). */
  private[ops] def rougePairsFrom(prs: DataFrame,
                                  docsIn: DataFrame): DataFrame =
    pairGramBaseFrom(prs, docsIn)
      .select(col("a_id"), col("b_id"), col("clip1"), col("clip2"),
        col("tot1").as("hyp_len"), col("rlen").as("ref_len"),
        expr("CAST(clip1 AS DOUBLE) / CAST(rlen AS DOUBLE)")
          .as("rouge1_recall"),
        expr("""CASE WHEN rlen > 1
            THEN CAST(clip2 AS DOUBLE) / CAST(rlen - 1 AS DOUBLE)
            ELSE CAST(NULL AS DOUBLE) END""").as("rouge2_recall"),
        expr("CAST(2 * clip1 AS DOUBLE) / CAST(tot1 + rlen AS DOUBLE)")
          .as("rouge1_f1"),
        expr("""CASE WHEN tot2 + rlen - 1 > 0
            THEN CAST(2 * clip2 AS DOUBLE) / CAST(tot2 + rlen - 1 AS DOUBLE)
            ELSE CAST(NULL AS DOUBLE) END""").as("rouge2_f1"))
      .orderBy("a_id", "b_id")

  /** Train/test n-gram COVERAGE per language — the LM-eval readout
    * between [[novelty]]'s per-doc grain and [[vocabDrift]]'s
    * distribution distance: split the corpus at the id midpoint (ids
    * are ingestion order — the [[vocabDrift]] rule), and report what
    * fraction of the LATE half's distinct 3-grams the EARLY half
    * already contains, per language. This is the number an LM team
    * reads as "how much of tomorrow's data has the model seen the
    * n-grams of": high coverage → the corpus is saturating (more data
    * buys fluency, not knowledge); a language with LOW coverage is
    * still growing vocabulary and earns budget. The shingle definition
    * is the dedup family's `shingles3` — one definition corpus-wide.
    *
    * Plan/scale: one scan → shingle explode → ONE (lang, shingle)-key
    * agg with conditional-max half flags → catalog-sized rollup. One
    * shuffle on uniform shingle-hash keys; no joins, no windows. */
  def ngramCoverage(s: SparkSession, d: String): DataFrame =
    ngramCoverageFrom(
      documents(s, d).select(col("doc_id"), col("lang"), col("text")))

  /** [[ngramCoverage]] over a caller-supplied (doc_id, lang, text)
    * relation — the testable core (full-copy halves read 1.0, disjoint
    * halves read 0.0, a half-covered fixture reads the exact
    * fraction). */
  private[ops] def ngramCoverageFrom(docsIn: DataFrame): DataFrame = {
    val bounds = docsIn.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    docsIn.crossJoin(broadcast(bounds))
      .select(col("lang"),
        (col("doc_id") * 2 <= col("lo") + col("hi")).as("is_train"),
        explode(expr(DedupOps.ShinglesOfText)).as("sh"))
      .groupBy("lang", "sh")
      .agg(max(when(col("is_train"), 1L).otherwise(0L)).as("in_train"),
        max(when(!col("is_train"), 1L).otherwise(0L)).as("in_test"))
      .filter(col("in_test") === 1L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_test_grams"),
        sum(col("in_train")).as("n_covered"))
      .select(col("lang"), col("n_test_grams"), col("n_covered"),
        expr("CAST(n_covered AS DOUBLE) / CAST(n_test_grams AS DOUBLE)")
          .as("coverage"))
      .orderBy("lang")
  }

  /** Vocabulary DRIFT between the early and late corpus half — the
    * ingestion-shift monitor: the same bounded Jensen–Shannon arithmetic
    * as [[graft.ops.ValidationOps.jsSources]], keyed by temporal half
    * (doc_id against the id midpoint — ids are ingestion order) instead
    * of provenance. A crawl whose late half drifts past ~0.1 nats from
    * its early half changed character mid-run (new seed list, new spam
    * campaign, encoding regression) — the readout that catches it
    * BEFORE the mixture weights computed on the early half go stale.
    * Rides [[graft.ops.ValidationOps.jsSourcesFrom]] verbatim (and the
    * oracle rides the parameterized jsDuckFrom chain), so the drift
    * number and the source-divergence number can never disagree about
    * what JS means. Two output rows (one per half, symmetric up to the
    * 1e-12 ledger's term attribution).
    *
    * Plan/scale: one extra column-pruned pass for the id bounds
    * (broadcast 1-row), then the shared JS pipeline's shape. */
  def vocabDrift(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val bounds = docs.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    val st = docs.crossJoin(broadcast(bounds))
      .select(
        when(col("doc_id") * 2 <= col("lo") + col("hi"), "early")
          .otherwise("late").as("source"),
        explode(expr(Toks)).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("a"))
    ValidationOps.jsSourcesFrom(st)
      .select(col("source").as("half"), col("n_tokens"),
        col("js_vs_rest").as("js_vs_other"))
      .orderBy("half")
  }

  /** Hapax-legomena profile per language — vocabulary size, singleton
    * (f=1) and doubleton (f=2) type counts, hapax share of the
    * vocabulary and of the token mass. The curator's
    * vocabulary-health dial: a healthy natural-language slice runs
    * ~40-60% hapax types (Zipf tail); a hapax rate near 0 screams
    * template/boilerplate duplication, one near 1 screams OCR noise or
    * tokenizer breakage — both are slice-level failures [[heaps]]'s
    * growth curve and [[zipf]]'s rank fit only show indirectly. Also
    * the Good–Turing unseen-mass numerator (n_hapax / n_tokens
    * estimates the probability the NEXT token is novel).
    *
    * Exactness: pure BIGINT counting; the two rates are each ONE
    * int64→double division on a group that exists ⇒ denominators ≥ 1,
    * so no zero-division branch is needed in either engine.
    *
    * Plan/scale: one scan → explode → (lang, tok) agg (map-side
    * combined) → catalog-sized lang agg. The same two-level shape as
    * the corpus TF passes; no windows, no joins — holds at 100 TB. */
  def hapax(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), explode(expr(Toks)).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
      .groupBy("lang").agg(
        sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("f") === 2L, 1L).otherwise(0L)).as("n_dis"))
      .select(col("lang"), col("n_tokens"), col("n_vocab"),
        col("n_hapax"), col("n_dis"),
        expr("n_hapax / n_vocab").as("hapax_type_rate"),
        expr("n_hapax / n_tokens").as("unseen_mass_est"))
      .orderBy("lang")

  def heaps(s: SparkSession, d: String): DataFrame = {
    val cps = Seq(64, 128, 256, 512, 1024, 2048, 4096, 8192)
    val cpArr = cps.mkString("array(", "L, ", "L)")
    val firstDoc = documents(s, d)
      .select(col("doc_id"), explode(expr(Toks)).as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
      .select(explode(expr(s"filter($cpArr, c -> first_doc < c)")).as("cp"))
      .groupBy("cp").agg(count(lit(1)).as("n_vocab"))
    val docs = documents(s, d)
      .select(col("doc_id"))
      .select(explode(expr(s"filter($cpArr, c -> doc_id < c)")).as("cp"))
      .groupBy("cp").agg(count(lit(1)).as("n_docs"))
    docs.join(firstDoc, Seq("cp"), "left")
      .select(col("cp").as("checkpoint"), col("n_docs"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"))
      .orderBy("checkpoint")
  }

  /** Fixed query-term set for [[bm25]] — inlined as literals into both
    * engines (drawn from the synthetic vocabulary so tf/df are
    * exercised, not degenerate). */
  private val Bm25Terms = Seq("spark", "join", "scan")

  /** BM25 relevance top-10 for a fixed 3-term query — the IR ranking
    * function ([[tfidf]]'s production successor: tf saturation via k1,
    * length normalization via b):
    *
    *   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t) = ln((N−df+0.5)/(df+0.5)) = ln(2N−2df+1) − ln(2df+1)
    *
    * — the half-offsets clear by doubling, so both logs take ODD INTEGER
    * inputs and ride [[DetMath]] (bit-identical across engines); k1=1.2,
    * b=0.75 are shared exponent-form double literals; the 3-term sum is
    * a FIXED left-associated text, so every double is deterministic and
    * the ranking cannot straddle engines.
    *
    * Plan/scale: per-term tf is a narrow `size(filter(toks))` projection
    * — no explode, no token shuffle anywhere; corpus stats (N, Σdl, df
    * per term) partial-agg to ONE row, get their 6 ln chains there, and
    * broadcast back; top-10 is TakeOrdered (per-partition heap + driver
    * merge — no global sort). The whole query is one corpus scan plus a
    * 1-row broadcast. */
  def bm25(s: SparkSession, d: String): DataFrame = {
    val tfCols = Bm25Terms.map(t =>
      expr(s"size(filter($Toks, x -> x = '$t'))").cast("long").as(s"tf_$t"))
    val base = documents(s, d).select(
      col("doc_id") +: expr(s"size($Toks)").cast("long").as("dl") +: tfCols: _*)
    val aggs = sum(col("dl")).as("sum_dl") +:
      Bm25Terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    var stats = base.agg(count(lit(1)).as("n_docs"), aggs: _*)
    for (t <- Bm25Terms) {
      stats = DetMath.dropLnTmp(
        DetMath.withLn(stats, s"2 * n_docs - 2 * df_$t + 1", s"ia_$t"), s"ia_$t")
      stats = DetMath.dropLnTmp(
        DetMath.withLn(stats, s"2 * df_$t + 1", s"ib_$t"), s"ib_$t")
    }
    stats = stats.withColumn("avgdl", col("sum_dl") / col("n_docs"))
    val score = Bm25Terms.map(t =>
      s"""CASE WHEN tf_$t = 0 THEN 0.0e0
            ELSE (ia_${t}_ln - ib_${t}_ln) * (tf_$t * 2.2e0) /
                 (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * (dl / avgdl))) END""")
      .mkString(" + ")
    base.crossJoin(broadcast(stats))
      .withColumn("bm25", expr(score))
      .select(col("doc_id") +: col("dl") +:
        Bm25Terms.map(t => col(s"tf_$t")) :+ col("bm25"): _*)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  /** DuckDB replay of [[bm25]]: identical narrow tf projections, the
    * same 1-row stats with [[DetMath]] ln chains, the same fixed-order
    * score text. */
  private def bm25Oracle: String = {
    val tfCols = Bm25Terms.map(t =>
      s"len(list_filter(string_split(text, ' '), x -> x = '$t'))::BIGINT AS tf_$t")
      .mkString(",\n               ")
    val dfCols = Bm25Terms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)::BIGINT AS df_$t")
      .mkString(",\n               ")
    val lnCols = Bm25Terms.map(t =>
      DetMath.lnDuckSelect(s"2 * n_docs - 2 * df_$t + 1", s"ia_$t") + ",\n             " +
        DetMath.lnDuckSelect(s"2 * df_$t + 1", s"ib_$t"))
      .mkString(",\n             ")
    val score = Bm25Terms.map(t =>
      s"""CASE WHEN tf_$t = 0 THEN 0.0e0
            ELSE (ia_${t}_ln - ib_${t}_ln) * (tf_$t * 2.2e0) /
                 (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * (dl / avgdl))) END""")
      .mkString(" + ")
    val tfOut = Bm25Terms.map(t => s"tf_$t").mkString(", ")
    s"""
      WITH base AS (
        SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
               $tfCols
        FROM documents),
      st AS (
        SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
               $dfCols
        FROM base),
      st2 AS (
        SELECT *,
             $lnCols,
             sum_dl / n_docs AS avgdl
        FROM st)
      SELECT doc_id, dl, $tfOut, $score AS bm25
      FROM base CROSS JOIN st2
      ORDER BY bm25 DESC, doc_id LIMIT 10"""
  }

  def tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents(s, d)
      .select(col("doc_id"), explode(expr(Toks)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .withColumn("df_t", count(lit(1)).over(Window.partitionBy("tok")))
    val nd = DetMath.withLn(
      documents(s, d).agg(count(lit(1)).as("n_docs")), "n_docs", "ld")
      .select(col("ld_ln").as("ln_d"))
    DetMath.withLn(tf, "df_t", "ldf")
      .crossJoin(broadcast(nd))
      .withColumn("score", expr("c * (ln_d - ldf_ln)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok")))
        .cast("bigint"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("tok").as("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Top-30 bigram collocations by pointwise mutual information — the
    * phrase-mining pass (multi-word expressions, boilerplate detection):
    *
    *   pmi(x,y) = ln p(x,y) − ln p(x) − ln p(y)
    *            = (ln c_xy − ln N_b) − (ln c_x − ln N_u) − (ln c_y − ln N_u)
    *
    * computed in that exact subtraction form (all five logs are
    * [[DetMath]] over modest integer counts; no giant products to
    * overflow). Min count c_xy ≥ 5 filters the unstable tail BEFORE the
    * joins; ties broken by bigram text.
    *
    * Plan/scale: one explode each for the unigram and bigram aggs
    * (inherent — different gram streams), and that is ALL the corpus
    * passes: the N_u/N_b constants come from one NARROW scan of token
    * counts (Σ size, Σ size−1 — no explode, partial-agg'd to one row),
    * and the surviving (≥5) bigrams reach the unigram counts through a
    * melt — each pair explodes to its two (side, token) rows and joins
    * the vocab ONCE — instead of two joins that would each re-expand the
    * unigram subtree (Catalyst does not reuse differently-keyed
    * exchanges). The ≥5 filter bounds the join input at the agg output,
    * before anything joins. */
  def pmi(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(expr(Toks).as("toks"))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c_t"))
    val bg = toks.select(explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
                       i -> named_struct('l', element_at(toks, i),
                                         'r', element_at(toks, i + 1)))
           ELSE array() END""")).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .groupBy("l", "r").agg(count(lit(1)).as("c_xy"))
    val consts = DetMath.withLn(DetMath.withLn(
      documents(s, d)
        .select(expr(s"size($Toks)").cast("long").as("nt"))
        .agg(sum(col("nt")).as("n_u"),
          sum(expr("greatest(nt - 1, 0L)")).as("n_b")),
      "n_u", "lnu"), "n_b", "lnb")
      .select(col("lnu_ln").as("ln_nu"), col("lnb_ln").as("ln_nb"))
    val joined = bg.filter(col("c_xy") >= 5)
      .select(col("l"), col("r"), col("c_xy"), explode(expr(
        """array(named_struct('side', 'l', 'tok', l),
                 named_struct('side', 'r', 'tok', r))""")).as("e"))
      .select(col("l"), col("r"), col("c_xy"),
        col("e.side").as("side"), col("e.tok").as("tok"))
      .join(uni, "tok")
      .groupBy("l", "r", "c_xy")
      .agg(max(when(col("side") === "l", col("c_t"))).as("c_l"),
        max(when(col("side") === "r", col("c_t"))).as("c_r"))
      .crossJoin(broadcast(consts))
    val ln3 = Seq(("c_xy", "lxy"), ("c_l", "lx"), ("c_r", "ly"))
      .foldLeft(joined) { case (df, (n, p)) => DetMath.withLn(df, n, p) }
    ln3
      .withColumn("pmi",
        expr("(lxy_ln - ln_nb) - (lx_ln - ln_nu) - (ly_ln - ln_nu)"))
      .select(concat(col("l"), lit(" "), col("r")).as("bigram"),
        col("c_xy"), col("c_l"), col("c_r"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(30)
  }

  /** Winnowing fingerprint selection (the MOSS algorithm, Schleimer et
    * al., SIGMOD 2003): positional 3-token shingles → 60-bit hashes →
    * sliding window of 4 → keep each window's MINIMUM hash → the distinct
    * survivors are the document's fingerprints. Guarantees any shared run
    * of ≥ 6 tokens contributes at least one COMMON fingerprint, at ~1/4
    * the stored hashes — the sub-document overlap detector that is robust
    * to insertions (unlike [[fingerprint]]'s whole-doc hash). Reported
    * per-doc: positional gram count, fingerprints kept, and how many of
    * them are shared with ≥ 1 other document.
    *
    * Plan/scale: ONE explode of the gram stream (the per-doc gram COUNT
    * is a narrow size() projection, not a second pass) → per-doc
    * sliding-window min (uniform doc_id partitions) → distinct →
    * document-frequency via `count over (partition by fp)` (the
    * one-scan d_span_coverage shape — no self-join) → per-doc agg. All
    * keys uniform (md5-derived); the fingerprint relation is ~n_grams/4
    * rows; no HOF lambdas in the hot path (the hash is a codegen'd
    * per-row conv). */
  def winnow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = documents(s, d)
      .select(col("doc_id"), expr(Toks).as("toks"))
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(toks) >= 3 THEN
             transform(sequence(1, size(toks) - 2),
               i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
                           ' ', element_at(toks, i + 2)))
           ELSE array() END""")).as(Seq("pos", "sh")))
      .withColumn("h", expr(DedupOps.h60("sh")))
    val shared = grams
      .withColumn("fp", min(col("h")).over(
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)))
      .filter(col("pos") >= 3)
      .select(col("doc_id"), col("fp")).distinct()
      .withColumn("docs_with", count(lit(1)).over(Window.partitionBy("fp")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp"),
        sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("n_shared"))
    documents(s, d)
      .select(col("doc_id"),
        expr(s"cast(greatest(size($Toks) - 2, 0) as bigint)").as("n_grams"))
      .join(shared, Seq("doc_id"), "left").na.fill(0L, Seq("n_fp", "n_shared"))
      .orderBy("doc_id")
  }

  /** Zipf's-law fit: least-squares slope of ln(freq) on ln(rank) over the
    * top-100 tokens — the one-number corpus-health diagnostic (natural
    * language sits near −1; template/spam corpora bend away from it).
    * Both logs are [[DetMath]]; the five regression sums go through
    * 1e12-scaled BIGINT accumulators so the Σs are order-independent,
    * and the closed-form slope/intercept is a fixed-order double
    * expression over those exact integers.
    *
    * Plan/scale: vocab agg (one uniform-key shuffle) → top-100 via
    * orderBy+limit (TakeOrdered — a per-partition top-k + driver merge,
    * never a global sort) → the rank window and regression run on 100
    * rows (catalog-sized; the single-partition window is over the
    * limited relation only). */
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val top = documents(s, d)
      .select(explode(expr(Toks)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(100)
      .withColumn("rank", row_number().over(
        w.orderBy(col("c").desc, col("tok"))).cast("bigint"))
    val lns = Seq(("rank", "lr"), ("c", "lc"))
      .foldLeft(top) { case (df, (n, p)) => DetMath.withLn(df, n, p) }
    lns
      .select(
        expr("cast(round(lr_ln * 1.0e12) as bigint)").as("x"),
        expr("cast(round(lc_ln * 1.0e12) as bigint)").as("y"),
        expr("cast(round((lr_ln * lc_ln) * 1.0e12) as bigint)").as("xy"),
        expr("cast(round((lr_ln * lr_ln) * 1.0e12) as bigint)").as("xx"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
        sum(col("xx")).as("sxx"))
      .select(col("k"),
        expr("sx / 1.0e12").as("dx"), expr("sy / 1.0e12").as("dy"),
        expr("sxy / 1.0e12").as("dxy"), expr("sxx / 1.0e12").as("dxx"))
      .select(col("k"), col("dx"), col("dy"),
        expr("(k * dxy - dx * dy) / (k * dxx - dx * dx)").as("slope"))
      .select(col("k").as("n_terms"), col("slope"),
        expr("(dy - slope * dx) / k").as("intercept"))
  }

  /** Out-of-vocabulary rate: the per-document fraction of token instances
    * outside the corpus's top-100 vocabulary — the curation proxy for
    * "how much of this document will a fixed tokenizer shatter into rare
    * pieces". Top-K ties break lexicographically (deterministic in both
    * engines).
    *
    * Plan/scale: the vocabulary is one uniform-key token agg + a global
    * sort-LIMIT (Spark plans TakeOrdered — only K rows ever leave the
    * partial sorts, no full sort materializes); the K-row vocabulary then
    * BROADCASTS back onto the token stream, so the per-doc pass is one
    * Generate + broadcast join + doc-key agg. Two scans of `documents`
    * are inherent: the vocabulary is a global reduction of the same
    * column it then gates. */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val top = documents(s, d)
      .select(explode(expr(Toks)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(100)
      .select(col("tok"), lit(1).as("in_v"))
    documents(s, d)
      .select(col("doc_id"), explode(expr(Toks)).as("tok"))
      .join(broadcast(top), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("n_oov / n_tokens").as("oov_rate"))
      .orderBy("doc_id")
  }

  /** TextRank keyword extraction: PageRank over the word-adjacency graph
    * of the corpus's top-50 vocabulary — undirected, distinct-pair edges
    * from in-document token adjacency, 3 fixed-point iterations in
    * 1e-9-unit INTEGER arithmetic (bit-identical across engines; the
    * d_pagerank machinery re-keyed from doc ids to words). The classic
    * unsupervised keyword pass over a corpus.
    *
    * Plan/scale: the heavy work is edge extraction — one Generate over
    * the token stream with the ≤50-word vocabulary broadcast onto both
    * bigram endpoints, then a distinct on the (catalog-sized) pair set.
    * Iterations run over the checkpointed ≤50-node graph: each is one
    * tiny join+agg, identical at any corpus size because the graph is
    * vocabulary-bounded, not corpus-bounded. */
  def textrank(s: SparkSession, d: String): DataFrame = {
    val Scale = 1000000000L
    val vocab = documents(s, d)
      .select(explode(expr(Toks)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(50)
      .select(col("tok"))
    val bg = documents(s, d).select(expr(Toks).as("toks"))
      .select(explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
                       i -> named_struct('l', element_at(toks, i),
                                         'r', element_at(toks, i + 1)))
           ELSE array() END""")).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .filter(col("l") =!= col("r"))
    val pairs = bg
      .join(broadcast(vocab.withColumnRenamed("tok", "l")), "l")
      .join(broadcast(vocab.withColumnRenamed("tok", "r")), "r")
      .select(least(col("l"), col("r")).as("a"),
        greatest(col("l"), col("r")).as("b"))
      .distinct()
      .localCheckpoint()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b"), col("a")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    val nN = nodes.count()
    if (nN == 0)
      return nodes.select(col("node").as("word"), lit(0L).as("rank_fp"),
        lit(0.0).as("rank"))
    val base = 15L * (Scale / nN) / 100L
    var ranks = nodes.withColumn("r", lit(Scale / nN))
    for (_ <- 1 to 3) {
      val contribs = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("sc"))
      ranks = nodes
        .join(contribs, Seq("node"), "left").na.fill(0L, Seq("sc"))
        .select(col("node"), expr(s"${base}L + (85 * sc) DIV 100").as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node").as("word"), col("r").as("rank_fp"),
      expr("r / 1.0e9").as("rank"))
      .orderBy(col("rank_fp").desc, col("word"))
  }

  /** First-occurrence n-gram novelty: per document, the fraction of its
    * distinct 3-shingles whose corpus-wide FIRST occurrence (min doc_id
    * over the shingle's postings) is this document. A curriculum /
    * diversity-sampling signal: in an id-ordered (e.g. crawl-ordered)
    * corpus, low-novelty documents restate earlier content and can be
    * down-weighted before near-dup thresholds ever fire — novelty is the
    * continuous dial where dedup is the binary cut. Shingle definition is
    * shared with the whole dedup family ([[DedupOps.shinglePostings]] —
    * the fused native `shingles3` kernel), so "content the corpus has
    * seen" means exactly what the dedup tiers mean by it. Documents with
    * zero shingles (< 3 tokens) have no postings and are absent, as in
    * the oracle.
    *
    * Plan/scale: one shuffle on the shingle key for the per-key min
    * window, one uniform doc-key agg. A skew-conscious variant replaces
    * the window with groupBy(sh).min + join to re-enable map-side partial
    * aggregation on hot boilerplate shingles; at the DF profile of this
    * corpus the single-shuffle window wins. */
  def novelty(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    DedupOps.shinglePostings(documents(s, d))
      .withColumn("first_id",
        min(col("doc_id")).over(Window.partitionBy(col("sh"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      // BIGINT / BIGINT → one double division, bit-identical cross-engine
      .withColumn("novelty", col("n_novel") / col("n_sh"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_novelty" -> novelty,
    "t_textrank" -> textrank,
    "t_oov_rate" -> oovRate,
    "t_zipf" -> zipfFit,
    "t_entropy" -> entropy,
    "t_unigram_lm" -> unigramLm,
    "t_bigram_lm" -> bigramLm,
    "t_kn_lm" -> knLm,
    "t_perplexity" -> perplexity,
    "t_tfidf" -> tfidf,
    "t_bm25" -> bm25,
    "t_bleu_pairs" -> bleuPairs,
    "t_rouge_pairs" -> rougePairs,
    "t_ngram_coverage" -> ngramCoverage,
    "t_code_detect" -> codeDetect,
    "t_vocab_drift" -> vocabDrift,
    "t_hapax" -> hapax,
    "t_heaps" -> heaps,
    "t_pmi" -> pmi,
    "t_winnow" -> winnow,
    "t_token_stats" -> tokenStats,
    "t_langid" -> langId,
    "t_lang_confusion" -> langConfusion,
    "t_quality" -> quality,
    "t_fingerprint" -> fingerprint,
    "t_feature_hash" -> featureHash,
    "t_ngram_freq" -> ngramFreq,
    "t_bigram_next" -> bigramNext,
    "t_bpe_tokens" -> bpeTokens,
    "t_bpe_train" -> bpeTrain,
    "t_bpe_apply" -> bpeApply,
    "t_fertility_by_lang" -> fertilityByLang,
    "t_repetition" -> repetition,
    "t_cms_topk" -> cmsTopk,
    "t_pipeline" -> pipeline)

  /** Shared CTE chain of the BPE oracles — the DuckDB replay of
    * [[trainMergeTable]]: the frequency-weighted vocabulary (`w`, `s0`),
    * then per merge iteration a pair-count CTE, a 1-row argmax CTE (same
    * tie-break) and a merge-fold CTE whose lambda captures the winner via
    * CROSS JOIN. Same fold shape as the Spark `aggregate`
    * ([[mergeFoldExpr]]), so the leftmost-first non-overlapping semantics
    * match symbol-for-symbol. Both the train and apply oracles select
    * from this one chain. */
  private def bpeChainCtes: String = {
    def iter(i: Int) = s"""
      p$i AS (SELECT syms[i] AS l, syms[i+1] AS r, freq FROM
               (SELECT freq, syms,
                       unnest(generate_series(1, len(syms) - 1)) AS i
                FROM s${i - 1}) z),
      a$i AS (SELECT l, r, sum(freq)::BIGINT cnt FROM p$i GROUP BY 1, 2),
      m$i AS (SELECT l, r, cnt FROM a$i ORDER BY cnt DESC, l, r LIMIT 1),
      s$i AS (SELECT word, freq, list_reduce(
            list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),
            (acc, x) -> CASE WHEN len(acc) > 0
                             AND acc[-1] = m$i.l AND x[1] = m$i.r
                        THEN list_append(acc[1:len(acc)-1], m$i.l || m$i.r)
                        ELSE list_append(acc, x[1]) END) AS syms
          FROM s${i - 1} CROSS JOIN m$i)"""
    s"""w AS (SELECT word, count(*)::BIGINT freq FROM
                   (SELECT unnest(string_split(text, ' ')) word FROM documents)
                 GROUP BY 1),
      s0 AS (SELECT word, freq, string_split_regex(word, '') AS syms FROM w),
      ${(1 to BpeMerges).map(iter).mkString(",")}"""
  }

  private def bpeTrainOracle: String = {
    val out = (1 to BpeMerges)
      .map(i => s"SELECT ${i - 1}::BIGINT AS merge_idx, l AS l_sym, r AS r_sym, cnt AS pair_count FROM m$i")
      .mkString("\n        UNION ALL ")
    s"""
      WITH $bpeChainCtes
      SELECT merge_idx, l_sym, r_sym, pair_count FROM (
        $out)
      ORDER BY merge_idx"""
  }

  /** [[bpeApply]] oracle: the train chain extended by the encoded-
    * vocabulary lengths (`s0` before / `s$BpeMerges` after) joined onto
    * each document's exploded words. */
  /** [[fertilityByLang]] oracle: the apply-oracle's per-doc rollup joined
    * onto the language column and re-aggregated. */
  private def fertilityOracle: String = s"""
      WITH $bpeChainCtes,
      wl AS (SELECT s0.word, len(s$BpeMerges.syms)::BIGINT AS n_after
             FROM s0 JOIN s$BpeMerges ON s0.word = s$BpeMerges.word),
      dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
      pd AS (SELECT doc_id, count(*)::BIGINT AS n_words,
               sum(n_after)::BIGINT AS n_tokens
             FROM dw JOIN wl ON dw.word = wl.word GROUP BY 1)
      SELECT d.lang, count(*)::BIGINT AS n_docs,
             sum(pd.n_words)::BIGINT AS n_words,
             sum(pd.n_tokens)::BIGINT AS n_tokens,
             sum(pd.n_tokens)::BIGINT / sum(pd.n_words)::BIGINT AS fertility
      FROM pd JOIN documents d USING (doc_id)
      GROUP BY 1 ORDER BY lang"""

  private def bpeApplyOracle: String = s"""
      WITH $bpeChainCtes,
      wl AS (SELECT s0.word, len(s0.syms)::BIGINT AS n_before,
                    len(s$BpeMerges.syms)::BIGINT AS n_after
             FROM s0 JOIN s$BpeMerges ON s0.word = s$BpeMerges.word),
      dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents)
      SELECT doc_id, count(*)::BIGINT AS n_words,
             sum(n_before)::BIGINT AS n_syms_before,
             sum(n_after)::BIGINT AS n_syms_after,
             CASE WHEN sum(n_before) = 0 THEN NULL
                  ELSE sum(n_after)::BIGINT / sum(n_before)::BIGINT END
               AS compression
      FROM dw JOIN wl ON dw.word = wl.word
      GROUP BY doc_id ORDER BY doc_id"""

  /** DuckDB replay of [[unigramScored]] — shared by the t_unigram_lm and
    * t_perplexity oracles so the scoring chain lives in ONE SQL text. */
  private val UnigramScoredSql = s"""
      WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
      kd AS (SELECT nv, ${DetMath.lnDuckSelect("nv", "ld")}
             FROM (SELECT (count(*) + count(DISTINCT tok))::BIGINT AS nv
                   FROM tk)),
      wd AS (SELECT doc_id,
               count(*) OVER (PARTITION BY tok)::BIGINT + 1 AS c1
             FROM tk),
      t AS (SELECT doc_id,
             ${DetMath.lnDuckSelect("c1", "lnum")},
             round(lnum_ln * 1.0e9)::BIGINT AS term
            FROM wd)
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             (sum(term)::BIGINT / 1.0e9) / count(*) - kd.ld_ln AS avg_logprob
      FROM t CROSS JOIN kd GROUP BY doc_id, kd.ld_ln"""

  /** The oracle-side twin of [[pairGramBaseFrom]] — the clipped-n-gram
    * CTE chain shared by the `t_bleu_pairs` and `t_rouge_pairs` oracles
    * (the named-val device: both scores replay the IDENTICAL base, so
    * they cannot drift apart on what a pair's counts are). Ends at
    * `base(a_id, b_id, clip1, tot1, clip2, tot2, rlen)`. */
  private val PairGramBaseDuck: String = s"""${DedupOps.JaccardPairsDuck},
      tk2 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      g1 AS (SELECT doc_id, 1 AS n, unnest(tk) AS gram FROM tk2),
      g2 AS (SELECT doc_id, 2 AS n,
               unnest(list_transform(range(1, len(tk)),
                 i -> tk[i] || ' ' || tk[i+1])) AS gram
             FROM tk2),
      cnt AS (SELECT doc_id, n, gram, count(*)::BIGINT AS c
              FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
              GROUP BY 1, 2, 3),
      h AS (SELECT p.a_id, p.b_id, ca.n, ca.c AS ch,
              coalesce(cb.c, 0)::BIGINT AS cr
            FROM p JOIN cnt ca ON ca.doc_id = p.a_id
            LEFT JOIN cnt cb ON cb.doc_id = p.b_id AND cb.n = ca.n
              AND cb.gram = ca.gram),
      agg AS (SELECT a_id, b_id,
               sum(CASE WHEN n = 1 THEN least(ch, cr) ELSE 0 END)::BIGINT
                 AS clip1,
               sum(CASE WHEN n = 1 THEN ch ELSE 0 END)::BIGINT AS tot1,
               sum(CASE WHEN n = 2 THEN least(ch, cr) ELSE 0 END)::BIGINT
                 AS clip2,
               sum(CASE WHEN n = 2 THEN ch ELSE 0 END)::BIGINT AS tot2
              FROM h GROUP BY 1, 2),
      base AS (SELECT agg.*, len(string_split(d.text, ' '))::BIGINT AS rlen
               FROM agg JOIN documents d ON agg.b_id = d.doc_id)"""

  val oracles: Map[String, String] = Map(
    "t_ngram_coverage" -> s"""
      WITH t AS (SELECT doc_id, lang, string_split(text, ' ') toks
                 FROM documents),
      b AS (SELECT min(doc_id) lo, max(doc_id) hi FROM documents),
      e AS (SELECT lang, (doc_id * 2 <= lo + hi) AS is_train,
              unnest(${DedupOps.ShinglesSql}) AS sh
            FROM t, b),
      g AS (SELECT lang, sh,
              max(CASE WHEN is_train THEN 1 ELSE 0 END)::BIGINT AS in_train,
              max(CASE WHEN NOT is_train THEN 1 ELSE 0 END)::BIGINT AS in_test
            FROM e GROUP BY 1, 2)
      SELECT lang, count(*)::BIGINT AS n_test_grams,
             sum(in_train)::BIGINT AS n_covered,
             CAST(sum(in_train) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS coverage
      FROM g WHERE in_test = 1 GROUP BY 1 ORDER BY lang""",
    "t_rouge_pairs" -> s"""
      WITH $PairGramBaseDuck
      SELECT a_id, b_id, clip1, clip2, tot1 AS hyp_len, rlen AS ref_len,
             CAST(clip1 AS DOUBLE) / CAST(rlen AS DOUBLE) AS rouge1_recall,
             CASE WHEN rlen > 1
               THEN CAST(clip2 AS DOUBLE) / CAST(rlen - 1 AS DOUBLE)
               ELSE CAST(NULL AS DOUBLE) END AS rouge2_recall,
             CAST(2 * clip1 AS DOUBLE) / CAST(tot1 + rlen AS DOUBLE)
               AS rouge1_f1,
             CASE WHEN tot2 + rlen - 1 > 0
               THEN CAST(2 * clip2 AS DOUBLE) / CAST(tot2 + rlen - 1 AS DOUBLE)
               ELSE CAST(NULL AS DOUBLE) END AS rouge2_f1
      FROM base ORDER BY a_id, b_id""",
    "t_novelty" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      s AS (SELECT doc_id, ${DedupOps.ShinglesSql} sh FROM t),
      e AS (SELECT doc_id, unnest(sh) sh1 FROM s),
      w AS (SELECT doc_id,
              min(doc_id) OVER (PARTITION BY sh1) AS first_id
            FROM e)
      SELECT doc_id, count(*)::BIGINT AS n_sh,
             sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)::BIGINT
               AS n_novel,
             sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)::BIGINT
               / count(*) AS novelty
      FROM w GROUP BY doc_id ORDER BY doc_id""",
    // the d_pagerank unrolled-iteration replay, re-keyed to vocabulary
    // words with adjacency edges
    "t_textrank" -> """
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      v AS (SELECT tok FROM (
              SELECT tok, count(*)::BIGINT AS c
              FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1
              ORDER BY c DESC, tok LIMIT 50)),
      bg AS (SELECT toks[i] AS l, toks[i + 1] AS r
             FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
                   FROM t) z
             WHERE toks[i] <> toks[i + 1]),
      p AS (SELECT DISTINCT least(l, r) AS a, greatest(l, r) AS b
            FROM bg JOIN v vl ON bg.l = vl.tok JOIN v vr ON bg.r = vr.tok),
      ed AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
      dg AS (SELECT src, count(*)::BIGINT AS deg FROM ed GROUP BY 1),
      nd AS (SELECT DISTINCT src AS node FROM ed),
      cn AS (SELECT count(*)::BIGINT AS n FROM nd),
      r0 AS (SELECT node, (1000000000 // cn.n)::BIGINT AS r
             FROM nd CROSS JOIN cn),
      c1 AS (SELECT ed.dst AS node, sum(r0.r // dg.deg)::BIGINT AS sc
             FROM ed JOIN r0 ON ed.src = r0.node JOIN dg ON ed.src = dg.src
             GROUP BY 1),
      r1 AS (SELECT nd.node,
               ((15 * (1000000000 // cn.n)) // 100
                + (85 * coalesce(c1.sc, 0)) // 100)::BIGINT AS r
             FROM nd CROSS JOIN cn LEFT JOIN c1 ON nd.node = c1.node),
      c2 AS (SELECT ed.dst AS node, sum(r1.r // dg.deg)::BIGINT AS sc
             FROM ed JOIN r1 ON ed.src = r1.node JOIN dg ON ed.src = dg.src
             GROUP BY 1),
      r2 AS (SELECT nd.node,
               ((15 * (1000000000 // cn.n)) // 100
                + (85 * coalesce(c2.sc, 0)) // 100)::BIGINT AS r
             FROM nd CROSS JOIN cn LEFT JOIN c2 ON nd.node = c2.node),
      c3 AS (SELECT ed.dst AS node, sum(r2.r // dg.deg)::BIGINT AS sc
             FROM ed JOIN r2 ON ed.src = r2.node JOIN dg ON ed.src = dg.src
             GROUP BY 1),
      r3 AS (SELECT nd.node,
               ((15 * (1000000000 // cn.n)) // 100
                + (85 * coalesce(c3.sc, 0)) // 100)::BIGINT AS r
             FROM nd CROSS JOIN cn LEFT JOIN c3 ON nd.node = c3.node)
      SELECT node AS word, r AS rank_fp, r / 1.0e9 AS rank
      FROM r3 ORDER BY rank_fp DESC, word""",
    "t_oov_rate" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
      v AS (SELECT tok FROM (SELECT tok, count(*)::BIGINT AS c FROM toks
              GROUP BY 1 ORDER BY c DESC, tok LIMIT 100)),
      j AS (SELECT t.doc_id, v.tok IS NOT NULL AS in_v
            FROM toks t LEFT JOIN v ON t.tok = v.tok)
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             sum(CASE WHEN NOT in_v THEN 1 ELSE 0 END)::BIGINT AS n_oov,
             sum(CASE WHEN NOT in_v THEN 1 ELSE 0 END)::BIGINT / count(*)
               AS oov_rate
      FROM j GROUP BY 1 ORDER BY doc_id""",
    "t_bpe_train" -> bpeTrainOracle,
    "t_bpe_apply" -> bpeApplyOracle,
    "t_fertility_by_lang" -> fertilityOracle,
    "t_token_stats" -> """
      WITH t AS (SELECT doc_id, text,
                   len(string_split(text,' '))::BIGINT nt,
                   len(list_distinct(string_split(text,' ')))::BIGINT nd
                 FROM documents)
      SELECT doc_id, nt AS n_tokens, nd AS n_distinct,
             nd / nt AS ttr,
             (length(text) - nt + 1) / nt AS mean_tok_len
      FROM t ORDER BY doc_id""",
    "t_lang_confusion" -> s"""
      WITH t AS (SELECT lang,
                   ${hitsSql(stops(0)._2)}::BIGINT en_hits,
                   ${hitsSql(stops(1)._2)}::BIGINT fr_hits,
                   ${hitsSql(stops(2)._2)}::BIGINT es_hits,
                   ${hitsSql(stops(3)._2)}::BIGINT de_hits
                 FROM documents),
      p AS (SELECT lang, $predLangSql AS pred_lang FROM t),
      g AS (SELECT lang, pred_lang, count(*)::BIGINT AS n
            FROM p GROUP BY 1, 2)
      SELECT lang, pred_lang, n,
             n / (sum(n) OVER (PARTITION BY lang))::BIGINT AS recall
      FROM g ORDER BY lang, pred_lang""",
    "t_langid" -> s"""
      WITH t AS (SELECT doc_id, lang,
                   ${hitsSql(stops(0)._2)}::BIGINT en_hits,
                   ${hitsSql(stops(1)._2)}::BIGINT fr_hits,
                   ${hitsSql(stops(2)._2)}::BIGINT es_hits,
                   ${hitsSql(stops(3)._2)}::BIGINT de_hits
                 FROM documents)
      SELECT doc_id, lang, en_hits, fr_hits, es_hits, de_hits,
             $predLangSql AS pred_lang
      FROM t ORDER BY doc_id""",
    "t_quality" -> s"""
      WITH t AS (SELECT doc_id, text,
                   len(string_split(text,' '))::BIGINT nt,
                   len(list_distinct(string_split(text,' ')))::BIGINT nd,
                   ${hitsSql(EnglishStops)}::BIGINT sh
                 FROM documents)
      SELECT doc_id, nt AS n_tokens,
             nd / nt AS ttr,
             sh / nt AS stop_ratio,
             ((nd / nt) * 0.5 + (sh / nt) * 0.3) + (((length(text) - nt + 1) / nt) / 8.0) * 0.2
               AS quality_score
      FROM t ORDER BY doc_id""",
    "t_feature_hash" -> s"""
      WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) tok
                 FROM documents),
      h AS (SELECT doc_id, ${DedupOps.h60Sql("tok")} AS h FROM e),
      g AS (SELECT doc_id, ((h // 2) % $FhDims)::BIGINT AS dim,
              sum(CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS val
            FROM h GROUP BY 1, 2)
      SELECT doc_id, dim, val FROM g WHERE val <> 0
      ORDER BY doc_id, dim""",
    "t_fingerprint" -> """
      SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split_regex(text, ''), c -> unicode(c)::BIGINT)),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_chars,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split(text, ' '), t ->
                 list_reduce(list_prepend(0::BIGINT,
                   list_transform(string_split_regex(substr(md5(t), 1, 15), ''),
                     h -> (strpos('0123456789abcdef', h) - 1)::BIGINT)),
                   (a, b) -> a * 16 + b))),
               (acc, th) -> (acc * 131 + th % 1000000007) % 1000000007) AS fp_tokens
      FROM documents ORDER BY doc_id""",
    "t_ngram_freq" -> """
      WITH t AS (SELECT string_split(text, ' ') toks FROM documents),
      b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])) bigram FROM t)
      SELECT bigram, count(*) AS n FROM b
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "t_bigram_next" -> """
      WITH t AS (SELECT string_split(text, ' ') toks FROM documents),
      b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                     i -> {'head': toks[i], 'nxt': toks[i + 1]})) bg FROM t),
      g AS (SELECT bg.head AS head, bg.nxt AS nxt, count(*)::BIGINT AS n
            FROM b GROUP BY 1, 2),
      w AS (SELECT head, nxt, n,
              sum(n) OVER (PARTITION BY head)::BIGINT AS head_n,
              row_number() OVER (PARTITION BY head ORDER BY n DESC, nxt) AS rn
            FROM g)
      SELECT head, head_n, nxt AS next_tok, n AS next_n,
             n / head_n AS p_next
      FROM w WHERE rn = 1
      ORDER BY head_n DESC, head LIMIT 20""",
    "t_bpe_tokens" -> s"""
      WITH t AS (SELECT doc_id,
                   len(string_split(text, ' '))::BIGINT n_ws,
                   len(regexp_extract_all(text, '$BpePat'))::BIGINT n_bpe
                 FROM documents)
      SELECT doc_id, n_ws, n_bpe, n_bpe / n_ws AS bpe_per_ws
      FROM t ORDER BY doc_id""",
    "t_repetition" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      b AS (SELECT doc_id, len(toks)::BIGINT n_tokens,
              CASE WHEN len(toks) >= 2 THEN
                list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bigrams
            FROM t),
      e AS (SELECT doc_id, unnest(bigrams) bg FROM b),
      c AS (SELECT doc_id, bg, count(*) c FROM e GROUP BY 1, 2),
      tp AS (SELECT doc_id, max(c) AS top_bigram_n FROM c GROUP BY 1)
      SELECT b.doc_id, n_tokens,
             coalesce(top_bigram_n, 0) AS top_bigram_n,
             CASE WHEN len(bigrams) = 0 THEN 0.0
                  ELSE coalesce(top_bigram_n, 0) / len(bigrams) END AS top_bigram_frac,
             CASE WHEN len(bigrams) = 0 THEN 0.0
                  ELSE (len(bigrams) - len(list_distinct(bigrams))) / len(bigrams) END
               AS dup_bigram_frac
      FROM b LEFT JOIN tp ON b.doc_id = tp.doc_id
      ORDER BY b.doc_id""",
    "t_cms_topk" -> {
      def posSql(r: Int) = s"${DedupOps.h60Sql(s"tok || '|c$r'")} % $CmsWidth"
      s"""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) tok FROM documents),
      cells AS (SELECT r, p, count(*)::BIGINT c FROM (
                  SELECT 0 AS r, ${posSql(0)} AS p FROM toks
                  UNION ALL
                  SELECT 1 AS r, ${posSql(1)} AS p FROM toks)
                GROUP BY r, p),
      vocab AS (SELECT tok, count(*)::BIGINT exact_n FROM toks GROUP BY tok)
      SELECT tok, exact_n, least(c0.c, c1.c) AS cms_est
      FROM vocab
      JOIN cells c0 ON c0.r = 0 AND c0.p = ${posSql(0)}
      JOIN cells c1 ON c1.r = 1 AND c1.p = ${posSql(1)}
      ORDER BY cms_est DESC, exact_n DESC, tok LIMIT 20"""
    },
    "t_pipeline" -> s"""
      WITH s AS (SELECT doc_id, text,
                   len(string_split(text, ' '))::BIGINT nt,
                   len(list_distinct(string_split(text, ' ')))::BIGINT nd,
                   ${hitsSql(EnglishStops)}::BIGINT en_hits
                 FROM documents),
      f AS (SELECT * FROM s WHERE nt >= 20 AND nd / nt > 0.3),
      k AS (SELECT min(doc_id) AS doc_id
            FROM (SELECT doc_id, md5(text) h FROM f) GROUP BY h)
      SELECT f.doc_id, nt AS n_tokens, nd / nt AS ttr, en_hits / nt AS stop_ratio
      FROM f JOIN k ON f.doc_id = k.doc_id
      WHERE en_hits >= 2
      ORDER BY f.doc_id""",
    "t_entropy" -> s"""
      WITH e AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
                 FROM documents),
      g AS (SELECT doc_id, ch, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
      t AS (SELECT doc_id, c,
             ${DetMath.lnDuckSelect("c", "lc")},
             round((c * lc_ln) * 1.0e9)::BIGINT AS term
            FROM g),
      a AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(term)::BIGINT AS sl
            FROM t GROUP BY 1),
      f AS (SELECT doc_id, n,
             ${DetMath.lnDuckSelect("n", "lnn")},
             lnn_ln - (sl / 1.0e9) / n AS entropy
            FROM a)
      SELECT doc_id, n AS n_chars_counted, entropy
      FROM f ORDER BY doc_id""",
    "t_zipf" -> s"""
      WITH v AS (SELECT tok, count(*)::BIGINT AS c
                 FROM (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM documents)
                 GROUP BY 1),
      top AS (SELECT tok, c FROM v ORDER BY c DESC, tok LIMIT 100),
      rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok)::BIGINT
                       AS rank
             FROM top),
      t AS (SELECT
              ${DetMath.lnDuckSelect("rank", "lr")},
              ${DetMath.lnDuckSelect("c", "lc")},
              round(lr_ln * 1.0e12)::BIGINT AS x,
              round(lc_ln * 1.0e12)::BIGINT AS y,
              round((lr_ln * lc_ln) * 1.0e12)::BIGINT AS xy,
              round((lr_ln * lr_ln) * 1.0e12)::BIGINT AS xx
            FROM rk),
      a AS (SELECT count(*)::BIGINT AS k, sum(x)::BIGINT AS sx,
              sum(y)::BIGINT AS sy, sum(xy)::BIGINT AS sxy,
              sum(xx)::BIGINT AS sxx
            FROM t),
      f AS (SELECT k, sx / 1.0e12 AS dx, sy / 1.0e12 AS dy,
              sxy / 1.0e12 AS dxy, sxx / 1.0e12 AS dxx
            FROM a),
      g AS (SELECT k, dx, dy,
              (k * dxy - dx * dy) / (k * dxx - dx * dx) AS slope
            FROM f)
      SELECT k AS n_terms, slope, (dy - slope * dx) / k AS intercept
      FROM g""",
    "t_unigram_lm" -> s"""
      SELECT * FROM ($UnigramScoredSql) ORDER BY doc_id""",
    "t_bigram_lm" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
                   FROM t) z),
      ct AS (SELECT (count(*) + count(DISTINCT w2))::BIGINT AS nv FROM bg),
      wd AS (SELECT doc_id,
               count(*) OVER (PARTITION BY w1, w2)::BIGINT AS cb,
               count(*) OVER (PARTITION BY w1)::BIGINT AS c1,
               count(*) OVER (PARTITION BY w2)::BIGINT AS c2
             FROM bg),
      sc AS (SELECT doc_id, (cb * nv + (c2 + 1) * c1)::BIGINT AS num,
                    (2 * c1 * nv)::BIGINT AS den
             FROM wd CROSS JOIN ct),
      l1 AS (SELECT doc_id, den,
               ${DetMath.lnDuckSelect("num", "ln1")}
             FROM sc),
      l2 AS (SELECT doc_id, ln1_ln,
               ${DetMath.lnDuckSelect("den", "ln2")}
             FROM l1),
      ag AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               sum(CAST(round(ln1_ln * 1.0e9) AS BIGINT)
                   - CAST(round(ln2_ln * 1.0e9) AS BIGINT))::BIGINT AS sl
             FROM l2 GROUP BY 1)
      SELECT doc_id, n_bigrams, (sl / 1.0e9) / n_bigrams AS avg_logprob
      FROM ag ORDER BY doc_id""",
    "t_kn_lm" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
      bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
                   FROM t) z),
      ty AS (SELECT DISTINCT w1, w2 FROM bg),
      tw AS (SELECT w1, w2,
               count(*) OVER (PARTITION BY w1)::BIGINT AS n1w1,
               count(*) OVER (PARTITION BY w2)::BIGINT AS nc2
             FROM ty),
      k AS (SELECT count(*)::BIGINT AS nt FROM ty),
      wd AS (SELECT doc_id,
               count(*) OVER (PARTITION BY b.w1, b.w2)::BIGINT AS cb,
               count(*) OVER (PARTITION BY b.w1)::BIGINT AS c1,
               tw.n1w1, tw.nc2
             FROM bg b JOIN tw USING (w1, w2)),
      sc AS (SELECT doc_id, ((2 * cb - 1) * nt + n1w1 * nc2)::BIGINT AS num,
                    (2 * c1 * nt)::BIGINT AS den
             FROM wd CROSS JOIN k),
      l1 AS (SELECT doc_id, den,
               ${DetMath.lnDuckSelect("num", "ln1")}
             FROM sc),
      l2 AS (SELECT doc_id, ln1_ln,
               ${DetMath.lnDuckSelect("den", "ln2")}
             FROM l1),
      ag AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               sum(CAST(round(ln1_ln * 1.0e9) AS BIGINT)
                   - CAST(round(ln2_ln * 1.0e9) AS BIGINT))::BIGINT AS sl
             FROM l2 GROUP BY 1)
      SELECT doc_id, n_bigrams, (sl / 1.0e9) / n_bigrams AS avg_logprob
      FROM ag ORDER BY doc_id""",
    "t_perplexity" -> s"""
      WITH u AS ($UnigramScoredSql),
      e AS (SELECT doc_id, n_tokens, avg_logprob, -avg_logprob AS nl,
             ${DetMath.expDuckSelect("nl", "px")}
            FROM u)
      SELECT doc_id, n_tokens, avg_logprob, px_exp AS ppl
      FROM e ORDER BY doc_id""",
    "t_bm25" -> bm25Oracle,
    "t_vocab_drift" -> s"""
      SELECT source AS half, n_tokens, js_vs_rest AS js_vs_other
      FROM (${ValidationOps.jsDuckFrom("""
        SELECT source, tok, count(*)::BIGINT AS a FROM (
          SELECT CASE WHEN d.doc_id * 2 <= b.lo + b.hi
                   THEN 'early' ELSE 'late' END AS source,
                 unnest(string_split(d.text, ' ')) AS tok
          FROM documents d CROSS JOIN
            (SELECT min(doc_id) AS lo, max(doc_id) AS hi
             FROM documents) b)
        GROUP BY 1, 2""")}) z ORDER BY half""",
    "t_code_detect" -> """
      WITH c AS (
        SELECT doc_id, length(text)::BIGINT AS n_chars,
          ((length(text) - length(replace(text, '{', '')))
            + (length(text) - length(replace(text, '}', ''))))::BIGINT
            AS n_braces,
          (length(text) - length(replace(text, ';', '')))::BIGINT AS n_semi,
          (length(text) - length(replace(text, '=', '')))::BIGINT AS n_eq,
          ((length(text) - length(replace(text, '(', '')))
            + (length(text) - length(replace(text, ')', ''))))::BIGINT
            AS n_paren,
          (length(text) - length(replace(text, '_', '')))::BIGINT
            AS n_underscore
        FROM documents)
      SELECT doc_id, n_chars, n_braces, n_semi, n_eq, n_paren, n_underscore,
             (4 * n_braces + 2 * n_semi + n_eq + n_paren + n_underscore)::BIGINT
               AS code_score,
             CAST(n_braces + n_semi + n_eq + n_paren + n_underscore AS DOUBLE)
               / CAST(n_chars AS DOUBLE) AS symbol_density,
             100 * (4 * n_braces + 2 * n_semi + n_eq + n_paren + n_underscore)
               > n_chars AS is_code
      FROM c ORDER BY doc_id""",
    "t_bleu_pairs" -> s"""
      WITH $PairGramBaseDuck,
      l AS (SELECT *,
              ${DetMath.lnDuckSelect("greatest(1::BIGINT, clip1)", "l1")},
              ${DetMath.lnDuckSelect("tot1", "t1")},
              ${DetMath.lnDuckSelect("greatest(1::BIGINT, clip2)", "l2")},
              ${DetMath.lnDuckSelect("greatest(1::BIGINT, tot2)", "t2")}
            FROM base)
      SELECT a_id, b_id, clip1, tot1, clip2, tot2, rlen AS ref_len,
             CASE WHEN clip1 >= 1 AND clip2 >= 1
               THEN 0.5e0 * (l1_ln - t1_ln) + 0.5e0 * (l2_ln - t2_ln)
                 + least(0.0e0,
                     1.0e0 - CAST(rlen AS DOUBLE) / CAST(tot1 AS DOUBLE))
               ELSE CAST(NULL AS DOUBLE) END AS log_bleu2
      FROM l ORDER BY a_id, b_id""",
    "t_hapax" -> """
      WITH tf AS (SELECT lang, tok, count(*)::BIGINT AS f
                  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  GROUP BY 1, 2)
      SELECT lang, sum(f)::BIGINT AS n_tokens,
             count(*)::BIGINT AS n_vocab,
             sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
             sum(CASE WHEN f = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis,
             sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) / count(*)
               AS hapax_type_rate,
             sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) / sum(f)
               AS unseen_mass_est
      FROM tf GROUP BY 1 ORDER BY lang""",
    "t_heaps" -> """
      WITH fd AS (
        SELECT tok, min(doc_id) AS first_doc
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1),
      cps AS (SELECT unnest([64, 128, 256, 512, 1024, 2048, 4096, 8192]) AS cp),
      v AS (SELECT c.cp, count(*)::BIGINT AS n_vocab
            FROM fd f JOIN cps c ON f.first_doc < c.cp GROUP BY 1),
      nd AS (SELECT c.cp, count(*)::BIGINT AS n_docs
             FROM documents d JOIN cps c ON d.doc_id < c.cp GROUP BY 1)
      SELECT nd.cp::BIGINT AS checkpoint, nd.n_docs,
             coalesce(v.n_vocab, 0)::BIGINT AS n_vocab
      FROM nd LEFT JOIN v ON nd.cp = v.cp
      ORDER BY checkpoint""",
    "t_tfidf" -> s"""
      WITH tf AS (SELECT doc_id, tok, count(*)::BIGINT AS c
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  GROUP BY 1, 2),
      wd AS (SELECT doc_id, tok, c,
               count(*) OVER (PARTITION BY tok)::BIGINT AS df_t
             FROM tf),
      nd AS (SELECT n_docs,
              ${DetMath.lnDuckSelect("n_docs", "ld")}
             FROM (SELECT count(*)::BIGINT AS n_docs FROM documents)),
      sc AS (SELECT doc_id, tok, c, df_t,
              ${DetMath.lnDuckSelect("df_t", "ldf")},
              c * (nd.ld_ln - ldf_ln) AS score
             FROM wd CROSS JOIN nd),
      rk AS (SELECT doc_id, tok, score,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, tok) AS rank
             FROM sc)
      SELECT doc_id, rank, tok AS term, score
      FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""",
    "t_pmi" -> s"""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      uni AS (SELECT tok, count(*)::BIGINT AS c_t
              FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
      bg AS (SELECT l, r, count(*)::BIGINT AS c_xy
             FROM (SELECT toks[i] AS l, toks[i + 1] AS r
                   FROM (SELECT toks,
                           unnest(generate_series(1, len(toks) - 1)) AS i
                         FROM t) z)
             GROUP BY 1, 2),
      nu AS (SELECT n_u, ${DetMath.lnDuckSelect("n_u", "lnu")}
             FROM (SELECT sum(c_t)::BIGINT AS n_u FROM uni)),
      nb AS (SELECT n_b, ${DetMath.lnDuckSelect("n_b", "lnb")}
             FROM (SELECT sum(c_xy)::BIGINT AS n_b FROM bg)),
      j AS (SELECT bg.l, bg.r, c_xy, ul.c_t AS c_l, ur.c_t AS c_r
            FROM bg JOIN uni ul ON bg.l = ul.tok
                    JOIN uni ur ON bg.r = ur.tok
            WHERE c_xy >= 5),
      f AS (SELECT l, r, c_xy, c_l, c_r,
             ${DetMath.lnDuckSelect("c_xy", "lxy")},
             ${DetMath.lnDuckSelect("c_l", "lx")},
             ${DetMath.lnDuckSelect("c_r", "ly")},
             (lxy_ln - nb.lnb_ln) - (lx_ln - nu.lnu_ln) - (ly_ln - nu.lnu_ln)
               AS pmi
            FROM j CROSS JOIN nu CROSS JOIN nb)
      SELECT l || ' ' || r AS bigram, c_xy, c_l, c_r, pmi
      FROM f ORDER BY pmi DESC, bigram LIMIT 30""",
    "t_winnow" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      g AS (SELECT doc_id, i AS pos,
              toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
            FROM (SELECT doc_id, toks,
                    unnest(generate_series(1, len(toks) - 2)) AS i
                  FROM t WHERE len(toks) >= 3) z),
      h AS (SELECT doc_id, pos, ${DedupOps.h60Sql("sh")} AS hv FROM g),
      wmin AS (SELECT doc_id, pos,
                min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
               FROM h),
      sel AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE pos >= 4),
      pd AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g GROUP BY 1),
      dfp AS (SELECT fp, count(*)::BIGINT AS docs_with FROM sel GROUP BY 1),
      sh2 AS (SELECT s2.doc_id, count(*)::BIGINT AS n_fp,
                sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END)::BIGINT
                  AS n_shared
              FROM sel s2 JOIN dfp USING (fp) GROUP BY 1)
      SELECT d.doc_id, coalesce(n_grams, 0)::BIGINT AS n_grams,
             coalesce(n_fp, 0)::BIGINT AS n_fp,
             coalesce(n_shared, 0)::BIGINT AS n_shared
      FROM documents d
      LEFT JOIN pd ON d.doc_id = pd.doc_id
      LEFT JOIN sh2 ON d.doc_id = sh2.doc_id
      ORDER BY d.doc_id""")
}
