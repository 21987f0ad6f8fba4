package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / semi-structured ops over the `events` table: JSON
  * extraction, tumbling-window aggregation, gap-based sessionization.
  * (SURVEY.md §2.2 — absent in the reference; standard engine surface and
  * the batch shape of the §7.5 streaming path.)
  */
object EventOps {
  import Tables._
  import Exact._

  /** JSON field extraction from the `props` column. */
  def qJsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** Tumbling 1-hour windows per event_type — the batch equivalent of a
    * Structured Streaming windowed aggregation (see graft.streaming).
    * One shuffle on (hour, type); partial aggregation makes the map-side
    * output tiny at any scale. */
  def qTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("hour_start", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap): lag → new-session
    * flag → running sum = session id → per-session aggregate. Two window
    * passes over the same (user_id, ts) partitioning — Spark reuses the
    * sort; single shuffle on user_id, which is the right distribution key
    * at 100 TB (sessions never straddle users). */
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000 // 30 min in microseconds
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Pareto concentration curve of per-user activity — [[qGini]]'s
    * scalar drawn out as the readings a capacity/abuse review quotes:
    * the share of ALL events produced by the top {1, 5, 10, 25, 50}%
    * most-active users, with the concentration lift (share ÷ pct).
    * "Top 1% = 40× lift" is an abuse-review smoking gun; a lift near 1
    * says the load is organic.
    *
    * The global rank never materializes (the [[qGini]] device): the
    * per-user counts collapse to the DISTINCT-VALUES histogram
    * (support-sized — at most √(2E) rows), exclusive prefix sums run
    * over that relation, and each percentile checkpoint r_k =
    * ⌈U·k/100⌉ lands in exactly ONE bucket, inside which users are
    * exchangeable so the cumulative event count is the closed form
    * ce + (r_k − cu)·c — exact BIGINTs end to end, one division for
    * the share and one for the lift. Checkpoint ranks use integer
    * ceiling division ((U·k + 99) DIV 100), identical in both engines
    * for nonnegative operands.
    *
    * Plan/scale: one uniform user-key agg → support-sized value agg →
    * ONE support-sized ordered window (the catalog-window argument) →
    * a 5-way checkpoint melt. No per-row rank, no global sort. */
  def qPareto(s: SparkSession, d: String): DataFrame =
    paretoFrom(events(s, d).select(col("user_id")))

  /** [[qPareto]] over a caller-supplied (user_id) event relation — the
    * testable core (closed-form checkpoints on constructed uniform and
    * single-whale distributions). */
  private[ops] def paretoFrom(ev: DataFrame): DataFrame = {
    val w = Window.orderBy(col("c").desc)
    val h = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("nu"))
      .withColumn("ev", col("c") * col("nu"))
    val pre = h
      .withColumn("cu", sum(col("nu")).over(w) - col("nu"))
      .withColumn("ce", sum(col("ev")).over(w) - col("ev"))
      .withColumn("u_tot", sum(col("nu")).over(Window.partitionBy()))
      .withColumn("e_tot", sum(col("ev")).over(Window.partitionBy()))
    pre
      .select(col("*"), explode(expr("array(1L, 5L, 10L, 25L, 50L)"))
        .as("pct"))
      .withColumn("rk", expr("(u_tot * pct + 99L) div 100L"))
      .filter(col("rk") > col("cu") && col("rk") <= col("cu") + col("nu"))
      .select(col("pct"), col("rk").as("top_users"),
        (col("ce") + (col("rk") - col("cu")) * col("c")).as("events_cum"),
        col("e_tot").as("n_events_total"),
        expr("(ce + (rk - cu) * c) / e_tot").as("share"),
        expr("(100L * (ce + (rk - cu) * c)) / (pct * e_tot)").as("lift"))
      .orderBy("pct")
  }

  /** Gini coefficient of per-user activity — the concentration one-number
    * behind "1% of users generate half the events" (and, on a corpus, "is
    * this source a few mega-contributors or a long tail"): G = (2·Σᵢ i·xᵢ
    * − (n+1)·Σx) / (n·Σx) over ascending-sorted per-user counts.
    *
    * The global rank never materializes: within a tie block of count
    * value x (n_c users, B_c users below), the rank-weighted sum is
    * x·(n_c·B_c + n_c(n_c+1)/2) in closed form — so the plan is a
    * uniform user-key agg, a distinct-count-value agg, and a prefix-sum
    * window over the DISTINCT-VALUES relation (support-sized, hundreds
    * of rows at any corpus scale — the same catalog-window argument as
    * e_ewma). The e_rfm bucket machinery without the per-row rank.
    * Ties make the formula well-defined: any within-tie order gives the
    * same sum.
    *
    * Exactness at EXTREME scale (the round-9 latent risk, closed):
    * 2·Σ i·x used to ride a DECIMAL(38)/HUGEINT ledger whose final
    * DECIMAL→DOUBLE cast diverges across engines by 1 ulp once the sum
    * clears 2^53 (the exact bug class [[Exact.limbDbl]] fixed for
    * v_corr_matrix). The limb device could not be applied directly
    * because the per-term product x·c (c = the tie-block factor
    * 2·nc·b + nc·(nc+1)) itself outgrows BIGINT — so the TERM is
    * limb-split BEFORE the multiply: with xh/xl and ch/cl the 2^30
    * halves of x and c, the product is xh·ch·2^60 + (xh·cl + xl·ch)·2^30
    * + xl·cl, and each weight class accumulates in BIGINT (the two low
    * classes through their own DIV/% pair, since e.g. Σ xl·cl alone can
    * clear 2^63 when x and c both sit just under the limb). The three
    * recombined limbs go through [[Exact.limb3Dbl]] — identical IEEE op
    * chains in both engines. Documented envelope, guarded IN-PLAN
    * (throws identically in both engines rather than desyncing):
    * n_users < 2^30 (beyond that c overflows BIGINT) and
    * n_events < 2^53; within it every accumulator stays under 2^62
    * (worst-case: Σ xh·cl ≤ Σ x = E; Σ xl·ch ≤ 2^30·Σc/2^30 ≤ 2^61;
    * per-class DIV/% sums ≤ support·2^33 with support ≤ √(2E) < 2^27). */
  def qGini(s: SparkSession, d: String): DataFrame = {
    val byCount = events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("x"))
      .groupBy("x").agg(count(lit(1)).as("nc"))
    val pref = byCount.withColumn("b",
      coalesce(sum(col("nc")).over(
        Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    giniFromSupport(pref)
  }

  /** Per-row ceiling on nc and b inside [[giniFromSupport]]'s tie-block
    * factor: ⌊2^30.5⌋, so 2·nc·b + nc·(nc+1) < 2^63 whenever both pass
    * — the factor is computed ONLY behind this gate, which means the
    * envelope message fires BEFORE either engine can hit its native
    * BIGINT-overflow error (different text, different code) in the
    * c product. Never fires inside the documented envelope: there
    * nc ≤ n_users < 2^30 and b < 2^30. (The one regime left to native
    * errors is Σ x·nc ≥ 2^63 — more events than BIGINT counts — where
    * the sum itself overflows before any guard can aggregate.) */
  private val GiniRowLimit = 1518500249L

  /** The gini ledger over a (x, nc, b) support relation — factored so
    * the overflow-regime spec can drive constructed wide counts through
    * the EXACT production expression without materializing 2^53 events. */
  private[ops] def giniFromSupport(pref: DataFrame): DataFrame = {
    val L = Exact.Limb
    val mid = s"(x DIV ${L}L) * (c % ${L}L) + (x % ${L}L) * (c DIV ${L}L)"
    val low = s"(x % ${L}L) * (c % ${L}L)"
    val s2d = Exact.limb3Dbl("s_a + s_mh", "s_ml + s_ch", "s_cl")
    val subd = Exact.limbDbl(
      s"(n_users + 1) * (n_events DIV ${L}L)",
      s"(n_users + 1) * (n_events % ${L}L)")
    val dend = Exact.limbDbl(
      s"n_users * (n_events DIV ${L}L)",
      s"n_users * (n_events % ${L}L)")
    pref
      .withColumn("c", expr(Exact.guarded(
        s"nc > ${GiniRowLimit}L OR b > ${GiniRowLimit}L",
        "e_gini ledger envelope exceeded (n_users >= 2^30 or n_events >= 2^53)",
        "2 * nc * b + nc * (nc + 1)")))
      .agg(
        sum(col("nc")).as("n_users"),
        sum(col("x") * col("nc")).as("n_events"),
        sum(expr(s"(x DIV ${L}L) * (c DIV ${L}L)")).as("s_a"),
        sum(expr(s"($mid) DIV ${L}L")).as("s_mh"),
        sum(expr(s"($mid) % ${L}L")).as("s_ml"),
        sum(expr(s"($low) DIV ${L}L")).as("s_ch"),
        sum(expr(s"($low) % ${L}L")).as("s_cl"))
      .withColumn("gini", expr(Exact.guarded(
        s"n_users >= ${1L << 30}L OR n_events >= ${1L << 53}L",
        "e_gini ledger envelope exceeded (n_users >= 2^30 or n_events >= 2^53)",
        s"(($s2d) - ($subd)) / ($dend)")))
      .select(col("n_users"), col("n_events"), col("gini"))
  }

  /** Session path mining: frequency of every event-type TRIGRAM walked
    * inside one 30-minute-gap session (the [[qSessionize]] rule) — the
    * "what do users actually do" report behind funnel design; [[qMarkov]]
    * models first-order transitions, this surfaces the raw higher-order
    * paths the Markov assumption smooths away. A trigram counts only when
    * all three events share a session: session ids are nondecreasing in
    * event order, so `lead(session_id, 2) = session_id` alone proves all
    * three rows co-sessioned. Output is the full path histogram (the
    * event-type catalog cubed bounds it — catalog-sized, no top-k cutoff
    * needed), count-desc with a path tie-break.
    *
    * Plan/scale: the sessionize windows and BOTH leads share one
    * user_id-keyed sort — deliberately NOT `partitionBy(user_id,
    * session_id)`, which would demand a second exchange on the wider key;
    * Catalyst plans ONE shuffle + sort and stacks all four window
    * functions over it. The histogram agg is catalog-sized with map-side
    * partial aggregation. */
  def qPaths(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t2", lead(col("event_type"), 1).over(byUser))
      .withColumn("t3", lead(col("event_type"), 2).over(byUser))
      .withColumn("s3", lead(col("session_id"), 2).over(byUser))
      .filter(col("s3") === col("session_id"))
      .select(concat(col("event_type"), lit(">"), col("t2"), lit(">"),
        col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
  }

  /** Gap sessions via Spark's NATIVE session_window operator (the same
    * 30-minute-gap semantics as [[qSessionize]]'s lag/sum formulation,
    * with the operator's end = last event + gap convention). Batch and
    * Structured Streaming share this exact operator — the query is the
    * batch twin of a streaming watermarked session aggregation, which is
    * why it exists alongside qSessionize: one engine mechanism, two
    * execution modes.
    *
    * Plan/scale: Catalyst plans SessionWindow + merging aggregation over
    * ONE user_id-keyed exchange with a partition-local sort — the same
    * single-shuffle shape as the window formulation; sessions never
    * straddle users, so the key is uniform. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** As-of join: for every click, the most recent view by the same user at
    * or before it. Spark has no native ASOF; the scalable formulation is
    * union + window carry-forward — ONE shuffle on user_id and a sorted
    * pass, versus a range self-join that explodes to |clicks|x|views| per
    * user before picking the max. Ties break deterministically by
    * (ts, side, event_id) — views sort before clicks at equal ts, matching
    * ASOF's `view.ts <= click.ts` semantics. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
      .withColumn("view_id",
        last(when(col("is_click") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ts",
        last(when(col("is_click") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_click") === 1)
      .select(col("event_id").as("click_id"), col("user_id"), col("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
      .orderBy("click_id")
  }

  /** FORWARD as-of join — for every click, the NEXT view by the same
    * user at or after it: the reaction-time direction ([[qAsofJoin]]
    * answers "what did they last see"; this answers "what did they see
    * NEXT", the shape behind time-to-next-impression and
    * did-the-nudge-land questions). Same scalable union + window
    * formulation, mirrored: ONE user-key shuffle, a sorted pass, and a
    * CURRENT-ROW..UNBOUNDED-FOLLOWING ignore-nulls first_value. Ties
    * break with clicks BEFORE views at equal ts so an equal-timestamp
    * view satisfies `view.ts >= click.ts` — the exact mirror of the
    * backward join's views-first tiebreak. A click with no later view
    * reads NULL ids/gap in both engines. */
  def qAsofFwd(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click").desc, col("event_id"))
      .rowsBetween(0, Window.unboundedFollowing)
    events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .withColumn("is_click", when(col("event_type") === "click", 1).otherwise(0))
      .withColumn("view_id",
        first(when(col("is_click") === 0, col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("view_ts",
        first(when(col("is_click") === 0, col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("is_click") === 1)
      .select(col("event_id").as("click_id"), col("user_id"), col("view_id"),
        (unix_micros(col("view_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy("click_id")
  }

  /** Range join: clicks falling inside each error's 5-minute window.
    * Bucketized: both sides get a 5-min epoch bucket key (windows span
    * exactly two buckets), so the physical join is an equi-join on the
    * bucket plus a residual range filter — shuffle-partitioned by bucket,
    * never the O(|A|x|B|) nested-loop a raw inequality join plans. A
    * (error, click) pair can only meet in the click's single bucket, so no
    * dedup is needed. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val winUs = 300L * 1000000L // 5 minutes
    val errors = events(s, d)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("t0"),
        explode(expr(s"array(unix_micros(ts) div $winUs, unix_micros(ts) div $winUs + 1)"))
          .as("bucket"))
    val clicks = events(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), unix_micros(col("ts")).as("tc"),
        expr(s"unix_micros(ts) div $winUs").as("bucket"))
    errors.join(clicks, Seq("bucket"))
      .filter(col("tc") >= col("t0") && col("tc") <= col("t0") + winUs)
      .groupBy("err_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("err_id")
  }

  /** Salted two-stage aggregation — the skew-mitigation pattern for hot
    * keys at 100 TB: stage 1 groups on (key, salt) so a pathological key's
    * rows spread over 16 reducers; stage 2 merges the 16 partials per key.
    * (`event_type` has only 4 values — every key IS a hot key, which is
    * exactly when the direct groupBy's per-key reducer becomes the
    * straggler. Results are identical to a direct groupBy; the salt is
    * derived from event_id so the plan stays deterministic.) Exact sums via
    * the scaled-integer accumulator, which being integer also reassociates
    * freely across the two stages. */
  def qSkewSalted(s: SparkSession, d: String): DataFrame = {
    val scale = 1000000L
    events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(round(col("value") * scale).cast("long")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        (sum(col("pv")).cast("double") / scale.toDouble).as("total_value"))
      .orderBy("event_type")
  }

  /** LEAD/LAG analytic family: per-user previous/next event values and the
    * inter-event gap — the per-entity "delta" pass every event pipeline
    * runs. One shuffle on user_id; (ts, event_id) makes the order total so
    * lead/lag are deterministic under duplicate timestamps. */
  def qLeadLag(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))))
      .withColumn("next_value", lead(col("value"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))))
      .withColumn("gap_us",
        col("ts_us") - lag(col("ts_us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("value"), col("prev_value"), col("next_value"), col("gap_us"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Data-quality report — the Deequ-style validation summary a pipeline
    * gates ingestion on, computed as ONE narrow aggregate pass (conditional
    * counts fold into the same partial aggregation; no per-check scan):
    * per event_type, row count, null/violation tallies for each declared
    * constraint, and value bounds. At 100 TB this is the same single
    * shuffle as any grouped count — validation is free relative to the
    * scan. */
  def qQualityReport(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("user_id").isNull, 1)).as("null_user"),
        count(when(col("value").isNull, 1)).as("null_value"),
        count(when(col("value") < 0, 1)).as("neg_value"),
        count(when(col("value") > 1000, 1)).as("over_cap"),
        count(when(length(col("props")) === 0 || col("props").isNull, 1))
          .as("empty_props"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")

  /** CDC upsert / MERGE-INTO semantics without a table format: a
    * deterministic changelog (updates to every key ≡3 mod 10, inserts of
    * fresh keys from every key ≡7 mod 10) merged into the `orders`
    * snapshot — updates win over base, inserts append, untouched rows
    * keep. Reported as a per-op summary (row count + exact price total)
    * so the whole merge is content-checked, not just counted.
    *
    * Plan/scale: ONE full-outer sort-merge join on the (uniform) key —
    * the merge-on-read shape; at 100 TB both sides bucket/sort by the key
    * so the join is exchange-free ([[Bucketing]] shows that layout), and
    * the op-summary agg is catalog-sized. No driver loop, no per-row
    * lookups. */
  def qUpsertMerge(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    // one changelog scan, not a union of two filtered scans — the update
    // and insert rows differ only in projection
    val updates = orders(s, d)
      .filter(col("o_orderkey") % 10 === 3 || col("o_orderkey") % 10 === 7)
      .select(
        when(col("o_orderkey") % 10 === 3, col("o_orderkey"))
          .otherwise(col("o_orderkey") + lit(100000000L)).as("k"),
        when(col("o_orderkey") % 10 === 3, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")).as("price"))
    base.as("b").join(updates.as("u"), col("b.k") === col("u.k"), "full_outer")
      .select(
        coalesce(col("u.k"), col("b.k")).as("k"),
        coalesce(col("u.price"), col("b.price")).as("price"),
        when(col("u.k").isNull, lit("kept"))
          .when(col("b.k").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("op"))
      .groupBy("op")
      .agg(count(lit(1)).as("n_rows"), dsum(col("price")).as("total_price"))
      .orderBy("op")
  }

  /** Slowly-changing-dimension type 2: collapse each user's event_type
    * stream into effective-dated history rows (valid_from, valid_to,
    * is_current) — the standard dimension-build for incremental training
    * -data snapshots. Run-length grouping via the lag≠current change flag
    * → running sum; `valid_to` = next run's `valid_from`.
    *
    * Plan/scale: two window passes over the SAME (user_id, time)
    * partitioning (Spark reuses one sort+shuffle) + one uniform-key agg;
    * the second window runs over run-level rows (tiny). User keys are
    * uniform — no skew; nothing global. */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "grp", "event_type")
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    // valid_from can tie across adjacent runs (equal ts, distinct
    // event_id) — grp breaks the tie deterministically in both engines
    val w2 = Window.partitionBy("user_id").orderBy(col("valid_from"), col("grp"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("n_events"))
      .orderBy("user_id", "valid_from")
  }

  /** Weekly cohort-retention matrix: users bucketed by the week of their
    * FIRST event (date_trunc week — Monday start in both engines), then
    * distinct active users per (cohort_week, weeks_since) cell. The
    * standard growth-analytics report, here as a data-engine op.
    *
    * Plan/scale: ONE scan — the cohort week is a per-user window min
    * (uniform user key), the matrix one (cohort, offset) agg with
    * map-side-combinable distinct. Nothing global; output is
    * weeks × weeks cells. */
  def qCohort(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(s, d)
      .withColumn("cw", date_trunc("week", min(col("ts")).over(w)))
      .withColumn("ew", date_trunc("week", col("ts")))
      .groupBy(col("cw").as("cohort_week"),
        expr("cast(datediff(ew, cw) as bigint) DIV 7").as("week_n"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "week_n")
  }

  /** Ordered-step event funnel (signup → view → click → purchase) with
    * strict first-occurrence ordering: a user reaches step k when the
    * first times of steps 1..k are all present and non-decreasing —
    * computable from per-type min timestamps alone, so the whole funnel
    * is ONE uniform-key aggregate over one scan (no per-step self-joins,
    * no sequence reconstruction). Reports users reaching each step and
    * the step-over-step conversion rate.
    *
    * Plan/scale: scan → per-user conditional-min agg (uniform key) →
    * 1-row aggregate → constant 4-row union. The canonical shape at any
    * corpus size. */
  def qEventFunnel(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d).groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t1"),
      min(when(col("event_type") === "view", col("ts"))).as("t2"),
      min(when(col("event_type") === "click", col("ts"))).as("t3"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t4"))
    val counts = perUser
      .withColumn("depth", expr(
        """CASE WHEN t1 IS NULL THEN 0
                WHEN t2 IS NULL OR t2 < t1 THEN 1
                WHEN t3 IS NULL OR t3 < t2 THEN 2
                WHEN t4 IS NULL OR t4 < t3 THEN 3
                ELSE 4 END"""))
      .agg(
        sum(when(col("depth") >= 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("depth") >= 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("depth") >= 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("depth") >= 4, 1L).otherwise(0L)).as("n4"))
    // one stack over the single counts row — a union of four selects
    // would re-expand the events lineage once per step
    counts.select(expr(
      """stack(4,
           CAST(1 AS BIGINT), 'signup',   n1, CAST(NULL AS DOUBLE),
           CAST(2 AS BIGINT), 'view',     n2,
             CASE WHEN n1 = 0 THEN CAST(NULL AS DOUBLE) ELSE n2 / n1 END,
           CAST(3 AS BIGINT), 'click',    n3,
             CASE WHEN n2 = 0 THEN CAST(NULL AS DOUBLE) ELSE n3 / n2 END,
           CAST(4 AS BIGINT), 'purchase', n4,
             CASE WHEN n3 = 0 THEN CAST(NULL AS DOUBLE) ELSE n4 / n3 END)
         AS (step, step_name, n_users, conv_rate)"""))
      .orderBy("step")
  }

  /** Last-touch attribution: every purchase's value is credited to the
    * most recent preceding non-purchase event by the same user — the
    * marketing-attribution pass a growth pipeline runs next to the funnel.
    * The carry-forward window is [[qAsofJoin]]'s shape generalized to all
    * touch types; at equal timestamps touches sort before purchases
    * (is_p in the ORDER BY), so a same-instant touch still gets credit; a
    * purchase with no prior touch lands in the 'none' bucket.
    *
    * Plan/scale: one scan, ONE shuffle on (uniform) user_id for the
    * window, then a touch-type-sized aggregate. No per-step self-join —
    * the naive formulation joins purchases against all prior events and
    * re-shuffles per touch type. Value totals go through the exact
    * scaled-integer accumulator. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("touch",
        last(when(col("is_p") === 0, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("attributed_value"))
      .orderBy("touch_type")
  }

  /** Inter-event time histogram: the distribution of gaps between a
    * user's consecutive events, bucketed by power-of-two seconds
    * (bucket k holds gaps in [2^k − 1, 2^{k+1} − 1) via
    * ⌊log₂(gap+1)⌋) — the burstiness fingerprint behind every timeout
    * constant in this file: the 30-minute session gap and the
    * [[qAttrWindow]] lookback are defensible exactly where this
    * histogram shows a valley. Bucket id via length(bin(n)) — the
    * [[DetMath]] power-of-two device, bit-equal cross-engine; share is
    * one division of exact BIGINTs.
    *
    * Plan/scale: ONE user-key lag window (the [[qSessionize]] sort) →
    * ≤40-bucket agg with map-side partials; the share window runs over
    * the bucket relation. */
  def qInterEvent(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_s",
        expr("(unix_micros(ts) - prev_us) DIV 1000000L"))
      .withColumn("bkt",
        expr("CAST(length(bin(gap_s + 1)) - 1 AS INT)"))
      .groupBy("bkt").agg(count(lit(1)).as("n_gaps"))
      .withColumn("gap_lo_s", expr("shiftleft(1L, bkt) - 1L"))
      .withColumn("share",
        col("n_gaps") / sum(col("n_gaps")).over(wAll))
      .select(col("bkt"), col("gap_lo_s"), col("n_gaps"), col("share"))
      .orderBy("bkt")
  }

  /** Attribution lookback window (days) for [[qAttrWindow]]. */
  private val AttrWindowDays = 7

  /** TIME-WINDOWED last-touch attribution — [[qAttribution]] with the
    * industry-standard lookback: a purchase is credited to the most
    * recent prior non-purchase touch only if that touch happened within
    * [[AttrWindowDays]] days; older touches report as 'expired' and
    * purchases with no prior touch at all as 'none' (two distinct
    * buckets — "we never reached them" and "we reached them too long
    * ago" demand different marketing responses). The verdict is a pure
    * integer microsecond comparison — no calendar arithmetic, no float.
    *
    * Plan/scale: [[qAttribution]]'s single carry-forward window (the
    * SAME user-key sort now carries the touch timestamp beside the
    * type — zero extra shuffles) + the touch-type-sized agg. */
  def qAttrWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val winUs = AttrWindowDays * 86400L * 1000000L
    events(s, d)
      .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("touch",
        last(when(col("is_p") === 0, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_us",
        last(when(col("is_p") === 0, unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .withColumn("credited", expr(
        s"""CASE WHEN touch IS NULL THEN 'none'
                 WHEN unix_micros(ts) - touch_us > ${winUs}L THEN 'expired'
                 ELSE touch END"""))
      .groupBy(col("credited").as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("attributed_value"))
      .orderBy("touch_type")
  }

  /** Gaps-and-islands: per-user runs of CONSECUTIVE active calendar days —
    * the engagement-streak report. Calendar grain makes it distinct from
    * [[qSessionize]]'s 30-minute-gap grain. The classic row_number trick:
    * within a user, day_index − row_number is constant across a
    * consecutive run, so islands fall out of a plain groupBy — no
    * iterative chaining, no self-join.
    *
    * Plan/scale: ONE shuffle total, on (uniform) user_id — the explicit
    * repartition satisfies the distinct's (user, day) clustering (a
    * partitioning on a subset of the grouping key co-locates every
    * group), and the window, island agg, and per-user agg all reuse the
    * same distribution; output is one row per user. Without it Spark
    * plans two exchanges (composite-key distinct, then user_id window). */
  def qGapsIslands(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("dayn"))
    events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("dayn"))
      .repartition(col("user_id"))
      .distinct()
      .withColumn("grp", col("dayn") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
      .orderBy("user_id")
  }

  /** Funnel timing: for users progressing through the ordered funnel
    * (signup → view → click → purchase, first-occurrence ordering as in
    * [[qEventFunnel]]), the exact discrete median and p90 of the
    * time-to-convert into each step — the "how long does conversion
    * take" companion to the step-count funnel. Percentiles use the
    * histogram/cumulative-window form (the q_median_disc pattern): exact
    * integers end-to-end, no interpolation, no type-7 float hazards.
    *
    * Plan/scale: one scan → per-user conditional-min agg (uniform key) →
    * 3-row-per-user gap melt → (step, gap) histogram agg → cumulative
    * windows partitioned by step. Everything after the per-user agg is
    * at most 3 rows per converting user; the windows are per-step sorted
    * passes — the documented scale path for exact percentiles. */
  def qFunnelTime(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d).groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t1"),
      min(when(col("event_type") === "view", col("ts"))).as("t2"),
      min(when(col("event_type") === "click", col("ts"))).as("t3"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t4"))
    val gaps = perUser.select(explode(expr(
      """filter(array(
           CASE WHEN t1 IS NOT NULL AND t2 >= t1 THEN
             named_struct('step', '2_view',
                          'gap_us', unix_micros(t2) - unix_micros(t1)) END,
           CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2 THEN
             named_struct('step', '3_click',
                          'gap_us', unix_micros(t3) - unix_micros(t2)) END,
           CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2 AND t4 >= t3 THEN
             named_struct('step', '4_purchase',
                          'gap_us', unix_micros(t4) - unix_micros(t3)) END),
         x -> x IS NOT NULL)""")).as("g"))
      .select(col("g.step").as("step"), col("g.gap_us").as("gap_us"))
    val wCum = Window.partitionBy(col("step")).orderBy(col("gap_us"))
    val wAll = Window.partitionBy(col("step"))
    gaps.groupBy("step", "gap_us").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy("step")
      .agg(
        min(when(expr("cum >= (n + 1) DIV 2"), col("gap_us"))).as("median_gap_us"),
        min(when(expr("cum >= (9 * n + 9) DIV 10"), col("gap_us"))).as("p90_gap_us"),
        max(col("n")).as("n_users"))
      .orderBy("step")
  }

  /** A/B experiment readout: users deterministically hash-split into two
    * arms (user_id parity — the same shape as a serving-time assignment
    * hash), then per arm: exposure, conversion (a HIGH-VALUE purchase,
    * value >= 95 — plain purchase is universal in this corpus, which
    * would degenerate the statistic), exact purchase-value totals, and
    * the conversion lift + pooled two-proportion z statistic
    * against the OTHER arm (sign = this arm minus other, so the two rows
    * carry ±z). All doubles derive from exact BIGINT tallies through
    * expression trees written identically in both engines — division and
    * sqrt are IEEE-deterministic given identical operands, so the readout
    * hash-matches bit-for-bit.
    *
    * Plan/scale: per-user partial agg (uniform key), then a 2-row arm
    * agg; the cross-arm totals are a window over those 2 rows. One
    * user-key shuffle over the data; everything after is constant-size. */
  def qAbTest(s: SparkSession, d: String): DataFrame = {
    val scale = 1000000L
    val perUser = events(s, d).groupBy("user_id").agg(
      sum(when(col("event_type") === "purchase" && col("value") >= 95, 1L)
        .otherwise(0L)).as("np"),
      sum(when(col("event_type") === "purchase",
        round(col("value") * scale).cast("long")).otherwise(0L)).as("vfp"))
    val w = Window.partitionBy()
    perUser
      .groupBy(pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("np") > 0, 1L).otherwise(0L)).as("n_converted"),
        sum(col("vfp")).as("svfp"))
      .withColumn("tu", sum(col("n_users")).over(w))
      .withColumn("tc", sum(col("n_converted")).over(w))
      .select(col("arm"), col("n_users"), col("n_converted"),
        expr("n_converted / n_users").as("conv_rate"),
        expr("cast(svfp as double) / 1.0e6").as("total_value"),
        expr("(cast(svfp as double) / 1.0e6) / n_users").as("value_per_user"),
        expr("n_converted / n_users - (tc - n_converted) / (tu - n_users)")
          .as("lift"),
        // pooled variance is 0 when conversion is universal (tc = tu) or
        // absent (tc = 0) — the z statistic is undefined there, not ±inf
        expr("""CASE WHEN tc = 0 OR tc = tu THEN CAST(NULL AS DOUBLE)
                ELSE (n_converted / n_users - (tc - n_converted) / (tu - n_users)) /
                     sqrt((tc / tu) * (1 - tc / tu)
                          * (1.0 / n_users + 1.0 / (tu - n_users))) END""")
          .as("z_score"))
      .orderBy("arm")
  }

  /** First-order Markov transition matrix over per-user event streams:
    * count of each consecutive (from → to) event-type pair and the
    * row-conditional probability P(to | from) — the session-flow model
    * behind "what do users do after a view".
    *
    * Plan/scale: lead() over the (user_id, ts) window — one shuffle on
    * user_id, the natural distribution key (streams never straddle
    * users) — then a partial-agg count on the (from, to) pair. The
    * transition grid is event-type² = catalog-sized, so the row totals
    * ride a window over that grid, not a second scan of events. */
  def qMarkov(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n") / sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .orderBy("from_type", "to_type")
  }

  /** Hour-of-day SEASONAL volume baseline + outliers — the upgrade of
    * [[ValidationOps.anomaly]] real monitoring needs: traffic has a daily
    * shape, so "is 3 AM volume anomalous" must be judged against OTHER
    * 3 AM cells, not the all-hours mean (which flags every night as an
    * outage and every noon as an incident). Each (type, day, hour) cell
    * is z-scored against the same (type, hour) slot across days, with the
    * same exact-BIGINT verdict device: dev² > 4·varnum compares scaled
    * integers — the 2σ flag can never flip on float rounding; the
    * reported z is the only double and is derived, not compared.
    *
    * Plan/scale: one scan → (type, day, hour) partial agg → ONE
    * (type, hour)-key window serving all three moment sums. Cells are
    * catalog × days × 24 — tiny at any corpus size. */
  def qSeasonal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type", "hour")
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sn", sum(col("n")).over(w))
      .withColumn("sq", sum(col("n") * col("n")).over(w))
      .withColumn("dev", col("k") * col("n") - col("sn"))
      .withColumn("varnum", col("k") * col("sq") - col("sn") * col("sn"))
      .select(col("event_type"), col("hour"), col("day"), col("n"),
        expr("""CASE WHEN varnum = 0 THEN CAST(NULL AS DOUBLE)
                ELSE cast(dev as double) / sqrt(cast(varnum as double)) END""")
          .as("z"),
        (col("dev") * col("dev") > lit(4L) * col("varnum")).as("is_anomaly"))
      .orderBy("event_type", "hour", "day")
  }

  /** Trailing window width (days) for [[qEwma]] — the ONE constant both
    * the frame bound (`rowsBetween(-(EwmaWindowDays - 1), 0)`) and the
    * 2^m exactness arithmetic derive from, in the Spark query AND the
    * DuckDB oracle. The require pins the BIGINT headroom: the Horner
    * numerator is ≤ max-daily-volume × (2^w − 1) and the weight mass is
    * 2^w − 1, so w ≤ 32 keeps both exact for daily volumes up to 2³⁰. */
  private val EwmaWindowDays = 30
  require(EwmaWindowDays >= 1 && EwmaWindowDays <= 32,
    s"EwmaWindowDays = $EwmaWindowDays outruns qEwma's 2^m BIGINT headroom" +
      " (numerator bound max-daily-volume x (2^w - 1) must stay < 2^63)")

  /** Exponentially-weighted daily-volume baseline (EWMA, decay 1/2 per
    * observed day, trailing-[[EwmaWindowDays]] window, renormalized over
    * the observed weights) per event type — the smoothing baseline ops dashboards
    * plot against raw volume, complementing [[qSeasonal]]'s
    * same-hour-slot z-scores: EWMA answers "what does RECENT volume say
    * today should look like", seasonality answers "what does this HOUR
    * usually look like".
    *
    * Oracle-exactness device: with decay exactly 1/2, the weighted
    * numerator over the trailing frame is the INTEGER Horner fold
    * 2·acc + x over the reversed value list (newest gets 2^(m−1)) and
    * the weight mass is 2^m − 1 — all BIGINT, so the reported EWMA is
    * one division of exact integers, bit-identical in both engines.
    * BIGINT headroom: the Horner numerator is bounded by
    * max-daily-volume × (2^[[EwmaWindowDays]] − 1), so with the 30-day
    * window any per-type daily count below ~8·10⁹ is exact — and the
    * frame bound and the 2^m arithmetic are COUPLED through the one
    * [[EwmaWindowDays]] constant (guarded by a require), so widening
    * the window can't silently outrun the headroom.
    *
    * Plan/scale: one scan → (type, day) partial agg (catalog × days
    * rows) → ONE type-key window; the collected frame is ≤
    * [[EwmaWindowDays]] BIGINTs per row, and everything downstream of
    * the scan is catalog-sized. */
  def qEwma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("vals",
        collect_list(col("n")).over(w.rowsBetween(-(EwmaWindowDays - 1), 0)))
      .withColumn("num",
        expr("aggregate(reverse(vals), 0L, (a, x) -> 2L * a + x)"))
      .withColumn("den", expr("shiftleft(1L, size(vals)) - 1L"))
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        (col("num").cast("double") / col("den").cast("double")).as("ewma30"))
      .orderBy("event_type", "day")
  }

  /** Daily unique users as mergeable HLL sketches — the classic
    * 100 TB dashboard cardinality: exact daily distinct users (what
    * `e_dau_wau` computes, and calibrates this against at test scale)
    * needs a user-key shuffle of every event; the sketch collapses each
    * day to 16 registers that merge across any partitioning, across
    * days into weekly/monthly uniques, and across incremental ingest —
    * no re-shuffle of history, ever. Reuses the ONE register device
    * ([[DedupOps.hllRegisters]], same rho extraction, same fixed-order
    * harmonic fold) so the documents-side and events-side sketches can
    * never drift; small days can leave buckets empty, handled as in
    * `d_hll_by_lang` (absent bucket ⇒ 1/2⁰ = 1.0 added per engine).
    *
    * Plan/scale: one scan → (day, bucket) partial agg — map-side
    * combine collapses the data-sized input to days × 16 rows — then a
    * days-sized final agg. Nothing data-sized crosses the wire. */
  def qHllUsersDaily(s: SparkSession, d: String): DataFrame =
    hllUserDayRegisters(events(s, d))
      .groupBy("day")
      .agg(expr(DedupOps.HarmFoldExpr).as("occ"), count(lit(1)).as("n_buckets"))
      .select(col("day"), col("n_buckets"),
        expr(DedupOps.HllEstExpr).as("hll_estimate"))
      .orderBy("day")

  /** The (day, bucket, m) register relation behind [[qHllUsersDaily]]
    * over a raw `(ts, user_id, …)` event relation — batch or streaming
    * micro-batch. ONE definition shared with the streaming monitor
    * ([[graft.streaming.StreamOps.hllUserDayStream]]), exactly as
    * `hllLangRegisters` is for the documents-side sketch, so the stream
    * maintains precisely the registers the batch query computes. */
  private[graft] def hllUserDayRegisters(ev: DataFrame): DataFrame =
    DedupOps.hllRegisters(
      ev.select(to_date(col("ts")).as("day"),
        col("user_id").cast("string").as("tok")),
      Seq("day"))

  /** CUSUM decision threshold in units of the per-type mean daily
    * volume: a level shift flags once the cumulative excursion exceeds
    * CusumH × mean — i.e. the series has drifted by a whole day's
    * average volume [[CusumH]] times over. Integer so the scaled
    * comparison stays exact BIGINT. */
  private val CusumH = 5L

  /** CUSUM changepoint detection over per-type daily volumes — the
    * monitoring-side complement to [[qEwma]]'s smoothing and
    * `e_seasonal`'s pointwise z-score: a POINT anomaly spikes one day
    * and a z-score catches it, but a sustained LEVEL SHIFT (a source
    * silently doubling or halving its feed) moves every day a little —
    * CUSUM accumulates those small deviations until they clear a
    * threshold, which is exactly the drift mode a pointwise test is
    * blind to (Page 1954).
    *
    * Exact-integer device: the textbook recurrence S⁺_d = max(0,
    * S⁺_{d−1} + (n_d − μ)) looks inherently sequential, but
    * max-of-running-min unrolls it: S⁺_d = P_d − min(0, min_{j≤d} P_j)
    * where P is the prefix sum of residuals (and symmetrically S⁻ from
    * the prefix MAX) — two cumulative windows, no recursion. Residuals
    * are scaled by the day count D (r_d = D·n_d − T) so the mean never
    * becomes a rational: every comparison and both excursions are exact
    * BIGINT in both engines, and the decision S > h·μ·D reduces to
    * S_scaled > h·T. The only doubles are the two final readout
    * divisions (one op each, bit-identical cross-engine). Exact while
    * D·T < 2⁶³ per type — e.g. 3 years of daily grain admits ~8·10¹⁵
    * events per type before the ledger could wrap.
    *
    * Zero-volume days are REAL rows: the daily grid is densified over
    * each type's calendar span (a dead feed emits no events — which is
    * exactly the level shift CUSUM must see; without the grid the
    * prefix sum would simply stop advancing and an outage could never
    * fire shift_down). The gap fixture in R10InvariantSpec proves the
    * outage path.
    *
    * Plan/scale: one scan → (type, day) partial agg (map-side combine
    * collapses the data-sized input to catalog × days rows) → a
    * catalog-sized span agg + calendar explode + one uniform
    * (type, day) left join → three type-key windows. Everything past
    * the first agg is catalog × days sized. */
  def qCusum(s: SparkSession, d: String): DataFrame =
    cusumFrom(events(s, d).select(col("event_type"), col("ts")))

  /** Calendar-span ceiling for [[cusumFrom]]'s densified grid, in days
    * (~10 years — generous for any daily-grain changepoint monitor,
    * and tight enough to catch the classic epoch-1970 corruption
    * against current-day data, ~20k days). One corrupt timestamp would
    * otherwise stretch a type's min-to-max span and poison every flag
    * for that type with zero-days — the guard makes corrupt data fail
    * LOUDLY (the same in-plan envelope discipline as `e_gini`), raising
    * the identical message in both engines. */
  private val CusumMaxSpanDays = 3650L

  /** [[qCusum]] over a caller-supplied (event_type, ts) relation — the
    * testable core (the real feed has no calendar gaps, so the outage
    * path is proven on a constructed one). Null timestamps are excluded
    * EXPLICITLY (they have no calendar position, so they cannot sit on
    * the day grid; a feed that ships them should fail `v_constraints`,
    * not skew a changepoint ledger); spans beyond [[CusumMaxSpanDays]]
    * raise rather than densify. */
  /** Shared device: per-type daily volumes DENSIFIED over each type's
    * calendar span (zero-volume days as real rows), with the
    * [[CusumMaxSpanDays]] corrupt-timestamp guard raising the same
    * `tag`-prefixed message both engines emit ([[denseDailyCtes]] is the
    * oracle-side twin — ONE definition per side, shared by every
    * daily-series consumer so the grids cannot drift). Null timestamps
    * are excluded EXPLICITLY (no calendar position; a feed shipping them
    * should fail `v_constraints`, not skew a daily series).
    * Checkpointed: the span agg AND the grid join both read the
    * catalog × days relation — without the checkpoint each branch
    * re-derives it from its own pruned lineage, i.e. TWO full scans
    * of the data-sized input (exchange reuse doesn't apply because
    * column pruning makes the branches structurally different). */
  private[ops] def denseDailyFrom(ev: DataFrame, tag: String): DataFrame =
    denseDailyFromDaily(dailyCountsFrom(ev).localCheckpoint(), tag)

  /** The shared DAILY-COUNT LEDGER: (event_type, day, n) from a raw
    * (event_type, ts) relation — the single relation every daily-series
    * consumer in this family (raw z-score, MAD, STL/CUSUM densify,
    * autocorr, Holt-Winters, …) actually needs from the fact table.
    * Null timestamps KEEP their null-day group here (the raw anomaly
    * tiers historically saw them); calendar consumers drop it in
    * [[denseDailyFromDaily]]. Callers fanning the ledger into more than
    * one consumer MUST `localCheckpoint()` it first (the pairCounts
    * discipline): each consumer's pruned lineage otherwise re-derives
    * the agg from its own full scan of the data-sized input. */
  private[graft] def dailyCountsFrom(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  /** [[denseDailyFrom]] over a pre-built (and, if shared, pre-
    * checkpointed) [[dailyCountsFrom]] ledger. The null-day group (null
    * source timestamps) is dropped here — no calendar position. */
  private[ops] def denseDailyFromDaily(daily0: DataFrame, tag: String): DataFrame = {
    val daily = daily0.filter(col("day").isNotNull)
    val grid = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(expr(s"""CASE WHEN datediff(d1, d0) > $CusumMaxSpanDays
          THEN raise_error(concat('$tag: calendar span ',
            CAST(datediff(d1, d0) AS STRING),
            ' days exceeds $CusumMaxSpanDays — corrupt timestamp?'))
          ELSE sequence(d0, d1, interval 1 day) END""")).as("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Oracle-side twin of [[denseDailyFrom]]: the `daily`/`grid`/`dense`
    * CTE chain with the same guard message. Splice as
    * `WITH ${denseDailyCtes("e_x")}, ...`. */
  private[ops] def denseDailyCtes(tag: String): String = s"""
      daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               count(*)::BIGINT AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      grid AS (
        SELECT event_type,
               unnest(CASE
                 WHEN date_diff('day', min(day), max(day)) > $CusumMaxSpanDays
                 THEN error('$tag: calendar span ' ||
                   date_diff('day', min(day), max(day))::VARCHAR ||
                   ' days exceeds $CusumMaxSpanDays — corrupt timestamp?')
                 ELSE generate_series(min(day), max(day), INTERVAL 1 DAY)
               END)::DATE AS day
        FROM daily GROUP BY 1),
      dense AS (
        SELECT g.event_type, g.day, coalesce(daily.n, 0::BIGINT) AS n
        FROM grid g LEFT JOIN daily
          ON g.event_type = daily.event_type AND g.day = daily.day)"""

  /** Oracle-side twin of [[stlFrom]]: the dense-grid STL chain through a
    * `decomp(event_type, day, n, trend, seasonal, resid)` CTE — ONE
    * definition shared by the `e_stl` and `e_stl_anomaly` oracles (the
    * [[denseDailyCtes]] discipline, one level up). */
  private[ops] def stlCtes(tag: String): String = s"""
      ${denseDailyCtes(tag)},
      stl_t AS (
        SELECT event_type, day, n,
               sum(n) OVER w7 AS sum7, count(*) OVER w7 AS cnt7,
               isodow(day) AS wd
        FROM dense
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      stl_t2 AS (
        SELECT *, CASE WHEN cnt7 = 7 THEN 7 * n - sum7 END AS det7
        FROM stl_t),
      stl_t3 AS (
        SELECT *, sum(det7) OVER wd7 AS ssum, count(det7) OVER wd7 AS scnt
        FROM stl_t2
        WINDOW wd7 AS (PARTITION BY event_type, wd)),
      decomp AS (
        SELECT event_type, day, n,
               CASE WHEN cnt7 = 7
                 THEN CAST(sum7 AS DOUBLE) / CAST(7 AS DOUBLE) END AS trend,
               CAST(ssum AS DOUBLE) / CAST(7 * scnt AS DOUBLE) AS seasonal,
               (CAST(n AS DOUBLE)
                 - (CASE WHEN cnt7 = 7
                      THEN CAST(sum7 AS DOUBLE) / CAST(7 AS DOUBLE) END))
                - (CAST(ssum AS DOUBLE) / CAST(7 * scnt AS DOUBLE)) AS resid
        FROM stl_t3)"""

  private[ops] def cusumFrom(ev: DataFrame): DataFrame = {
    val wAll = Window.partitionBy("event_type")
    val wPre = Window.partitionBy("event_type").orderBy("day")
    denseDailyFrom(ev, "e_cusum")
      .withColumn("dcnt", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("p", sum(col("dcnt") * col("n") - col("tot")).over(wPre))
      .withColumn("pmin", min(least(col("p"), lit(0L))).over(wPre))
      .withColumn("pmax", max(greatest(col("p"), lit(0L))).over(wPre))
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        ((col("p") - col("pmin")).cast("double") / col("dcnt").cast("double"))
          .as("cusum_pos"),
        ((col("pmax") - col("p")).cast("double") / col("dcnt").cast("double"))
          .as("cusum_neg"),
        (col("p") - col("pmin") > lit(CusumH) * col("tot")).as("shift_up"),
        (col("pmax") - col("p") > lit(CusumH) * col("tot")).as("shift_down"))
      .orderBy("event_type", "day")
  }

  /** Deepest ACF lag [[qAutocorr]] reports (a week of daily grain —
    * enough to read both day-over-day persistence and the weekly
    * seasonal echo at lag 7). */
  private val AutocorrMaxLag = 7

  /** Daily-volume autocorrelation function per event type, lags
    * 1..[[AutocorrMaxLag]] — the seasonality detector that tells a
    * baseline model ([[qEwma]] vs [[qHolt]] vs [[qSeasonal]]'s
    * hour-of-day slots) what structure the series actually has: high
    * r₁ means momentum (EWMA-friendly), a lag-7 spike means weekly
    * seasonality (the same-weekday baseline is the right comparator),
    * all-near-zero means white noise (alerting on level is futile).
    * Computed over the [[denseDailyFrom]] densified grid — a dead-feed
    * gap is REAL zero-volume days, which is exactly the autocorrelation
    * a monitor must see, and the same corrupt-timestamp span guard
    * applies.
    *
    * Oracle-exactness device: centering by the rational mean S/D is
    * cleared by scaling residuals to r_d = D·n_d − S (the [[qCusum]]
    * ledger), so every product and both sums are exact BIGINT and
    * acf_k = Σ r_d·r_{d−k} / Σ r_d² is ONE division of exact integers
    * (int64→double conversion and IEEE division are bit-identical
    * cross-engine even past 2⁵³, the e_gini precedent). Envelope:
    * exact while 4·D³·max_n² < 2⁶³ — enforced IN-PLAN with the same
    * both-engines-raise discipline as `e_gini` (a double-arithmetic
    * guard with a 2⁶¹ margin, so the check itself cannot overflow); at
    * the 3650-day span ceiling that admits ~6.8k events/day/type, and
    * a tighter span buys quadratic headroom. A type with fewer than
    * k+1 observed days reports acf NULL at lag k (sum over an empty
    * product set) in both engines; a constant series (den = 0) reads
    * NULL in both — DuckDB defines x/0 over doubles as NULL (not NaN),
    * and Spark-side `try_divide` mirrors that exactly (ANSI `/` would
    * instead raise DIVIDE_BY_ZERO; den = 0 forces num ∈ {0, NULL}, so
    * no information is lost).
    *
    * Plan/scale: the [[qCusum]] shape — one scan → (type, day) partial
    * agg → catalog-sized span explode + one uniform (type, day) join →
    * one type-key window pass carrying all 7 lags → a catalog×7-sized
    * melt + agg. Nothing data-sized past the first agg. */
  def qAutocorr(s: SparkSession, d: String): DataFrame =
    autocorrFrom(events(s, d).select(col("event_type"), col("ts")))

  /** STL-style seasonal decomposition of the daily volume series per
    * event type: n = trend + seasonal + residual, with trend the
    * centered 7-day moving average, seasonal the per-weekday mean of
    * the detrended series, residual the remainder — the decomposition
    * an alerting stack runs so a Sunday dip stops paging and a
    * trend-adjusted Tuesday spike still does ([[qSeasonal]] slots
    * hour-of-day; this is the day-grain complement with an explicit
    * trend term). Rides [[denseDailyFrom]], and MUST: the ±3-row
    * window frame equals the ±3-DAY calendar frame only because the
    * grid is dense — on raw (type, day) aggregates a gap would silently
    * shrink the moving average.
    *
    * Exactness: the trend is sum₇/7 — ONE division of exact BIGINTs
    * per row (NULL at series edges where the centered window is
    * partial); the detrended series is kept as the INTEGER 7·n − sum₇,
    * so the per-weekday seasonal mean is Σdet/(7·m) — again one
    * division of exact integers; the residual is the fixed chain
    * (n − trend) − seasonal over those bit-identical doubles. No
    * accumulation of doubles anywhere.
    *
    * Plan/scale: one scan → (type, day) partial agg → catalog-sized
    * densify → one type-key ordered window (trend) + one
    * (type, weekday)-key window (seasonal) — both partitioned,
    * catalog×days-sized. */
  def qStl(s: SparkSession, d: String): DataFrame =
    stlFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qStl]] over a caller-supplied (event_type, ts) relation — the
    * testable core (a constant series must decompose to zero seasonal
    * and residual; additivity n = trend + seasonal + resid must hold
    * exactly in doubles on every fully-defined row). */
  private[ops] def stlFrom(ev: DataFrame): DataFrame =
    stlFromDaily(dailyCountsFrom(ev).localCheckpoint())

  /** [[stlFrom]] over a pre-built [[dailyCountsFrom]] ledger — the
    * shared-ledger entry point ([[qAnomalyVotes]] feeds all three tiers
    * from ONE checkpointed ledger through cores like this one). */
  private[ops] def stlFromDaily(daily: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val wWd = Window.partitionBy("event_type", "wd")
    denseDailyFromDaily(daily, "e_stl")
      .withColumn("sum7", sum(col("n")).over(wOrd))
      .withColumn("cnt7", count(lit(1)).over(wOrd))
      // full centered window only — edges read NULL, not a biased mean
      .withColumn("det7", when(col("cnt7") === 7, lit(7L) * col("n") - col("sum7")))
      .withColumn("wd", expr("weekday(day) + 1"))
      .withColumn("ssum", sum(col("det7")).over(wWd))
      .withColumn("scnt", count(col("det7")).over(wWd))
      .select(col("event_type"), col("day"), col("n"),
        when(col("cnt7") === 7,
          col("sum7").cast("double") / lit(7.0d)).as("trend"),
        expr("try_divide(CAST(ssum AS DOUBLE), CAST(7 * scnt AS DOUBLE))")
          .as("seasonal"),
        expr("""(CAST(n AS DOUBLE)
                 - (CASE WHEN cnt7 = 7 THEN CAST(sum7 AS DOUBLE) / CAST(7 AS DOUBLE) END))
                - try_divide(CAST(ssum AS DOUBLE), CAST(7 * scnt AS DOUBLE))""")
          .as("resid"))
      .orderBy("event_type", "day")
  }

  /** 3-sigma outlier days on the [[qStl]] RESIDUALS — the alerting
    * ladder's deseasonalized tier: [[ValidationOps]]' `v_anomaly` reads
    * raw daily volumes (a quiet Sunday looks like an incident),
    * `v_mad_anomaly` robustifies against heavy tails, and this one
    * removes trend AND weekly seasonality first, so the verdict fires
    * on what is actually unexplained. Flags |resid − μ| > 3σ per type,
    * edges (no full centered window) read NULL in both engines.
    *
    * Exactness: residuals are bit-identical doubles ([[stlFrom]]), so
    * quantizing to 1e-6 micro-units (`round` — half-away-from-zero in
    * both engines) gives identical BIGINTs; the verdict is then pure
    * 128-bit integer arithmetic — dev² > 9·(D·Σq² − S²) with dev =
    * D·q − S — via DECIMAL(38) on the Spark side and HUGEINT in
    * DuckDB, never a float compare. The in-plan envelope guard
    * (D³·max_n²·10¹² ≤ 10³⁷, double-checked with margin so the check
    * itself cannot wrap) raises the same message in both engines
    * before either ledger could overflow; only the BOOLEAN verdict and
    * the DOUBLE resid cross the gate boundary (the decimal/int128
    * hashing trap from r10 never arises).
    *
    * Plan/scale: [[qStl]]'s shape + one more type-key window pass over
    * the catalog×days relation. */
  /** Anomaly-ensemble VOTE — the alerting ladder's three tiers joined
    * into one pageable worklist: raw 2σ ([[ValidationOps.anomaly]]),
    * robust median/3·MAD ([[ValidationOps.madAnomaly]]), and
    * deseasonalized STL-residual 3σ ([[qStlAnomaly]]) verdicts per
    * (event_type, day), emitting only days at least one tier flagged,
    * with the vote count. This is the page-vs-ticket routing input
    * every on-call rotation actually wants: 3/3 votes is a real
    * incident, a raw-only flag on a Sunday is the calendar, an
    * STL-only flag is a trend break the raw tiers can't see. A NULL
    * tier flag means that tier HAD NO ROW for the day (the raw tiers
    * see only observed days; STL sees the densified grid) —
    * deliberately distinct from FALSE ("evaluated, not anomalous").
    *
    * Exactness: pure boolean/int composition of three already-exact
    * verdicts; join keys are (string, date). Spark's Seq-key full outer
    * coalesces the keys by definition; the oracle spells the same
    * COALESCE out explicitly rather than trusting USING-in-FULL-JOIN
    * dialect behavior.
    *
    * Plan/scale: ONE scan — the shared [[dailyCountsFrom]] ledger is
    * materialized once (`localCheckpoint`) and all three tiers run as
    * `*FromDaily` cores over it (the pairCounts materialize-once
    * discipline applied to the events family). Everything past the
    * ledger is catalog×days-sized, so the ensemble costs exactly one
    * pass over the fact table — at 100 TB the 3× I/O multiplier the
    * naive three-entry-point form pays is gone. */
  def qAnomalyVotes(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCountsFrom(
      events(s, d).select(col("event_type"), col("ts"))).localCheckpoint()
    val raw = ValidationOps.anomalyFromDaily(daily)
      .select(col("event_type"), col("day"), col("is_anomaly").as("flag_raw"))
    val rob = ValidationOps.madAnomalyFromDaily(daily)
      .select(col("event_type"), col("day"),
        col("is_outlier").as("flag_robust"))
    val stl = stlAnomalyFromDaily(daily)
      .select(col("event_type"), col("day"), col("is_anomaly").as("flag_stl"))
    raw.join(rob, Seq("event_type", "day"), "full_outer")
      .join(stl, Seq("event_type", "day"), "full_outer")
      .filter(coalesce(col("flag_raw"), lit(false)) ||
        coalesce(col("flag_robust"), lit(false)) ||
        coalesce(col("flag_stl"), lit(false)))
      .select(col("event_type"), col("day"), col("flag_raw"),
        col("flag_robust"), col("flag_stl"),
        expr("""CAST((CASE WHEN flag_raw THEN 1 ELSE 0 END)
          + (CASE WHEN flag_robust THEN 1 ELSE 0 END)
          + (CASE WHEN flag_stl THEN 1 ELSE 0 END) AS BIGINT)""")
          .as("n_votes"))
      .orderBy("event_type", "day")
  }

  def qStlAnomaly(s: SparkSession, d: String): DataFrame =
    stlAnomalyFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qStlAnomaly]] over a caller-supplied (event_type, ts) relation. */
  private[ops] def stlAnomalyFrom(ev: DataFrame): DataFrame =
    stlAnomalyFromDaily(dailyCountsFrom(ev).localCheckpoint())

  /** [[qStlAnomaly]] over a pre-built [[dailyCountsFrom]] ledger. */
  private[ops] def stlAnomalyFromDaily(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
    stlFromDaily(daily)
      .withColumn("maxn", max(col("n")).over(w))
      // count(resid), not count(q): the guard must not depend on its
      // own output (q is null exactly where resid is, so same count)
      .withColumn("dres", count(col("resid")).over(w))
      // guard folded INTO the load-bearing q (the e_autocorr device —
      // a standalone guard column is dead code the optimizer prunes,
      // and a pruned raise_error never fires; found by the spec)
      .withColumn("q", expr("""CASE WHEN
          CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE)
            * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE) * 1.0e12 > 1.0e37
        THEN raise_error('e_stl_anomaly: residual ledger exceeds the 128-bit envelope (D^3*max_n^2*1e12 > 1e37) — shorten the span or shard the type')
        ELSE CAST(round(resid * 1000000D) AS BIGINT) END"""))
      .withColumn("s", sum(col("q")).over(w))
      .withColumn("q2", sum(expr("CAST(q AS DECIMAL(38,0)) * q")).over(w))
      .withColumn("dev", expr("CAST(dres AS DECIMAL(38,0)) * q - s"))
      .select(col("event_type"), col("day"), col("n"), col("resid"),
        expr("""(dev * dev) >
            9 * (CAST(dres AS DECIMAL(38,0)) * q2 - CAST(s AS DECIMAL(38,0)) * s)""")
          .as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Strength of SEASONALITY and TREND per event type — the one-number
    * readout of the [[qStl]] decomposition (Hyndman's F_S / F_T):
    * F_S = max(0, 1 − Var(resid)/Var(detrended)) says how much of the
    * detrended variation the weekly season explains, F_T the same
    * against the deseasonalized series. This is the dial that routes a
    * type through the forecasting ladder mechanically: F_S ≈ 0 → Holt
    * (the seasonal state is noise, [[qBacktestHw]] will agree),
    * F_S high → Holt–Winters; F_T ≈ 0 besides → EWMA is enough.
    *
    * Exactness ([[stlAnomalyFrom]]'s ledger): resid, n − trend and
    * n − seasonal are bit-identical doubles from the shared [[stlFrom]],
    * quantized to 1e-6 micro-units; each variance numerator D·Σq² − S²
    * is exact 128-bit integer arithmetic (DECIMAL(38) / HUGEINT), and
    * each strength is ONE double division + an explicit CASE clamp
    * (never `greatest(0, NULL)` — both engines' greatest SKIPS nulls,
    * which would turn an undefined ratio into a hard 0). A
    * zero-variance denominator (constant series) reads NULL strength in
    * both engines via try_divide semantics. The envelope guard is the
    * e_stl_anomaly device one D stricter (D⁴·max_n²·10¹² ≤ 10³⁷ — the
    * D·Σq² products add one factor), folded into the load-bearing
    * column so the optimizer cannot prune the raise.
    *
    * Plan/scale: [[qStl]]'s shape + ONE catalog-sized type-key agg. */
  def qSeasonalStrength(s: SparkSession, d: String): DataFrame =
    seasonalStrengthFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qSeasonalStrength]] over a caller-supplied (event_type, ts)
    * relation — the testable core (a pure weekly square wave reads
    * F_S ≈ 1; white noise reads both low; a constant series reads
    * NULL). */
  private[ops] def seasonalStrengthFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
    val base = stlFrom(ev).filter(col("resid").isNotNull)
      .withColumn("maxn", max(col("n")).over(w))
      .withColumn("dres", count(lit(1)).over(w))
      .withColumn("qr", expr("""CASE WHEN
          CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE)
            * CAST(dres AS DOUBLE)
            * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE) * 1.0e12 > 1.0e37
        THEN raise_error('e_seasonal_strength: variance ledger exceeds the 128-bit envelope (D^4*max_n^2*1e12 > 1e37) — shorten the span or shard the type')
        ELSE CAST(round(resid * 1000000D) AS BIGINT) END"""))
      .withColumn("qd",
        expr("CAST(round((CAST(n AS DOUBLE) - trend) * 1000000D) AS BIGINT)"))
      .withColumn("qs",
        expr("CAST(round((CAST(n AS DOUBLE) - seasonal) * 1000000D) AS BIGINT)"))
    base.groupBy("event_type")
      .agg(count(lit(1)).as("nd"),
        sum(col("qr")).as("sr"),
        sum(expr("CAST(qr AS DECIMAL(38,0)) * qr")).as("r2"),
        sum(col("qd")).as("sd"),
        sum(expr("CAST(qd AS DECIMAL(38,0)) * qd")).as("d2"),
        sum(col("qs")).as("ss"),
        sum(expr("CAST(qs AS DECIMAL(38,0)) * qs")).as("s2"))
      .select(col("event_type"), col("nd").as("n_days"),
        expr("""CASE
            WHEN try_divide(
              CAST(nd * r2 - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE),
              CAST(nd * d2 - CAST(sd AS DECIMAL(38,0)) * sd AS DOUBLE))
              IS NULL THEN CAST(NULL AS DOUBLE)
            WHEN 1.0D - try_divide(
              CAST(nd * r2 - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE),
              CAST(nd * d2 - CAST(sd AS DECIMAL(38,0)) * sd AS DOUBLE))
              < 0.0D THEN 0.0D
            ELSE 1.0D - try_divide(
              CAST(nd * r2 - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE),
              CAST(nd * d2 - CAST(sd AS DECIMAL(38,0)) * sd AS DOUBLE))
            END""").as("strength_seasonal"),
        expr("""CASE
            WHEN try_divide(
              CAST(nd * r2 - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE),
              CAST(nd * s2 - CAST(ss AS DECIMAL(38,0)) * ss AS DOUBLE))
              IS NULL THEN CAST(NULL AS DOUBLE)
            WHEN 1.0D - try_divide(
              CAST(nd * r2 - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE),
              CAST(nd * s2 - CAST(ss AS DECIMAL(38,0)) * ss AS DOUBLE))
              < 0.0D THEN 0.0D
            ELSE 1.0D - try_divide(
              CAST(nd * r2 - CAST(sr AS DECIMAL(38,0)) * sr AS DOUBLE),
              CAST(nd * s2 - CAST(ss AS DECIMAL(38,0)) * ss AS DOUBLE))
            END""").as("strength_trend"))
      .orderBy("event_type")
  }

  /** Weekday-vs-weekend volume lift per event type — the calendar-bias
    * readout a training-data snapshot ships with: a type whose weekend
    * volume runs at 2× (or ⅕×) its weekday rate will be over/under-
    * represented in any time-boxed crawl, and the sampler needs the
    * ratio to correct for it. Computed over the [[denseDailyFrom]]
    * densified grid (a dead weekend is REAL zero-volume days — exactly
    * what the ratio must see), weekend = ISO day-of-week ≥ 6 (Spark's
    * `weekday()+1` == DuckDB's `isodow`, both Monday=1). The lift is
    * (weekend mean)/(weekday mean) = we_n·wd_days / (wd_n·we_days) —
    * cross-multiplied so it is ONE division of exact BIGINT products;
    * a type with zero weekday volume reads NULL lift in both engines
    * (try_divide == DuckDB's x/0).
    *
    * Plan/scale: the [[qCusum]] shape — one scan → (type, day) partial
    * agg → catalog-sized densify → ONE catalog-sized conditional agg.
    * Nothing data-sized past the first agg. */
  def qWeekdayLift(s: SparkSession, d: String): DataFrame =
    denseDailyFrom(events(s, d).select(col("event_type"), col("ts")),
        "e_weekday_lift")
      .withColumn("is_we", expr("weekday(day) + 1 >= 6"))
      .groupBy("event_type")
      .agg(
        sum(when(!col("is_we"), 1L).otherwise(0L)).as("weekday_days"),
        sum(when(!col("is_we"), col("n")).otherwise(0L)).as("weekday_n"),
        sum(when(col("is_we"), 1L).otherwise(0L)).as("weekend_days"),
        sum(when(col("is_we"), col("n")).otherwise(0L)).as("weekend_n"))
      .withColumn("weekend_lift", expr(
        """try_divide(CAST(weekend_n * weekday_days AS DOUBLE),
                      CAST(weekday_n * weekend_days AS DOUBLE))"""))
      .orderBy("event_type")

  /** Difference-in-differences on daily event volume: for every event
    * type, the change in MEAN DAILY count from the pre-period to the
    * post-period, minus the same change in the REST of the catalog (the
    * control) — the launch/incident attribution readout that separates
    * "purchases rose after the change" from "everything rose after the
    * change". The period split is the calendar midpoint of the observed
    * span (the [[ValidationOps.ksHalves]] device, global so every type
    * shares one intervention date); means are count/window-days so
    * zero-volume days weigh in without a densify.
    *
    * Exactness: counts, day arithmetic and window lengths are pure
    * BIGINTs; the midpoint is floor((lo+hi)/2) computed through an
    * exact double (floor-consistent in both engines, where BIGINT DIV
    * truncates toward zero in Spark but floors in DuckDB on negatives);
    * the four means are single IEEE divisions of exact integers and the
    * two subtractions are fixed-order — bit-identical both engines.
    * try_divide ≡ DuckDB x/0 on a degenerate single-day span.
    *
    * Plan/scale: rides the shared [[dailyCountsFrom]] ledger (ONE
    * fact-table scan + one uniform (type, day) agg); everything after
    * is windows and an agg over the catalog × days relation, then a
    * catalog-sized window. Nothing data-sized past the ledger. */
  def qDid(s: SparkSession, d: String): DataFrame =
    didFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qDid]] over a caller-supplied (event_type, ts) relation — the
    * testable core (a planted post-period lift on one type reads the
    * hand-computed DiD; a uniform lift on every type reads DiD 0). */
  private[ops] def didFrom(ev: DataFrame): DataFrame =
    didFromDaily(dailyCountsFrom(ev))

  /** [[qDid]] over a pre-built (event_type, day, n) ledger — the
    * live-serving form: point it at the
    * [[graft.streaming.StreamOps.dailyCountStream]] state table and the
    * DiD readout runs off the streamed ledger (spec-proven equal to the
    * batch query over the same rows). */
  private[graft] def didFromDaily(daily0: DataFrame): DataFrame = {
    val w = Window.partitionBy(lit(1))
    val daily = daily0.filter(col("day").isNotNull)
      .select(col("event_type"),
        expr("datediff(day, DATE '1970-01-01')").as("dn"), col("n"))
      .withColumn("lo", min(col("dn")).over(w))
      .withColumn("hi", max(col("dn")).over(w))
      .withColumn("mid",
        expr("CAST(floor((lo + hi) / 2.0e0) AS BIGINT)"))
    val perType = daily.groupBy("event_type")
      .agg(
        sum(when(col("dn") <= col("mid"), col("n")).otherwise(0L))
          .as("n_pre"),
        sum(when(col("dn") > col("mid"), col("n")).otherwise(0L))
          .as("n_post"),
        max(col("mid") - col("lo") + lit(1L)).as("pre_days"),
        max(col("hi") - col("mid")).as("post_days"))
    perType
      .withColumn("tot_pre", sum(col("n_pre")).over(w))
      .withColumn("tot_post", sum(col("n_post")).over(w))
      .select(col("event_type"), col("n_pre"), col("n_post"),
        expr("""try_divide(CAST(n_post AS DOUBLE), CAST(post_days AS DOUBLE))
          - try_divide(CAST(n_pre AS DOUBLE), CAST(pre_days AS DOUBLE))""")
          .as("own_delta"),
        expr("""try_divide(CAST(tot_post - n_post AS DOUBLE), CAST(post_days AS DOUBLE))
          - try_divide(CAST(tot_pre - n_pre AS DOUBLE), CAST(pre_days AS DOUBLE))""")
          .as("ctrl_delta"))
      .withColumn("did", expr("own_delta - ctrl_delta"))
      .orderBy("event_type")
  }

  /** [[qAutocorr]] over a caller-supplied (event_type, ts) relation —
    * the testable core (the gate feed has no deep gaps or overflow
    * regimes, so those paths are proven on constructed series). */
  private[ops] def autocorrFrom(ev: DataFrame): DataFrame = {
    val wAll = Window.partitionBy("event_type")
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val base = denseDailyFrom(ev, "e_autocorr")
      .withColumn("dcnt", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("maxn", max(col("n")).over(wAll))
      // envelope guard BEFORE any product: double arithmetic with a 2^61
      // margin so the guard itself cannot wrap; identical verdict and
      // message in both engines
      .withColumn("r", expr(s"""CASE WHEN
          4.0D * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE)
            * CAST(dcnt AS DOUBLE) * CAST(dcnt AS DOUBLE)
            * CAST(dcnt AS DOUBLE) > POW(2.0D, 61.0D)
        THEN raise_error('e_autocorr: residual ledger exceeds BIGINT envelope (4*D^3*max_n^2 > 2^61) — shorten the span or shard the type')
        ELSE dcnt * n - tot END"""))
    val lagged = (1 to AutocorrMaxLag).foldLeft(base) { (df, k) =>
      df.withColumn(s"l$k", lag(col("r"), k).over(wOrd))
    }
    val stackExpr = (1 to AutocorrMaxLag)
      .map(k => s"$k, r * l$k").mkString(s"stack($AutocorrMaxLag, ", ", ", ")")
    val nums = lagged
      .select(col("event_type"), expr(s"$stackExpr AS (lag, prod)"))
      .groupBy("event_type", "lag")
      .agg(sum(col("prod")).as("num"))
    val stats = base.groupBy("event_type")
      .agg(sum(col("r") * col("r")).as("den"), count(lit(1)).as("n_days"))
    nums.join(broadcast(stats), "event_type")
      // try_divide, not `/`: ANSI-mode Divide raises DIVIDE_BY_ZERO even
      // for doubles, while DuckDB defines x/0 as NULL — try_divide is the
      // Spark spelling of DuckDB's native semantics (den = 0 can only
      // pair with num ∈ {0, NULL}, so NULL is the whole zero-den story)
      .select(col("event_type"), col("lag"), col("n_days"),
        expr("try_divide(CAST(num AS DOUBLE), CAST(den AS DOUBLE))")
          .as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Cross-type LAG correlation — [[qAutocorr]]'s device turned across
    * series: for every event-type pair (a < b) and lag ∈ [−3, 3] days,
    * the correlation of a's daily-volume residuals with b's residuals
    * `lag` days later. This is the pipeline-dependency readout the
    * per-type ladder can't see: clicks trailing views at lag 1 with
    * ρ ≈ 0.8 says the types share a driver one day apart (an alert on
    * one should suppress the other; a forecast of one is a feature for
    * the other), while flat ρ across all lags says the feeds are
    * independent and their anomaly budgets should be too.
    *
    * Exactness: residuals are the SAME r_d = D·n_d − S exact-BIGINT
    * CUSUM ledger as e_autocorr (with the same 4·D³·max_n² < 2⁶¹
    * envelope folded into the load-bearing column, e_xcorr-tagged), so
    * every numerator Σ r_a·r_b is an exact BIGINT; the normalizer
    * √(Σr_a²·Σr_b²) is one sqrt over a product of exact BIGINTs cast to
    * double, and the division is try_divide (DuckDB's x/0 = NULL).
    * Numerators sum over the lag-OVERLAPPED days; denominators over
    * each full series — the convention that keeps |ρ| ≤ 1 bounded by
    * construction at every lag.
    *
    * Plan/scale: one scan → dense grid → residual relation
    * checkpointed ONCE for its three readers (a-side, b-side, per-type
    * denominators) → a 7-way lag melt + one (day+lag)-key join on the
    * catalog×days-sized residual relation → catalog²-sized agg. Nothing
    * data-sized beyond the one events scan. */
  def qXcorr(s: SparkSession, d: String): DataFrame =
    xcorrFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qXcorr]] over a caller-supplied (event_type, ts) relation — the
    * testable core (a shifted-copy pair must read ρ ≡ 1 at exactly its
    * shift lag; independent constants read NULL). */
  private[ops] def xcorrFrom(ev: DataFrame): DataFrame = {
    val wAll = Window.partitionBy("event_type")
    val base = denseDailyFrom(ev, "e_xcorr")
      .withColumn("dcnt", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("maxn", max(col("n")).over(wAll))
      .withColumn("r", expr(s"""CASE WHEN
          4.0D * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE)
            * CAST(dcnt AS DOUBLE) * CAST(dcnt AS DOUBLE)
            * CAST(dcnt AS DOUBLE) > POW(2.0D, 61.0D)
        THEN raise_error('e_xcorr: residual ledger exceeds BIGINT envelope (4*D^3*max_n^2 > 2^61) — shorten the span or shard the type')
        ELSE dcnt * n - tot END"""))
      .select(col("event_type"), col("day"), col("r"))
      // three readers (a-side, b-side, denominators) — materialize once
      .localCheckpoint()
    val den = base.groupBy("event_type")
      .agg(sum(col("r") * col("r")).as("den2"))
    val a = base
      .select(col("event_type").as("type_a"), col("day"), col("r").as("ra"))
      .withColumn("lag", explode(expr("sequence(-3, 3)")))
    val b = base
      .select(col("event_type").as("type_b"), col("day").as("day_b"),
        col("r").as("rb"))
    a.join(b, expr("day_b = date_add(day, lag) AND type_a < type_b"))
      .groupBy("type_a", "type_b", "lag")
      .agg(count(lit(1)).as("n_overlap"), sum(col("ra") * col("rb")).as("num"))
      .join(broadcast(den.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("den2", "den_a")), Seq("type_a"))
      .join(broadcast(den.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("den2", "den_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("lag"), col("n_overlap"),
        expr("""try_divide(CAST(num AS DOUBLE),
            sqrt(CAST(den_a AS DOUBLE) * CAST(den_b AS DOUBLE)))""")
          .as("xcorr"))
      .orderBy("type_a", "type_b", "lag")
  }

  /** Trailing window width (days) for [[qHolt]]. Coefficients grow as
    * 4^(w−1), so the require below pins the BIGINT headroom through the
    * actual generated table rather than a formula that could drift. */
  private val HoltWindowDays = 14

  /** Integer coefficient table for [[qHolt]]: for window length m
    * (1-based index m−1), the BIGINT coefficients of each window value
    * y_i in the 4^(m−1)-scaled level L_m and trend B_m. Generated by
    * running the Holt recurrence once per unit input — the SAME table is
    * emitted into the Spark expression and the DuckDB oracle, so the two
    * engines cannot disagree on a weight. */
  private val HoltCoefs: Vector[(Vector[Long], Vector[Long])] =
    (1 to HoltWindowDays).map { m =>
      var L = Array.tabulate(m)(i => if (i == 0) 1L else 0L)
      var B = Array.fill(m)(0L)
      for (t <- 2 to m) {
        val nL = Array.tabulate(m)(i => 2 * L(i) + 2 * B(i))
        val nB = Array.tabulate(m)(i => -L(i) + 3 * B(i))
        nL(t - 1) += 1L << (2 * t - 3)
        nB(t - 1) += 1L << (2 * t - 4)
        L = nL; B = nB
      }
      (L.toVector, B.toVector)
    }.toVector
  require(HoltCoefs.forall { case (l, b) =>
    l.map(math.abs).sum + b.map(math.abs).sum < (1L << 33) },
    "Holt coefficient mass outruns BIGINT headroom for 2^30 daily volumes")

  // ---- Holt–Winters (additive, weekly season) coefficient machinery ----

  /** Trailing window for [[qHoltWinters]] — two full seasons. The
    * coefficient scale grows as 2^(2(w−1)) worst case; at w = 14 the
    * generated table's ℓ1 mass (require below) leaves headroom for
    * daily volumes to 2^22 per type — plenty for one type-day, and the
    * envelope is pinned through the ACTUAL table, not a formula. */
  private val HwWindowDays = 14
  private val HwSeason = 7

  /** Exact dyadic rational num / 2^k — the Holt–Winters recurrence only
    * ever adds and halves, so every intermediate is exactly
    * representable and the final coefficients are exact integers over
    * one power-of-two denominator per window length. */
  private case class Dy(num: BigInt, k: Int) {
    def norm: Dy =
      if (num == 0) Dy(BigInt(0), 0)
      else { var n = num; var kk = k
        while (kk > 0 && !n.testBit(0)) { n >>= 1; kk -= 1 }
        Dy(n, kk) }
  }
  private def dyAdd(a: Dy, b: Dy): Dy = {
    val k = a.k max b.k
    Dy((a.num << (k - a.k)) + (b.num << (k - b.k)), k).norm
  }
  private val DyZero = Dy(BigInt(0), 0)
  private def vAdd(a: Vector[Dy], b: Vector[Dy]): Vector[Dy] =
    a.zip(b).map { case (x, y) => dyAdd(x, y) }
  private def vNeg(a: Vector[Dy]): Vector[Dy] = a.map(d => Dy(-d.num, d.k))
  private def vHalf(a: Vector[Dy]): Vector[Dy] =
    a.map(d => Dy(d.num, d.k + 1).norm)

  /** Per window length m: 2^k-scaled integer coefficient vectors of the
    * window values for the LEVEL, TREND, and one-step FORECAST
    * l + b + s(next slot) of additive Holt–Winters with α = β = γ = ½,
    * season [[HwSeason]], init l₁ = y₁, b₁ = 0, s = 0. Generated ONCE
    * by running the recurrence symbolically in exact dyadic arithmetic
    * — the SAME table is emitted into the Spark expression and the
    * DuckDB oracle (the [[HoltCoefs]] device, extended to the seasonal
    * state). */
  private val HwCoefs: Vector[(Vector[Long], Vector[Long], Vector[Long], Int)] =
    (1 to HwWindowDays).map { m =>
      val zero = Vector.fill(m)(DyZero)
      def unit(i: Int) = Vector.tabulate(m)(j =>
        if (j == i) Dy(BigInt(1), 0) else DyZero)
      var l = unit(0)
      var b = zero
      var s = Vector.fill(m)(zero) // s(t) at index t−1; s₁ = ½(y₁−l₁) = 0
      for (t <- 2 to m) {
        val sPrev = if (t - HwSeason >= 1) s(t - HwSeason - 1) else zero
        val y = unit(t - 1)
        val lNew = vHalf(vAdd(vAdd(y, vNeg(sPrev)), vAdd(l, b)))
        val bNew = vHalf(vAdd(vAdd(lNew, vNeg(l)), b))
        val sNew = vHalf(vAdd(vAdd(y, vNeg(lNew)), sPrev))
        l = lNew; b = bNew; s = s.updated(t - 1, sNew)
      }
      val sNext = if (m + 1 - HwSeason >= 1) s(m + 1 - HwSeason - 1) else zero
      val f = vAdd(vAdd(l, b), sNext)
      val k = (l ++ b ++ f).map(_.k).max
      def emit(v: Vector[Dy]): Vector[Long] = v.map { d =>
        val n = d.num << (k - d.k)
        require(n.isValidLong, s"HW coefficient outruns Long at m=$m")
        n.toLong
      }
      (emit(l), emit(b), emit(f), k)
    }.toVector
  require(HwCoefs.forall { case (l, b, f, _) =>
    (l ++ b ++ f).map(math.abs).sum < (1L << 40) },
    "Holt-Winters coefficient mass outruns BIGINT headroom for 2^22 volumes")

  /** The [[holtNumSql]] CASE device over the [[HwCoefs]] table:
    * Σ coef·element for the picked vector, per observed window length. */
  private def hwNumSql(lenExpr: String, at: Int => String,
      pick: ((Vector[Long], Vector[Long], Vector[Long], Int)) => Vector[Long]): String =
    (1 to HwWindowDays).map { m =>
      val terms = pick(HwCoefs(m - 1)).zipWithIndex
        .map { case (c, i) => s"($c) * ${at(i + 1)}" }.mkString(" + ")
      s"WHEN $m THEN $terms"
    }.mkString(s"CASE $lenExpr ", " ", " ELSE NULL END")

  /** Power-of-two denominator per window length, as a DOUBLE. */
  private def hwDenSql(lenExpr: String): String =
    (1 to HwWindowDays).map { m =>
      s"WHEN $m THEN ${DetMath.dlit(math.pow(2.0, HwCoefs(m - 1)._4.toDouble))}"
    }.mkString(s"CASE $lenExpr ", " ", " ELSE NULL END")

  /** Additive HOLT–WINTERS (level + trend + weekly season, α = β = γ =
    * ½) over the densified daily grid — the top of the forecasting
    * ladder ([[qEwma]] level → [[qHolt]] level+trend → this adds the
    * seasonal state [[qStl]] only DESCRIBES): level, per-day trend, the
    * NEXT day's seasonal component, and the one-step forecast
    * l + b + s_next that a capacity dashboard plots for a series with
    * both growth and a weekly cycle. Rides [[denseDailyFrom]], and
    * MUST: seasonality is calendar-slotted, so the trailing
    * [[HwWindowDays]]-ROW frame is a [[HwWindowDays]]-DAY frame only
    * because zero-volume days are real rows.
    *
    * Oracle-exactness: the recurrence is linear and only ever adds and
    * halves, so every state is an exact dyadic rational of the window
    * values; [[HwCoefs]] runs it symbolically ONCE and both engines
    * evaluate the same Σ coef·y dot products in exact BIGINT, with ONE
    * division by the power-of-two denominator as the only double op
    * (correctly-rounded identically in both engines). A constant
    * series reads l ≡ y, b ≡ 0, s ≡ 0, forecast ≡ y EXACTLY at every
    * window length (spec), and the spec replays random series against
    * an independent exact-dyadic sequential model bit-for-bit.
    *
    * Plan/scale: the [[qHolt]] shape over the dense grid — one scan →
    * (type, day) agg → grid densify → ONE type-key window collecting
    * ≤ 14 BIGINTs per row → a narrow codegen'd CASE dot product. */
  def qHoltWinters(s: SparkSession, d: String): DataFrame =
    holtWintersFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qHoltWinters]] over a caller-supplied (event_type, ts) relation —
    * the testable core. */
  private[ops] def holtWintersFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    denseDailyFrom(ev, "e_holt_winters")
      .withColumn("vals",
        collect_list(col("n")).over(w.rowsBetween(-(HwWindowDays - 1), 0)))
      .withColumn("num_l", expr(
        hwNumSql("size(vals)", i => s"element_at(vals, $i)", _._1)))
      .withColumn("num_b", expr(
        hwNumSql("size(vals)", i => s"element_at(vals, $i)", _._2)))
      .withColumn("num_f", expr(
        hwNumSql("size(vals)", i => s"element_at(vals, $i)", _._3)))
      .withColumn("den", expr(hwDenSql("size(vals)")))
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        expr("CAST(num_l AS DOUBLE) / den").as("hw_level"),
        expr("CAST(num_b AS DOUBLE) / den").as("hw_trend"),
        expr("CAST(num_f - num_l - num_b AS DOUBLE) / den")
          .as("hw_seasonal_next"),
        expr("CAST(num_f AS DOUBLE) / den").as("hw_next"))
      .orderBy("event_type", "day")
  }

  /** CASE over the observed window length: Σ coef·element — emitted for
    * both engines from the one [[HoltCoefs]] table. `at(i)` renders the
    * dialect's 1-based list access. */
  private def holtNumSql(lenExpr: String, at: Int => String,
      pick: ((Vector[Long], Vector[Long])) => Vector[Long]): String =
    (1 to HoltWindowDays).map { m =>
      val terms = pick(HoltCoefs(m - 1)).zipWithIndex
        .map { case (c, i) => s"($c) * ${at(i + 1)}" }.mkString(" + ")
      s"WHEN $m THEN $terms"
    }.mkString(s"CASE $lenExpr ", " ", " ELSE NULL END")

  /** Holt linear-trend smoothing (level + trend, α = β = ½) of daily
    * volume per event type over a trailing frame of the last
    * [[HoltWindowDays]] OBSERVED days (rows, not calendar days — the
    * same frame semantics as [[qEwma]]; a sparse type's gaps compress,
    * and the trend step is "per observed day", so holt_next forecasts
    * the NEXT OBSERVED day — densify the daily grid first if calendar
    * extrapolation is wanted) — the next model up from [[qEwma]]'s
    * level-only EWMA: a steadily
    * growing series reads as "on trend" here instead of perpetually
    * "above baseline", and the one-step forecast level+trend is the
    * number a capacity dashboard actually plots. Init l₁ = y₁, b₁ = 0;
    * update l = (y + l′ + b′)/2, b = (l − l′ + b′)/2.
    *
    * Oracle-exactness device: the recurrence is LINEAR, so the
    * 4^(m−1)-scaled level and trend are exact integer dot products of
    * the window values with a coefficient table generated ONCE in Scala
    * ([[HoltCoefs]]) and emitted into both engines — integer sums are
    * order-free, the single division by the exact power-of-4 scale is
    * the only double op. Headroom pinned by the require over the actual
    * table (daily volumes to 2³⁰ are exact at w = 14).
    *
    * Plan/scale: [[qEwma]]'s shape — one scan → (type, day) partial agg
    * → ONE type-key window collecting ≤ 14 BIGINTs per row; the CASE
    * dot product is a narrow codegen'd projection. */
  def qHolt(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("vals",
        collect_list(col("n")).over(w.rowsBetween(-(HoltWindowDays - 1), 0)))
      .withColumn("num_l", expr(
        holtNumSql("size(vals)", i => s"element_at(vals, $i)", _._1)))
      .withColumn("num_b", expr(
        holtNumSql("size(vals)", i => s"element_at(vals, $i)", _._2)))
      .withColumn("den",
        expr("CAST(shiftleft(1L, 2 * (size(vals) - 1)) AS DOUBLE)"))
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        expr("CAST(num_l AS DOUBLE) / den").as("holt_level"),
        expr("CAST(num_b AS DOUBLE) / den").as("holt_trend"),
        expr("CAST(num_l + num_b AS DOUBLE) / den").as("holt_next"))
      .orderBy("event_type", "day")
  }

  /** One-step forecast BACKTEST: [[qEwma]] vs [[qHolt]] as predictors of
    * the next observed day's volume, per event type — the evidence for
    * choosing a baseline model instead of asserting one (trend-less
    * traffic should pick EWMA; drifting traffic Holt; this query says
    * which, with the same walk-forward protocol a forecasting team
    * uses). Day d is predicted by each model's state at the PREVIOUS
    * observed day; the report is each model's mean absolute error over
    * all scored days and the winner per type.
    *
    * Exactness: both predictions are rationals of exact BIGINTs; the
    * per-day absolute error is one deterministic double (|y − num/den|,
    * correctly-rounded IEEE ops on identical integers in both engines)
    * quantized to a 1e-6 BIGINT ledger, so the per-type sums are
    * order-free and the winner verdict compares exact integers — it can
    * never flip on accumulation order. MAE is one division at the end.
    *
    * Plan/scale: ONE scan → (type, day) partial agg → both models'
    * frames ride ONE type-key sort (two collect_list windows + two
    * lags stack over the same exchange) → catalog-sized type agg. */
  def qBacktest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val scored = daily
      .withColumn("evals",
        collect_list(col("n")).over(w.rowsBetween(-(EwmaWindowDays - 1), 0)))
      .withColumn("hvals",
        collect_list(col("n")).over(w.rowsBetween(-(HoltWindowDays - 1), 0)))
      // EWMA one-step prediction = the smoothed level itself
      .withColumn("e_pred", expr(
        """CAST(aggregate(reverse(evals), 0L, (a, x) -> 2L * a + x) AS DOUBLE)
           / CAST(shiftleft(1L, size(evals)) - 1L AS DOUBLE)"""))
      // Holt one-step prediction = level + trend
      .withColumn("h_pred", expr(
        s"""CAST((${holtNumSql("size(hvals)", i => s"element_at(hvals, $i)", _._1)})
                 + (${holtNumSql("size(hvals)", i => s"element_at(hvals, $i)", _._2)})
                 AS DOUBLE)
            / CAST(shiftleft(1L, 2 * (size(hvals) - 1)) AS DOUBLE)"""))
      .withColumn("e_prev", lag(col("e_pred"), 1).over(w))
      .withColumn("h_prev", lag(col("h_pred"), 1).over(w))
      .filter(col("e_prev").isNotNull)
      .select(col("event_type"),
        expr("CAST(round(abs(n - e_prev) * 1.0e6) AS BIGINT)").as("e_err"),
        expr("CAST(round(abs(n - h_prev) * 1.0e6) AS BIGINT)").as("h_err"))
    scored.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("e_err")).as("se"), sum(col("h_err")).as("sh"))
      .select(col("event_type"), col("n_days"),
        expr("CAST(se AS DOUBLE) / 1.0e6 / n_days").as("mae_ewma"),
        expr("CAST(sh AS DOUBLE) / 1.0e6 / n_days").as("mae_holt"),
        expr("""CASE WHEN sh < se THEN 'holt'
                     WHEN se < sh THEN 'ewma'
                     ELSE 'tie' END""").as("winner"))
      .orderBy("event_type")
  }

  /** Walk-forward one-step backtest HOLT–WINTERS vs HOLT on the dense
    * day grid — [[qBacktest]]'s discipline applied one rung up the
    * ladder: the evidence that the SEASONAL state earns its keep on
    * this feed (on a weekly-cyclic series HW must win; on an aseasonal
    * one the extra state is noise and Holt should hold). Both models
    * forecast tomorrow from the same trailing 14-DENSE-day window via
    * their exact integer coefficient tables ([[HwCoefs]] /
    * [[HoltCoefs]] — the dense grid is load-bearing for HW: seasonal
    * slots are calendar-indexed); per-day absolute errors quantize to
    * the 1e-6 BIGINT ledger so the MAE sums are order-free and the
    * winner verdict compares exact integers.
    *
    * Plan/scale: one scan → dense grid → ONE type-key window stack
    * (both frames + the lag ride one sort) → catalog agg. */
  def qBacktestHw(s: SparkSession, d: String): DataFrame =
    backtestHwFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qBacktestHw]] over a caller-supplied (event_type, ts) relation —
    * the testable core (a weekly square wave must flip the winner to
    * HW; a constant series ties at zero error). */
  private[ops] def backtestHwFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val scored = denseDailyFrom(ev, "e_backtest_hw")
      .withColumn("vals",
        collect_list(col("n")).over(w.rowsBetween(-(HwWindowDays - 1), 0)))
      .withColumn("hw_pred", expr(
        s"""CAST((${hwNumSql("size(vals)", i => s"element_at(vals, $i)", _._3)})
                 AS DOUBLE) / (${hwDenSql("size(vals)")})"""))
      .withColumn("h_pred", expr(
        s"""CAST((${holtNumSql("size(vals)", i => s"element_at(vals, $i)", _._1)})
                 + (${holtNumSql("size(vals)", i => s"element_at(vals, $i)", _._2)})
                 AS DOUBLE)
            / CAST(shiftleft(1L, 2 * (size(vals) - 1)) AS DOUBLE)"""))
      .withColumn("hw_prev", lag(col("hw_pred"), 1).over(w))
      .withColumn("h_prev", lag(col("h_pred"), 1).over(w))
      .filter(col("hw_prev").isNotNull)
      .select(col("event_type"),
        expr("CAST(round(abs(n - hw_prev) * 1.0e6) AS BIGINT)").as("w_err"),
        expr("CAST(round(abs(n - h_prev) * 1.0e6) AS BIGINT)").as("h_err"))
    scored.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("w_err")).as("sw"), sum(col("h_err")).as("sh"))
      .select(col("event_type"), col("n_days"),
        expr("CAST(sw AS DOUBLE) / 1.0e6 / n_days").as("mae_hw"),
        expr("CAST(sh AS DOUBLE) / 1.0e6 / n_days").as("mae_holt"),
        expr("""CASE WHEN sw < sh THEN 'holt_winters'
                     WHEN sh < sw THEN 'holt'
                     ELSE 'tie' END""").as("winner"))
      .orderBy("event_type")
  }

  /** Split-conformal one-step PREDICTION INTERVAL on the Holt–Winters
    * forecast — the forecasting ladder's honesty tier: [[qHoltWinters]]
    * says what tomorrow probably is, [[qBacktestHw]] says the model
    * beats its ablation, and this says HOW WRONG the forecast tends to
    * be, as an interval a pager threshold can actually use. The
    * calibration set is the walk-forward one-step absolute errors the
    * backtest already defines (every dense day's |n − yesterday's
    * forecast|, on the exact 1e-6 BIGINT ledger); the interval is
    * forecast ± the exact discrete q90 of that error distribution
    * (smallest error with 10·cum ≥ 9·n over the error histogram — the
    * [[graft.ops.ValidationOps]] value-histogram quantile device, so no
    * float ever picks the quantile), and the emitted `coverage` is the
    * exact fraction of calibration days the interval would have covered
    * (≥ 0.9 by construction of the discrete quantile — the conformal
    * guarantee made visible).
    *
    * Plan/scale: the backtest's shape — one scan → dense grid → ONE
    * type-key window stack (frame + lag on one sort), checkpointed once
    * for its two readers (last-day forecast, error ledger) → error
    * histogram agg + catalog-sized quantile windows + two catalog-sized
    * joins. Nothing data-sized shuffles twice. */
  def qForecastPi(s: SparkSession, d: String): DataFrame =
    forecastPiFrom(events(s, d).select(col("event_type"), col("ts")))

  /** [[qForecastPi]] over a caller-supplied (event_type, ts) relation —
    * the testable core (a constant series collapses the interval to a
    * point with coverage 1; a random series replays against the
    * sequential dyadic model + a Scala quantile). */
  private[ops] def forecastPiFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val pred = denseDailyFrom(ev, "e_forecast_pi")
      .withColumn("vals",
        collect_list(col("n")).over(w.rowsBetween(-(HwWindowDays - 1), 0)))
      .withColumn("hw_pred", expr(
        s"""CAST((${hwNumSql("size(vals)", i => s"element_at(vals, $i)", _._3)})
                 AS DOUBLE) / (${hwDenSql("size(vals)")})"""))
      .withColumn("hw_prev", lag(col("hw_pred"), 1).over(w))
      .select(col("event_type"), col("day"), col("n"), col("hw_pred"),
        col("hw_prev"))
      // two readers below (forecast, error ledger) — materialize the
      // window stack once (shared-subtree discipline)
      .localCheckpoint()
    val fc = pred.groupBy("event_type")
      .agg(expr("max_by(hw_pred, day)").as("forecast"))
    val hist = pred.filter(col("hw_prev").isNotNull)
      .select(col("event_type"),
        expr("CAST(round(abs(n - hw_prev) * 1.0e6) AS BIGINT)").as("err"))
      .groupBy("event_type", "err").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w.orderBy("err")))
      .withColumn("n_cal", sum(col("c")).over(Window.partitionBy("event_type")))
      // two readers below (q90 filter, final coverage join) — same
      // shared-subtree discipline as `pred`; catalog×distinct-err sized,
      // so the materialization is cheap and saves a histogram-agg +
      // quantile-window re-run per consumer
      .localCheckpoint()
    // q derives from cum: renamed join keys sidestep the self-join
    // column ambiguity
    val q = cum.filter(col("cum") * 10 >= col("n_cal") * 9)
      .groupBy("event_type").agg(min(col("err")).as("q90i"))
      .withColumnRenamed("event_type", "et")
    cum.join(q, col("event_type") === col("et") &&
        col("err") === col("q90i"))
      .select(col("event_type"), col("n_cal"), col("err"), col("cum"))
      .join(fc, Seq("event_type"))
      .select(col("event_type"), col("n_cal"), col("forecast"),
        expr("CAST(err AS DOUBLE) / 1.0e6").as("q90_err"),
        expr("forecast - CAST(err AS DOUBLE) / 1.0e6").as("pi_lo"),
        expr("forecast + CAST(err AS DOUBLE) / 1.0e6").as("pi_hi"),
        expr("CAST(cum AS DOUBLE) / CAST(n_cal AS DOUBLE)").as("coverage"))
      .orderBy("event_type")
  }

  /** Normalized cohort retention — [[qCohort]]'s counts divided by each
    * cohort's week-0 size (the form a retention chart actually plots:
    * "what fraction of the users acquired in week W were still active
    * N weeks later"). The week-0 base rides a cohort-key window over
    * the catalog-sized cohort grid; the rate is one division of exact
    * BIGINTs. Same single user-key shuffle as qCohort. */
  def qRetention(s: SparkSession, d: String): DataFrame = {
    val wu = Window.partitionBy("user_id")
    val wc = Window.partitionBy("cohort_week")
    events(s, d)
      .withColumn("cw", date_trunc("week", min(col("ts")).over(wu)))
      .withColumn("ew", date_trunc("week", col("ts")))
      .groupBy(col("cw").as("cohort_week"),
        expr("cast(datediff(ew, cw) as bigint) DIV 7").as("week_n"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("week_n") === 0, col("n_active"))).over(wc))
      .withColumn("retention", col("n_active") / col("cohort_size"))
      .orderBy("cohort_week", "week_n")
  }

  /** Strict signed-integer shape for [[qBasket]]'s `props.k` id: up to
    * 18 digits keeps every accepted value inside BIGINT range, so the
    * subsequent CAST can never fail or wrap in either engine. Applied
    * to the RAW extracted string in BOTH the Spark query and the DuckDB
    * oracle — textual, engine-independent drop rule. Anchored with
    * \\A..\\z (absolute ends, supported by Java regex AND RE2) rather
    * than ^..$: Java's $ also matches BEFORE a trailing line
    * terminator, so '123\n' would pass Spark's rlike while DuckDB's
    * RE2 rejects it — exactly the engine divergence this regex exists
    * to rule out. */
  private val BasketItemRe = """\A-?[0-9]{1,18}\z"""

  /** Session-level market-basket pairs: items (the `props.k` id) that
    * co-occur in the same 30-minute gap session, with support and exact
    * lift — the association-mining readout behind "viewed together"
    * features. Support counts sessions containing BOTH items (session-
    * distinct, so repeats don't inflate); lift = n_both·N / (n_a·n_b)
    * is one division of exact BIGINT products.
    *
    * Plan/scale: sessionized item sets are materialized once
    * (localCheckpoint — three consumers: total, per-item counts, pair
    * enumeration); pairs are enumerated INSIDE each session's sorted
    * item array (posexplode + slice, the [[graft.ops.DedupOps]]
    * inverted-index device at session grain) — output-sensitive, never
    * a corpus self-join; per-item counts are catalog-sized and
    * broadcast. Support ≥ 2 bounds the output (the synthetic
    * sessions are short; production raises the floor).
    *
    * Item-id parsing parity: the `props.k` filter matches the RAW
    * extracted string against [[BasketItemRe]] (a strict signed-integer
    * regex, length-bounded under BIGINT range) and only then CASTs —
    * so both engines drop non-numeric, fractional, or out-of-range k
    * values by the SAME textual rule instead of each engine's
    * cast-failure semantics (Spark truncates '12.5', DuckDB rounds it;
    * ANSI mode would error — none of that is reachable now). */
  def qBasket(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val sess = events(s, d)
      .withColumn("kraw", get_json_object(col("props"), "$.k"))
      .filter(col("kraw").rlike(BasketItemRe))
      .withColumn("k", col("kraw").cast("long"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("session_id"), col("k")).distinct()
      .localCheckpoint()
    val nSessions = sess.select("user_id", "session_id").distinct().count()
    val itemCounts = sess.groupBy("k").agg(count(lit(1)).as("n_item"))
    sess
      .groupBy("user_id", "session_id")
      .agg(expr("array_sort(collect_list(k))").as("items"))
      .filter(size(col("items")) >= 2)
      .select(posexplode(col("items")).as(Seq("i", "a")), col("items"))
      .select(col("a"), explode(expr("slice(items, i + 2, size(items))")).as("b"))
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
      .join(broadcast(itemCounts.select(col("k").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("k").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_both"), col("n_a"),
        col("n_b"),
        expr(s"CAST(n_both * ${nSessions}L AS DOUBLE) / " +
          "CAST(n_a * n_b AS DOUBLE)").as("lift"))
      .orderBy("item_a", "item_b")
  }

  /** Kaplan-Meier survival (churn) curve over user lifetimes in weeks —
    * the censoring-aware statistic behind every "how long do users
    * stay" chart, complementing [[qRetention]]'s cohort rates: a user
    * still active in the corpus's final observed week has not churned,
    * only been OBSERVED so far (right-censored), and naive retention
    * treats them as gone. Lifetime = weeks between a user's first and
    * last event week; death at that week unless censored. Per observed
    * lifetime week t: the at-risk count n_t (users whose observation
    * reached t), deaths d_t, censored c_t, and the product-limit
    * estimate S(t) = Π_{i≤t} (n_i − d_i)/n_i.
    *
    * Oracle-exactness: n/d/c are exact BIGINT; each factor's log
    * ln(n_i − d_i) − ln(n_i) is the cross-engine-deterministic
    * [[DetMath]] ln of BIGINTs, QUANTIZED to 1e-9 units and summed as
    * an exact-integer running window (order-independent, the
    * scaled-BIGINT ledger device), then one [[DetMath]] exp — so the
    * curve is bit-identical in both engines. A week where every
    * at-risk user dies sends S to exactly 0.0 thereafter (flag column,
    * no ln(0) anywhere).
    *
    * Plan/scale: one scan → ONE user-key partial agg (first/last ts) →
    * a weeks-sized lifetime grid; the running windows are
    * partition-less but over the catalog-sized (≤ observed weeks) grid
    * — never data-sized. */
  def qSurvival(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.orderBy("t")
    val users = events(s, d)
      .groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("fw"),
        to_date(date_trunc("week", max(col("ts")))).as("lw"))
      // user-count-sized relation consumed by BOTH the max-week scalar
      // and the lifetime grid — materialized once so the corpus scan +
      // user-key agg run once, not per consumer
      .localCheckpoint()
    val mx = users.agg(max(col("lw")).as("mw"), count(lit(1)).as("total"))
    val byT = users.crossJoin(broadcast(mx))
      .select(expr("CAST(datediff(lw, fw) AS BIGINT) DIV 7").as("t"),
        (col("lw") === col("mw")).as("cens"), col("total"))
      .groupBy("t").agg(max(col("total")).as("total"),
        sum(when(col("cens"), 0L).otherwise(1L)).as("d"),
        sum(when(col("cens"), 1L).otherwise(0L)).as("c"))
    val risk = byT
      .withColumn("ends_before", coalesce(sum(col("d") + col("c"))
        .over(wAll.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("total") - col("ends_before"))
      .withColumn("surv", col("n_risk") - col("d"))
      .withColumn("zr", (col("surv") === 0L).cast("long"))
    val lns = DetMath.withLn(
      DetMath.withLn(risk, "CASE WHEN surv = 0 THEN 1 ELSE surv END", "ls"),
      "n_risk", "lr")
      .withColumn("ql", expr("CASE WHEN surv = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(round((ls_ln - lr_ln) * 1.0e9) AS BIGINT) END"))
      .withColumn("cum",
        sum(col("ql")).over(wAll.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("zcum",
        sum(col("zr")).over(wAll.rowsBetween(Window.unboundedPreceding, 0)))
    DetMath.withExp(lns, "CAST(cum AS DOUBLE) / 1.0e9", "se")
      .select(col("t").as("week_n"), col("n_risk"), col("d").as("n_deaths"),
        col("c").as("n_censored"),
        expr("CASE WHEN zcum > 0 THEN 0.0e0 ELSE se_exp END").as("survival"))
      .orderBy("week_n")
  }

  /** New-vs-returning daily actives — the growth-accounting split every
    * activity dashboard pairs with DAU: per day, how many active users
    * saw their FIRST-ever event that day vs earlier. First-seen day is a
    * per-user window min over the (user, day) distinct relation, so the
    * whole report is ONE uniform user-key shuffle + a calendar-sized
    * day aggregate; all counting exact BIGINT. */
  /** Weekly GROWTH ACCOUNTING — the four-way user ledger every growth
    * dashboard runs: per calendar week, how many active users are NEW
    * (first-ever week), RETAINED (also active the week before),
    * RESURRECTED (active before, but not last week), and CHURNED
    * (active last week, absent this week), plus the quick ratio
    * (new + resurrected) / churned. [[qNewReturning]] answers
    * new-vs-returning per day; this decomposes "returning" into the
    * retained/resurrected split and makes churn a first-class output —
    * the identity active(w) = new + retained + resurrected and
    * churned(w) = active(w−1) − retained(w) hold EXACTLY by
    * construction (the spec proves both).
    *
    * Device notes: weeks are integer buckets days-since-epoch DIV 7
    * (both engines floor nonneg integer division; calendar-library week
    * semantics never enter). Churn falls out ARITHMETICALLY at the
    * week level — active(w−1) − retained(w) on the dense week grid —
    * instead of a per-user lead() pass, which would re-shuffle the
    * user relation a second time for a number the identity already
    * determines. The week grid is densified from min..max week so a
    * fully-quiet week reads active=0 / churned=active(w−1) rather than
    * silently fusing two calendar gaps; quiet-gap semantics are spec'd
    * on a constructed fixture. quick_ratio is try_divide ≡ DuckDB's
    * x/0 → NULL (week 1 has churned = 0).
    *
    * Plan/scale: ONE user-keyed shuffle (distinct user-week + the two
    * user-window passes ride the same partitioning), then a week-keyed
    * catalog agg; the dense grid + lag run on the week-count relation
    * (a few hundred rows for years of data) — the single-partition
    * window there is over the CATALOG, documented safe. At 100 TB the
    * only corpus-sized stage is the distinct, exactly as it must be. */
  def qGrowthAccounting(s: SparkSession, d: String): DataFrame =
    growthAccountingFrom(events(s, d).select(col("user_id"), col("ts")))

  /** [[qGrowthAccounting]] over a caller-supplied (user_id, ts)
    * relation — the testable core (the quiet-week densification and
    * the two ledger identities are proven on constructed feeds). */
  private[graft] def growthAccountingFrom(ev: DataFrame): DataFrame = {
    val wu = Window.partitionBy("user_id")
    val wo = Window.partitionBy("user_id").orderBy("wk")
    val uw = ev
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01') div 7").as("wk"))
      .distinct()
    // week-catalog-sized; materialized ONCE (the dedupClustersFrom
    // checkpoint pattern) because the dense grid's min/max and the left
    // join both read it — without this the corpus distinct runs twice
    val counts = uw
      .withColumn("firstwk", min(col("wk")).over(wu))
      .withColumn("lagwk", lag(col("wk"), 1).over(wo))
      .groupBy("wk")
      .agg(count(lit(1)).as("active"),
        sum(when(col("wk") === col("firstwk"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("lagwk") === col("wk") - 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("wk") > col("firstwk") &&
          (col("lagwk") < col("wk") - 1L), 1L).otherwise(0L))
          .as("n_resurrected"))
      .localCheckpoint()
    growthLedgerFrom(counts)
  }

  /** The ledger tail of [[qGrowthAccounting]] — dense week grid, churn
    * identity, quick ratio — over a (wk, active, n_new, n_retained,
    * n_resurrected) relation. ONE definition, so the streaming arm's
    * report ([[graft.streaming.StreamOps.growthStream]] transitions
    * rolled up by week) can never skew from the batch query. Caller
    * must pass a MATERIALIZED relation (the grid min/max and the join
    * both read it). */
  private[graft] def growthLedgerFrom(counts: DataFrame): DataFrame = {
    val grid = counts.agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
      .select(explode(expr("sequence(w0, w1)")).as("wk"))
    val dense = grid.join(counts, Seq("wk"), "left")
      .na.fill(0L, Seq("active", "n_new", "n_retained", "n_resurrected"))
    dense
      .withColumn("prev_active",
        lag(col("active"), 1).over(Window.orderBy("wk")))
      .select(
        expr("date_add(DATE '1970-01-01', cast(wk * 7 as int))")
          .as("week_start"),
        col("active"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .as("n_churned"),
        expr("""try_divide(CAST(n_new + n_resurrected AS DOUBLE),
          CAST(coalesce(prev_active, 0L) - n_retained AS DOUBLE))""")
          .as("quick_ratio"))
      .orderBy("week_start")
  }

  /** Roll a [[graft.streaming.StreamOps.growthStream]] transition table
    * (userId, wk, status) up to the weekly ledger through the SAME
    * [[growthLedgerFrom]] tail the batch query uses — every active
    * (user, week) emits exactly one transition, so `active` is the
    * plain row count and churn falls out of the same identity. */
  def growthReport(transitions: DataFrame): DataFrame =
    growthLedgerFrom(transitions
      .groupBy("wk")
      .agg(count(lit(1)).as("active"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
      .localCheckpoint())

  def qNewReturning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("first_day", min(col("day")).over(w))
      .groupBy("day")
      .agg(
        count(lit(1)).as("dau"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
          .as("returning_users"))
      .orderBy("day")
  }

  /** Week-over-week growth per event type — the other dashboard staple
    * beside [[qEwma]]: weekly volumes with the prior week's count, the
    * absolute delta, and the growth ratio. All counting is exact BIGINT;
    * the ratio is one division of exact integers (NULL on the first
    * week). ONE type-key window over the catalog × weeks aggregate. */
  def qWow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("week")
    events(s, d)
      .groupBy(col("event_type"), date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("week"), col("n").as("n_events"),
        col("prev_n"),
        (col("n") - col("prev_n")).as("wow_delta"),
        (col("n") / col("prev_n")).as("wow_ratio"))
      .orderBy("event_type", "week")
  }

  /** Incremental aggregate maintenance — the nightly-ingest pattern: the
    * standing per-type aggregate is kept as MERGEABLE partials (count,
    * exact scaled-integer value sum, max, first/last ts) and a new
    * partition's partials are merged in, never rescanning history. Every
    * metric is a commutative monoid, so merge(partial(base),
    * partial(delta)) == full recompute — and the oracle IS the full
    * recompute over all of `events`, so the hash gate proves the
    * incremental path exactly, including the exact-sum plumbing (scaled
    * BIGINT partials summed, converted to double ONCE after the merge).
    *
    * Plan/scale: here both sides derive from one scan (a ts split at
    * 2024-01-25); in production the base partials are a stored
    * catalog-sized relation, so the daily cost is partial-agg(delta) +
    * a catalog-sized merge — the only scan is the new partition. Both
    * arms partial-aggregate map-side; the merge agg runs on 2×|types|
    * rows. */
  def qIncrAgg(s: SparkSession, d: String): DataFrame = {
    val scale = 1000000L
    val cutoff = lit("2024-01-25").cast("timestamp")
    def partials(df: DataFrame): DataFrame = df.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(round(col("value") * scale).cast("long")).as("svfp"),
      max(col("value")).as("max_value"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"))
    val ev = events(s, d)
    partials(ev.filter(col("ts") < cutoff))
      .unionAll(partials(ev.filter(col("ts") >= cutoff)))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n"),
        (sum(col("svfp")).cast("double") / scale.toDouble).as("total_value"),
        max(col("max_value")).as("max_value"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))
      .orderBy("event_type")
  }

  /** DAU / trailing-7-day WAU / stickiness per day — the activity
    * dashboard every event warehouse serves. WAU's "distinct users in
    * [d−6, d]" is NOT computed with a count-distinct-over-range window
    * (unsupported, and a per-day re-scan at any scale); instead each
    * active (user, day) row fans out to the 7 future days it keeps the
    * user "weekly-active" for, and WAU falls out of a plain distinct +
    * count — the standard shuffle-friendly rewrite.
    *
    * Exactness: integer day numbers from [[qGapsIslands]]'s datediff
    * anchor; counts exact BIGINT; stickiness = dau/wau is the single
    * double division.
    *
    * Plan/scale: one scan → (user, day) distinct (THE corpus-scale
    * shuffle, uniform composite key); the 7× Generate rides that output
    * (activity-sized, not event-sized) into a second uniform distinct;
    * everything after is calendar-sized. No range join, no per-day
    * re-aggregation. */
  def qDauWau(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("dayn"))
      .distinct()
      // activity-sized relation consumed by BOTH branches — materialized
      // once ([[DedupOps.dedupClusters]] pattern) so the DAU and WAU
      // sides don't each re-derive it from their own events scan
      .localCheckpoint()
    val dau = ud.groupBy("dayn").agg(count(lit(1)).as("n_dau"))
    val wau = ud
      .select(col("user_id"), explode(expr("sequence(dayn, dayn + 6)")).as("tday"))
      .distinct()
      .groupBy("tday").agg(count(lit(1)).as("n_wau"))
    dau.join(wau, dau("dayn") === wau("tday"))
      .select(
        expr("date_add(cast('2024-01-01' as date), cast(dayn as int))").as("day"),
        col("n_dau"), col("n_wau"), expr("n_dau / n_wau").as("stickiness"))
      .orderBy("day")
  }

  /** Absorption fixed-point scale and iteration count for
    * [[qMarkovRemoval]] — both engines run the SAME truncating-integer
    * recurrence, so the report is bit-exact. */
  private val MrScale = 1000000000L
  private val MrIters = 12

  /** Markov removal-effect attribution — the step past [[qMarkov]]'s raw
    * transition matrix: which channel actually DRIVES conversion. Per
    * user, the journey is the event sequence up to and including the
    * first purchase (START → touches → CONV, or → NULL if none); the
    * model is the first-order Markov chain over those transitions. A
    * channel's removal effect is 1 − P(conv | chain with all transitions
    * into that channel deleted) / P(conv | full chain) — the standard
    * data-driven alternative to last-touch heuristics ([[qAttribution]])
    * — and attribution is each channel's share of the summed removal
    * effects.
    *
    * Oracle-exactness: transition probabilities are truncating
    * fixed-point integers (n·1e9 div out-degree) and absorption runs a
    * FIXED [[MrIters]]-step integer recurrence
    * a_{t+1}(s) = (Σ_{s'} p(s,s')·a_t(s')) div 1e9 with a(CONV) pinned —
    * exact-integer sums (≤6e18, no overflow), one truncating division
    * per state per step, identical in Scala and DuckDB's HUGEINT
    * arithmetic; every reported double is a single division of exact
    * integers.
    *
    * Plan/scale: one scan → ONE user-key shuffle serving all three
    * windows (prior-purchase gate, rank, lead) → a single-pass struct
    * explode into transitions → a catalog-sized (from, to) agg
    * (≤ (K+2)² rows) collected to the driver; the chain solve is
    * driver arithmetic on a ≤7-state matrix, the [[SimilarityOps.kmeans]]
    * driver-loop pattern. Corpus size only affects the one scan+shuffle. */
  def qMarkovRemoval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("is_p",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .withColumn("prior_p", coalesce(
        sum(col("is_p")).over(byUser.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("prior_p") === 0)
      .withColumn("state",
        when(col("event_type") === "purchase", lit("CONV"))
          .otherwise(col("event_type")))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("nxt", lead(col("state"), 1).over(byUser))
      .select(explode(expr(
        """filter(array(
             IF(rn = 1, named_struct('f', 'START', 't', state),
                CAST(NULL AS STRUCT<f: STRING, t: STRING>)),
             IF(nxt IS NOT NULL, named_struct('f', state, 't', nxt),
                IF(state <> 'CONV', named_struct('f', state, 't', 'NULL'),
                   CAST(NULL AS STRUCT<f: STRING, t: STRING>)))),
           x -> x IS NOT NULL)""")).as("tr"))
      .groupBy(col("tr.f").as("from_s"), col("tr.t").as("to_s"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val deg = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val pfp = counts.map { case ((f, t), n) => (f, t) -> n * MrScale / deg(f) }
    def absorb(excluded: Option[String]): Long = {
      var a = Map("CONV" -> MrScale).withDefaultValue(0L)
      for (_ <- 0 until MrIters) {
        val next = pfp.toSeq
          .filter { case ((_, t), _) => !excluded.contains(t) }
          .groupBy(_._1._1)
          .map { case (f, rows) =>
            f -> rows.map { case ((_, t), p) => p * a(t) }.sum / MrScale }
        a = (next + ("CONV" -> MrScale)).withDefaultValue(0L)
      }
      a("START")
    }
    val base = absorb(None)
    // Channel catalog DERIVED from the observed transition states (any
    // state that is not the START/CONV/NULL bookkeeping triple) — a new
    // event type in regenerated testdata gets its removal-effect row
    // automatically instead of silently missing attribution. The DuckDB
    // oracle derives its variants list from its own cnt CTE by the same
    // rule, so the two catalogs cannot drift.
    val channels = counts.keysIterator
      .flatMap { case (f, t) => Iterator(f, t) }
      .filterNot(Set("START", "CONV", "NULL"))
      .toSeq.distinct.sorted
    val res = channels.map { c =>
      val re = base - absorb(Some(c))
      (c, re)
    }
    val tot = res.map(_._2).sum
    res.map { case (c, re) =>
      (c,
        base.toDouble / MrScale.toDouble,
        if (base == 0) 0.0 else re.toDouble / base.toDouble,
        if (tot == 0) 0.0 else re.toDouble / tot.toDouble)
    }.toDF("channel", "conv_base", "removal_effect", "attribution")
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_dau_wau" -> qDauWau,
    "e_incr_agg" -> qIncrAgg,
    "e_seasonal" -> qSeasonal,
    "e_markov" -> qMarkov,
    "e_markov_removal" -> qMarkovRemoval,
    "e_ewma" -> qEwma,
    "e_cusum" -> qCusum,
    "e_autocorr" -> qAutocorr,
    "e_weekday_lift" -> qWeekdayLift,
    "e_did" -> qDid,
    "e_stl" -> qStl,
    "e_stl_anomaly" -> qStlAnomaly,
    "e_anomaly_votes" -> qAnomalyVotes,
    "e_hll_users_daily" -> qHllUsersDaily,
    "e_holt" -> qHolt,
    "e_holt_winters" -> qHoltWinters,
    "e_backtest_hw" -> qBacktestHw,
    "e_forecast_pi" -> qForecastPi,
    "e_xcorr" -> qXcorr,
    "e_seasonal_strength" -> qSeasonalStrength,
    "e_attr_window" -> qAttrWindow,
    "e_inter_event" -> qInterEvent,
    "e_backtest" -> qBacktest,
    "e_wow" -> qWow,
    "e_growth_accounting" -> qGrowthAccounting,
    "e_new_returning" -> qNewReturning,
    "e_basket" -> qBasket,
    "e_retention" -> qRetention,
    "e_survival" -> qSurvival,
    "e_funnel_time" -> qFunnelTime,
    "e_ab_test" -> qAbTest,
    "e_attribution" -> qAttribution,
    "q_gaps_islands" -> qGapsIslands,
    "e_upsert" -> qUpsertMerge,
    "e_scd2" -> qScd2,
    "e_cohort" -> qCohort,
    "e_event_funnel" -> qEventFunnel,
    "q_json_extract" -> qJsonExtract,
    "e_quality_report" -> qQualityReport,
    "q_tumbling_window" -> qTumbling,
    "q_sessionize" -> qSessionize,
    "q_session_window" -> qSessionWindow,
    "e_paths" -> qPaths,
    "e_gini" -> qGini,
    "e_pareto" -> qPareto,
    "q_asof_join" -> qAsofJoin,
    "q_asof_fwd" -> qAsofFwd,
    "q_range_join" -> qRangeJoin,
    "q_skew_salted" -> qSkewSalted,
    "q_lead_lag" -> qLeadLag)

  /** DuckDB replay of [[qMarkovRemoval]]: same journey windows, same
    * truncating fixed-point transition matrix, [[MrIters]] unrolled
    * integer absorption steps per variant (base + one per removed
    * channel) — HUGEINT sums make every intermediate exact, like the
    * Scala driver's Long arithmetic. The variants list is DERIVED from
    * the observed transition states (everything but START/CONV/NULL),
    * the same rule the Scala driver applies to its collected matrix —
    * the unrolled absorption steps are channel-count-independent, so
    * no part of the SQL needs a static catalog. */
  private def markovRemovalOracle: String = {
    def iter(i: Int) = s"""
      a$i AS (
        SELECT pv.variant, pv.from_s AS s,
               CAST(sum(pv.p_fp * coalesce(a.av, 0)) // $MrScale AS BIGINT) AS av
        FROM pv LEFT JOIN a${i - 1} a
          ON a.variant = pv.variant AND a.s = pv.to_s
        GROUP BY 1, 2
        UNION ALL
        SELECT variant, 'CONV', $MrScale::BIGINT FROM variants)"""
    s"""
      WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, event_type,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
      w1 AS (
        SELECT *, coalesce(sum(is_p) OVER (
                 PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_p
        FROM ev),
      kept AS (
        SELECT user_id, t, event_id,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS state
        FROM w1 WHERE prior_p = 0),
      seq AS (
        SELECT user_id, state,
               row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS rn,
               lead(state) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nxt
        FROM kept),
      tr AS (
        SELECT 'START' AS from_s, state AS to_s FROM seq WHERE rn = 1
        UNION ALL SELECT state, nxt FROM seq WHERE nxt IS NOT NULL
        UNION ALL SELECT state, 'NULL' FROM seq
          WHERE nxt IS NULL AND state <> 'CONV'),
      cnt AS (SELECT from_s, to_s, count(*)::BIGINT AS n FROM tr GROUP BY 1, 2),
      p AS (SELECT from_s, to_s,
              CAST((n * $MrScale::BIGINT) //
                   sum(n) OVER (PARTITION BY from_s) AS BIGINT) AS p_fp
            FROM cnt),
      variants AS (
        SELECT 'base' AS variant
        UNION ALL
        SELECT DISTINCT s AS variant FROM (
          SELECT from_s AS s FROM cnt UNION ALL SELECT to_s FROM cnt)
        WHERE s NOT IN ('START', 'CONV', 'NULL')),
      pv AS (SELECT v.variant, p.from_s, p.to_s, p.p_fp
             FROM p CROSS JOIN variants v
             WHERE v.variant = 'base' OR p.to_s <> v.variant),
      a0 AS (SELECT variant, 'CONV' AS s, $MrScale::BIGINT AS av FROM variants),
      ${(1 to MrIters).map(iter).mkString(",")},
      basev AS (SELECT coalesce((SELECT av FROM a$MrIters
                  WHERE variant = 'base' AND s = 'START'), 0) AS b),
      re AS (SELECT v.variant AS channel,
               (SELECT b FROM basev) - coalesce(a.av, 0) AS re
             FROM variants v LEFT JOIN a$MrIters a
               ON a.variant = v.variant AND a.s = 'START'
             WHERE v.variant <> 'base'),
      tot AS (SELECT CAST(sum(re) AS BIGINT) AS t FROM re)
      SELECT channel,
             CAST((SELECT b FROM basev) AS DOUBLE) / $MrScale.0 AS conv_base,
             CASE WHEN (SELECT b FROM basev) = 0 THEN 0.0
                  ELSE CAST(re AS DOUBLE) /
                       CAST((SELECT b FROM basev) AS DOUBLE) END AS removal_effect,
             CASE WHEN (SELECT t FROM tot) = 0 THEN 0.0
                  ELSE CAST(re AS DOUBLE) /
                       CAST((SELECT t FROM tot) AS DOUBLE) END AS attribution
      FROM re ORDER BY channel"""
  }

  /** The e_stl_anomaly oracle as a named val so the e_anomaly_votes
    * ensemble oracle can embed the IDENTICAL tier text (the shared-CTE
    * no-drift rule applied across the map boundary). */
  private val StlAnomalyOracle: String = s"""
      WITH ${stlCtes("e_stl_anomaly")},
      st0 AS (
        SELECT *, max(n) OVER wt AS maxn, count(resid) OVER wt AS dres
        FROM decomp
        WINDOW wt AS (PARTITION BY event_type)),
      qz AS (
        SELECT event_type, day, n, resid, dres,
               CASE WHEN
                   CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE)
                     * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE) * 1.0e12 > 1.0e37
                 THEN error('e_stl_anomaly: residual ledger exceeds the 128-bit envelope (D^3*max_n^2*1e12 > 1e37) — shorten the span or shard the type')
                 ELSE CAST(round(resid * 1000000) AS BIGINT) END AS q
        FROM st0),
      st AS (
        SELECT *,
               sum(q::HUGEINT) OVER wt AS s,
               sum(q::HUGEINT * q) OVER wt AS q2
        FROM qz
        WINDOW wt AS (PARTITION BY event_type))
      SELECT event_type, day, n, resid,
             ((dres::HUGEINT * q - s) * (dres::HUGEINT * q - s))
               > 9 * (dres::HUGEINT * q2 - s * s) AS is_anomaly
      FROM st ORDER BY event_type, day"""

  val oracles: Map[String, String] = Map(
    "e_markov_removal" -> markovRemovalOracle,
    "e_basket" -> s"""
      WITH base AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tus,
               CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
        FROM events
        WHERE regexp_matches(json_extract_string(props, '$$.k'),
                             '$BasketItemRe')),
      flagged AS (
        SELECT *, lag(epoch_us(tus))
                 OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_us
        FROM base),
      sess AS (
        SELECT user_id, k,
               CAST(sum(CASE WHEN prev_us IS NULL
                        OR epoch_us(tus) - prev_us > 1800000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_id
        FROM flagged),
      sd AS (SELECT DISTINCT user_id, session_id, k FROM sess),
      ns AS (SELECT count(*)::BIGINT AS n
             FROM (SELECT DISTINCT user_id, session_id FROM sd)),
      ic AS (SELECT k, count(*)::BIGINT AS n_item FROM sd GROUP BY 1),
      pr AS (SELECT a.k AS item_a, b.k AS item_b, count(*)::BIGINT AS n_both
             FROM sd a JOIN sd b
               ON a.user_id = b.user_id AND a.session_id = b.session_id
                  AND a.k < b.k
             GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT p.item_a, p.item_b, p.n_both,
             ia.n_item AS n_a, ib.n_item AS n_b,
             CAST(p.n_both * (SELECT n FROM ns) AS DOUBLE) /
               CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
      FROM pr p JOIN ic ia ON p.item_a = ia.k JOIN ic ib ON p.item_b = ib.k
      ORDER BY p.item_a, p.item_b""",
    "e_survival" -> s"""
      WITH u AS (SELECT user_id,
               CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
                 AS fw,
               CAST(date_trunc('week', max(CAST(ts AS TIMESTAMP))) AS DATE)
                 AS lw
             FROM events GROUP BY 1),
      mx AS (SELECT max(lw) AS mw, count(*)::BIGINT AS total FROM u),
      bt AS (SELECT (date_diff('day', fw, lw) // 7)::BIGINT AS t,
               max(total)::BIGINT AS total,
               sum(CASE WHEN lw = mw THEN 0 ELSE 1 END)::BIGINT AS d,
               sum(CASE WHEN lw = mw THEN 1 ELSE 0 END)::BIGINT AS c
             FROM u CROSS JOIN mx GROUP BY 1),
      rk AS (SELECT *,
               (total - coalesce(sum(d + c) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0))::BIGINT AS n_risk
             FROM bt),
      s1 AS (SELECT *, (n_risk - d)::BIGINT AS surv FROM rk),
      l1 AS (SELECT *,
               ${DetMath.lnDuckSelect(
                 "CASE WHEN surv = 0 THEN 1 ELSE surv END", "ls")},
               ${DetMath.lnDuckSelect("n_risk", "lr")}
             FROM s1),
      q1 AS (SELECT *,
               CASE WHEN surv = 0 THEN 0::BIGINT
                    ELSE CAST(round((ls_ln - lr_ln) * 1.0e9) AS BIGINT)
               END AS ql,
               CASE WHEN surv = 0 THEN 1 ELSE 0 END AS zr
             FROM l1),
      c1 AS (SELECT *,
               CAST(sum(ql) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(zr) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS zcum
             FROM q1),
      e1 AS (SELECT *,
               ${DetMath.expDuckSelect("CAST(cum AS DOUBLE) / 1.0e9", "se")}
             FROM c1)
      SELECT t AS week_n, n_risk, d AS n_deaths, c AS n_censored,
             CASE WHEN zcum > 0 THEN 0.0e0 ELSE se_exp END AS survival
      FROM e1 ORDER BY week_n""",
    "e_growth_accounting" -> """
      WITH uw AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01',
                 CAST(CAST(ts AS TIMESTAMP) AS DATE))::BIGINT // 7 AS wk
        FROM events),
      f AS (
        SELECT user_id, wk,
               min(wk) OVER (PARTITION BY user_id) AS firstwk,
               lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS lagwk
        FROM uw),
      c AS (
        SELECT wk, count(*)::BIGINT AS active,
               sum(CASE WHEN wk = firstwk THEN 1 ELSE 0 END)::BIGINT
                 AS n_new,
               sum(CASE WHEN lagwk = wk - 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_retained,
               sum(CASE WHEN wk > firstwk AND lagwk < wk - 1
                   THEN 1 ELSE 0 END)::BIGINT AS n_resurrected
        FROM f GROUP BY 1),
      grid AS (
        SELECT unnest(generate_series(min(wk), max(wk))) AS wk FROM c),
      dense AS (
        SELECT g.wk, coalesce(c.active, 0)::BIGINT AS active,
               coalesce(c.n_new, 0)::BIGINT AS n_new,
               coalesce(c.n_retained, 0)::BIGINT AS n_retained,
               coalesce(c.n_resurrected, 0)::BIGINT AS n_resurrected
        FROM grid g LEFT JOIN c ON g.wk = c.wk),
      l AS (
        SELECT *, lag(active) OVER (ORDER BY wk) AS prev_active
        FROM dense)
      SELECT (DATE '1970-01-01' + (wk * 7)::INT) AS week_start,
             active, n_new, n_retained, n_resurrected,
             (coalesce(prev_active, 0) - n_retained)::BIGINT AS n_churned,
             CAST(n_new + n_resurrected AS DOUBLE)
               / CAST(coalesce(prev_active, 0) - n_retained AS DOUBLE)
               AS quick_ratio
      FROM l ORDER BY week_start""",
    "e_new_returning" -> """
      WITH ud AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events),
      f AS (
        SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS first_day
        FROM ud)
      SELECT day, count(*)::BIGINT AS dau,
             sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)::BIGINT
               AS new_users,
             sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END)::BIGINT
               AS returning_users
      FROM f GROUP BY 1 ORDER BY day""",
    "e_wow" -> """
      WITH wk AS (
        SELECT event_type,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                 AS week,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      l AS (
        SELECT event_type, week, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        FROM wk)
      SELECT event_type, week, n AS n_events, prev_n,
             n - prev_n AS wow_delta, n / prev_n AS wow_ratio
      FROM l ORDER BY event_type, week""",
    "e_hll_users_daily" -> s"""
      WITH ${DedupOps.hllOracleCtes(
        "SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
          "user_id::VARCHAR AS tok FROM events",
        Seq("day"))},
      agg AS (SELECT day, count(*)::BIGINT AS n_buckets,
                ${DedupOps.HarmFoldSql} AS occ
              FROM mx GROUP BY day)
      SELECT day, n_buckets, ${DedupOps.HllEstSql} AS hll_estimate
      FROM agg ORDER BY day""",
    "e_cusum" -> s"""
      WITH ${denseDailyCtes("e_cusum")},
      t AS (
        SELECT event_type, day, n,
               count(*) OVER (PARTITION BY event_type)::BIGINT AS dcnt,
               sum(n) OVER (PARTITION BY event_type)::BIGINT AS tot
        FROM dense),
      p AS (
        SELECT event_type, day, n, dcnt, tot,
               sum(dcnt * n - tot)
                 OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS pp
        FROM t),
      m AS (
        SELECT event_type, day, n, dcnt, tot, pp,
               min(least(pp, 0))
                 OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS pmin,
               max(greatest(pp, 0))
                 OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS pmax
        FROM p)
      SELECT event_type, day, n AS n_events,
             CAST(pp - pmin AS DOUBLE) / CAST(dcnt AS DOUBLE) AS cusum_pos,
             CAST(pmax - pp AS DOUBLE) / CAST(dcnt AS DOUBLE) AS cusum_neg,
             (pp - pmin) > $CusumH * tot AS shift_up,
             (pmax - pp) > $CusumH * tot AS shift_down
      FROM m ORDER BY event_type, day""",
    "e_stl" -> s"""
      WITH ${stlCtes("e_stl")}
      SELECT event_type, day, n, trend, seasonal, resid
      FROM decomp ORDER BY event_type, day""",
    "e_seasonal_strength" -> s"""
      WITH ${stlCtes("e_seasonal_strength")},
      st0 AS (
        SELECT *, max(n) OVER wt AS maxn, count(*) OVER wt AS dres
        FROM decomp WHERE resid IS NOT NULL
        WINDOW wt AS (PARTITION BY event_type)),
      qz AS (
        SELECT event_type, dres,
               CASE WHEN
                   CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE)
                     * CAST(dres AS DOUBLE) * CAST(dres AS DOUBLE)
                     * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE) * 1.0e12
                     > 1.0e37
                 THEN error('e_seasonal_strength: variance ledger exceeds the 128-bit envelope (D^4*max_n^2*1e12 > 1e37) — shorten the span or shard the type')
                 ELSE CAST(round(resid * 1000000) AS BIGINT) END AS qr,
               CAST(round((n::DOUBLE - trend) * 1000000) AS BIGINT) AS qd,
               CAST(round((n::DOUBLE - seasonal) * 1000000) AS BIGINT) AS qs
        FROM st0),
      ag AS (
        SELECT event_type, count(*)::BIGINT AS nd,
               sum(qr::HUGEINT) AS sr, sum(qr::HUGEINT * qr) AS r2,
               sum(qd::HUGEINT) AS sd, sum(qd::HUGEINT * qd) AS d2,
               sum(qs::HUGEINT) AS ss, sum(qs::HUGEINT * qs) AS s2
        FROM qz GROUP BY 1)
      SELECT event_type, nd AS n_days,
             CASE WHEN (nd::HUGEINT * d2 - sd * sd) = 0
                    THEN CAST(NULL AS DOUBLE)
                  WHEN 1.0 - CAST(nd::HUGEINT * r2 - sr * sr AS DOUBLE)
                         / CAST(nd::HUGEINT * d2 - sd * sd AS DOUBLE) < 0
                    THEN 0.0
                  ELSE 1.0 - CAST(nd::HUGEINT * r2 - sr * sr AS DOUBLE)
                         / CAST(nd::HUGEINT * d2 - sd * sd AS DOUBLE)
             END AS strength_seasonal,
             CASE WHEN (nd::HUGEINT * s2 - ss * ss) = 0
                    THEN CAST(NULL AS DOUBLE)
                  WHEN 1.0 - CAST(nd::HUGEINT * r2 - sr * sr AS DOUBLE)
                         / CAST(nd::HUGEINT * s2 - ss * ss AS DOUBLE) < 0
                    THEN 0.0
                  ELSE 1.0 - CAST(nd::HUGEINT * r2 - sr * sr AS DOUBLE)
                         / CAST(nd::HUGEINT * s2 - ss * ss AS DOUBLE)
             END AS strength_trend
      FROM ag ORDER BY event_type""",
    "e_stl_anomaly" -> StlAnomalyOracle,
    "e_anomaly_votes" -> s"""
      WITH r AS (${ValidationOps.oracles("v_anomaly")}),
      m AS (${ValidationOps.oracles("v_mad_anomaly")}),
      s2 AS ($StlAnomalyOracle),
      j1 AS (
        SELECT coalesce(r.event_type, m.event_type) AS event_type,
               coalesce(r.day, m.day) AS day,
               r.is_anomaly AS flag_raw, m.is_outlier AS flag_robust
        FROM r FULL JOIN m
          ON r.event_type = m.event_type AND r.day = m.day),
      j2 AS (
        SELECT coalesce(j1.event_type, s2.event_type) AS event_type,
               coalesce(j1.day, s2.day) AS day,
               j1.flag_raw, j1.flag_robust, s2.is_anomaly AS flag_stl
        FROM j1 FULL JOIN s2
          ON j1.event_type = s2.event_type AND j1.day = s2.day)
      SELECT event_type, day, flag_raw, flag_robust, flag_stl,
             ((CASE WHEN flag_raw THEN 1 ELSE 0 END)
               + (CASE WHEN flag_robust THEN 1 ELSE 0 END)
               + (CASE WHEN flag_stl THEN 1 ELSE 0 END))::BIGINT AS n_votes
      FROM j2
      WHERE coalesce(flag_raw, FALSE) OR coalesce(flag_robust, FALSE)
         OR coalesce(flag_stl, FALSE)
      ORDER BY event_type, day""",
    "e_did" -> """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      b AS (SELECT event_type,
              date_diff('day', DATE '1970-01-01', day)::BIGINT AS dn, n
            FROM daily),
      g AS (SELECT *, min(dn) OVER () AS lo, max(dn) OVER () AS hi FROM b),
      m AS (SELECT *, CAST(floor((lo + hi) / 2.0e0) AS BIGINT) AS mid
            FROM g),
      p AS (SELECT event_type,
              sum(CASE WHEN dn <= mid THEN n ELSE 0 END)::BIGINT AS n_pre,
              sum(CASE WHEN dn > mid THEN n ELSE 0 END)::BIGINT AS n_post,
              max(mid - lo + 1) AS pre_days, max(hi - mid) AS post_days
            FROM m GROUP BY 1),
      t AS (SELECT *, sum(n_pre) OVER () AS tot_pre,
              sum(n_post) OVER () AS tot_post FROM p),
      e AS (SELECT event_type, n_pre, n_post,
              CAST(n_post AS DOUBLE) / CAST(post_days AS DOUBLE)
                - CAST(n_pre AS DOUBLE) / CAST(pre_days AS DOUBLE)
                AS own_delta,
              CAST(tot_post - n_post AS DOUBLE) / CAST(post_days AS DOUBLE)
                - CAST(tot_pre - n_pre AS DOUBLE) / CAST(pre_days AS DOUBLE)
                AS ctrl_delta
            FROM t)
      SELECT event_type, n_pre, n_post, own_delta, ctrl_delta,
             own_delta - ctrl_delta AS did
      FROM e ORDER BY event_type""",
    "e_weekday_lift" -> s"""
      WITH ${denseDailyCtes("e_weekday_lift")},
      a AS (
        SELECT event_type,
               sum(CASE WHEN isodow(day) >= 6 THEN 0 ELSE 1 END)::BIGINT AS weekday_days,
               sum(CASE WHEN isodow(day) >= 6 THEN 0 ELSE n END)::BIGINT AS weekday_n,
               sum(CASE WHEN isodow(day) >= 6 THEN 1 ELSE 0 END)::BIGINT AS weekend_days,
               sum(CASE WHEN isodow(day) >= 6 THEN n ELSE 0 END)::BIGINT AS weekend_n
        FROM dense GROUP BY 1)
      SELECT event_type, weekday_days, weekday_n, weekend_days, weekend_n,
             CAST(weekend_n * weekday_days AS DOUBLE) /
               CAST(weekday_n * weekend_days AS DOUBLE) AS weekend_lift
      FROM a ORDER BY event_type""",
    "e_autocorr" -> s"""
      WITH ${denseDailyCtes("e_autocorr")},
      b AS (
        SELECT event_type, day, n,
               count(*) OVER (PARTITION BY event_type)::BIGINT AS dcnt,
               sum(n) OVER (PARTITION BY event_type)::BIGINT AS tot,
               max(n) OVER (PARTITION BY event_type)::BIGINT AS maxn
        FROM dense),
      res AS (
        SELECT event_type, day, dcnt,
               CASE WHEN 4.0 * CAST(maxn AS DOUBLE) * CAST(maxn AS DOUBLE)
                      * CAST(dcnt AS DOUBLE) * CAST(dcnt AS DOUBLE)
                      * CAST(dcnt AS DOUBLE) > pow(2.0, 61.0)
                 THEN error('e_autocorr: residual ledger exceeds BIGINT envelope (4*D^3*max_n^2 > 2^61) — shorten the span or shard the type')
                 ELSE dcnt * n - tot END AS r
        FROM b),
      l AS (
        SELECT event_type, r,
               ${(1 to AutocorrMaxLag)
                 .map(k => s"lag(r, $k) OVER w AS l$k").mkString(", ")}
        FROM res WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      nums AS (
        ${(1 to AutocorrMaxLag).map(k =>
          s"SELECT event_type, $k AS lag, sum(r * l$k) AS num FROM l GROUP BY 1")
          .mkString("\n        UNION ALL ")}),
      stats AS (
        SELECT event_type, sum(r * r) AS den, count(*)::BIGINT AS n_days
        FROM l GROUP BY 1)
      SELECT nums.event_type, nums.lag, stats.n_days,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
      FROM nums JOIN stats USING (event_type)
      ORDER BY event_type, lag""",
    "e_ewma" -> s"""
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      wd AS (
        SELECT event_type, day, n,
               list(n) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN ${EwmaWindowDays - 1} PRECEDING
                             AND CURRENT ROW) AS vals
        FROM daily),
      sc AS (
        SELECT event_type, day, n,
               list_reduce(list_prepend(0::BIGINT, list_reverse(vals)),
                           (a, x) -> 2 * a + x) AS num,
               (1::BIGINT << len(vals)) - 1 AS den
        FROM wd)
      SELECT event_type, day, n AS n_events,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma30
      FROM sc ORDER BY event_type, day""",
    "e_xcorr" -> s"""
      WITH ${denseDailyCtes("e_xcorr")},
      st AS (SELECT event_type, count(*)::BIGINT AS dcnt,
               sum(n)::BIGINT AS tot, max(n)::BIGINT AS maxn
             FROM dense GROUP BY 1),
      r AS (SELECT d.event_type, d.day,
              CASE WHEN 4.0 * maxn::DOUBLE * maxn::DOUBLE
                     * dcnt::DOUBLE * dcnt::DOUBLE * dcnt::DOUBLE
                     > 2.0 ^ 61
                THEN error('e_xcorr: residual ledger exceeds BIGINT envelope (4*D^3*max_n^2 > 2^61) — shorten the span or shard the type')
                ELSE dcnt * n - tot END AS r
            FROM dense d JOIN st ON d.event_type = st.event_type),
      den AS (SELECT event_type, sum(r * r)::BIGINT AS den2
              FROM r GROUP BY 1),
      pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
               l.lag::INT AS lag, count(*)::BIGINT AS n_overlap,
               sum(a.r * b.r)::BIGINT AS num
             FROM r a
             CROSS JOIN generate_series(-3, 3) l(lag)
             JOIN r b ON b.day = a.day + l.lag::INT
               AND a.event_type < b.event_type
             GROUP BY 1, 2, 3)
      SELECT pr.type_a, pr.type_b, pr.lag, pr.n_overlap,
             CAST(pr.num AS DOUBLE)
               / sqrt(CAST(da.den2 AS DOUBLE) * CAST(db.den2 AS DOUBLE))
               AS xcorr
      FROM pr JOIN den da ON pr.type_a = da.event_type
      JOIN den db ON pr.type_b = db.event_type
      ORDER BY pr.type_a, pr.type_b, pr.lag""",
    "e_forecast_pi" -> s"""
      WITH ${denseDailyCtes("e_forecast_pi")},
      wd AS (
        SELECT event_type, day, n,
               list(n) OVER w AS vals
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN ${HwWindowDays - 1} PRECEDING
                     AND CURRENT ROW)),
      pr AS (
        SELECT event_type, day, n,
               CAST((${hwNumSql("len(vals)", i => s"vals[$i]", _._3)}) AS DOUBLE)
                 / (${hwDenSql("len(vals)")}) AS hw_pred
        FROM wd),
      lg AS (
        SELECT event_type, day, n, hw_pred,
               lag(hw_pred) OVER (PARTITION BY event_type ORDER BY day)
                 AS hw_prev
        FROM pr),
      fc AS (SELECT event_type, max_by(hw_pred, day) AS forecast
             FROM lg GROUP BY 1),
      h AS (SELECT event_type,
              CAST(round(abs(n - hw_prev) * 1.0e6) AS BIGINT) AS err,
              count(*)::BIGINT AS c
            FROM lg WHERE hw_prev IS NOT NULL GROUP BY 1, 2),
      cu AS (SELECT event_type, err, c,
               (sum(c) OVER (PARTITION BY event_type ORDER BY err))::BIGINT
                 AS cum,
               (sum(c) OVER (PARTITION BY event_type))::BIGINT AS n_cal
             FROM h),
      q AS (SELECT event_type, min(err)::BIGINT AS q90i FROM cu
            WHERE cum * 10 >= n_cal * 9 GROUP BY 1),
      cov AS (SELECT cu.event_type, cu.n_cal, cu.err, cu.cum
              FROM cu JOIN q ON cu.event_type = q.event_type
                AND cu.err = q.q90i)
      SELECT cov.event_type, cov.n_cal, fc.forecast,
             CAST(cov.err AS DOUBLE) / 1.0e6 AS q90_err,
             fc.forecast - CAST(cov.err AS DOUBLE) / 1.0e6 AS pi_lo,
             fc.forecast + CAST(cov.err AS DOUBLE) / 1.0e6 AS pi_hi,
             CAST(cov.cum AS DOUBLE) / CAST(cov.n_cal AS DOUBLE) AS coverage
      FROM cov JOIN fc ON cov.event_type = fc.event_type
      ORDER BY cov.event_type""",
    "e_backtest_hw" -> s"""
      WITH ${denseDailyCtes("e_backtest_hw")},
      wd AS (
        SELECT event_type, day, n,
               list(n) OVER w AS vals
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN ${HwWindowDays - 1} PRECEDING
                     AND CURRENT ROW)),
      pr AS (
        SELECT event_type, day, n,
               CAST((${hwNumSql("len(vals)", i => s"vals[$i]", _._3)}) AS DOUBLE)
                 / (${hwDenSql("len(vals)")}) AS hw_pred,
               CAST((${holtNumSql("len(vals)", i => s"vals[$i]", _._1)})
                    + (${holtNumSql("len(vals)", i => s"vals[$i]", _._2)})
                    AS DOUBLE)
                 / CAST(1::BIGINT << (2 * (len(vals) - 1)) AS DOUBLE)
                 AS h_pred
        FROM wd),
      lg AS (
        SELECT event_type, n,
               lag(hw_pred) OVER w2 AS hw_prev,
               lag(h_pred) OVER w2 AS h_prev
        FROM pr
        WINDOW w2 AS (PARTITION BY event_type ORDER BY day)),
      sc AS (
        SELECT event_type,
               CAST(round(abs(n - hw_prev) * 1.0e6) AS BIGINT) AS w_err,
               CAST(round(abs(n - h_prev) * 1.0e6) AS BIGINT) AS h_err
        FROM lg WHERE hw_prev IS NOT NULL)
      SELECT event_type, count(*)::BIGINT AS n_days,
             CAST(sum(w_err) AS DOUBLE) / 1.0e6 / count(*) AS mae_hw,
             CAST(sum(h_err) AS DOUBLE) / 1.0e6 / count(*) AS mae_holt,
             CASE WHEN sum(w_err) < sum(h_err) THEN 'holt_winters'
                  WHEN sum(h_err) < sum(w_err) THEN 'holt'
                  ELSE 'tie' END AS winner
      FROM sc GROUP BY 1 ORDER BY event_type""",
    "e_holt_winters" -> s"""
      WITH ${denseDailyCtes("e_holt_winters")},
      wd AS (
        SELECT event_type, day, n,
               list(n) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN ${HwWindowDays - 1} PRECEDING
                             AND CURRENT ROW) AS vals
        FROM dense),
      sc AS (
        SELECT event_type, day, n,
               (${hwNumSql("len(vals)", i => s"vals[$i]", _._1)})::BIGINT
                 AS num_l,
               (${hwNumSql("len(vals)", i => s"vals[$i]", _._2)})::BIGINT
                 AS num_b,
               (${hwNumSql("len(vals)", i => s"vals[$i]", _._3)})::BIGINT
                 AS num_f,
               (${hwDenSql("len(vals)")}) AS den
        FROM wd)
      SELECT event_type, day, n AS n_events,
             CAST(num_l AS DOUBLE) / den AS hw_level,
             CAST(num_b AS DOUBLE) / den AS hw_trend,
             CAST(num_f - num_l - num_b AS DOUBLE) / den AS hw_seasonal_next,
             CAST(num_f AS DOUBLE) / den AS hw_next
      FROM sc ORDER BY event_type, day""",
    "e_holt" -> s"""
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      wd AS (
        SELECT event_type, day, n,
               list(n) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN ${HoltWindowDays - 1} PRECEDING
                             AND CURRENT ROW) AS vals
        FROM daily),
      sc AS (
        SELECT event_type, day, n,
               (${holtNumSql("len(vals)", i => s"vals[$i]", _._1)})::BIGINT
                 AS num_l,
               (${holtNumSql("len(vals)", i => s"vals[$i]", _._2)})::BIGINT
                 AS num_b,
               CAST(1::BIGINT << (2 * (len(vals) - 1)) AS DOUBLE) AS den
        FROM wd)
      SELECT event_type, day, n AS n_events,
             CAST(num_l AS DOUBLE) / den AS holt_level,
             CAST(num_b AS DOUBLE) / den AS holt_trend,
             CAST(num_l + num_b AS DOUBLE) / den AS holt_next
      FROM sc ORDER BY event_type, day""",
    "e_dau_wau" -> """
      WITH ud AS (SELECT DISTINCT user_id,
              date_diff('day', DATE '2024-01-01',
                CAST(CAST(ts AS TIMESTAMP) AS DATE))::BIGINT AS dayn
            FROM events),
      dau AS (SELECT dayn, count(*)::BIGINT AS n_dau FROM ud GROUP BY 1),
      x AS (SELECT DISTINCT user_id, dayn + k AS tday
            FROM ud CROSS JOIN
              (SELECT unnest(generate_series(0::BIGINT, 6::BIGINT)) AS k)),
      wau AS (SELECT tday, count(*)::BIGINT AS n_wau FROM x GROUP BY 1)
      SELECT (DATE '2024-01-01' + dau.dayn::INT) AS day, dau.n_dau,
        wau.n_wau, dau.n_dau / wau.n_wau AS stickiness
      FROM dau JOIN wau ON dau.dayn = wau.tday
      ORDER BY day""",
    "e_seasonal" -> """
      WITH g AS (SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   hour(CAST(ts AS TIMESTAMP))::BIGINT AS hour,
                   count(*)::BIGINT AS n
                 FROM events GROUP BY 1, 2, 3),
      w AS (SELECT event_type, hour, day, n,
              count(*) OVER (PARTITION BY event_type, hour)::BIGINT AS k,
              sum(n) OVER (PARTITION BY event_type, hour)::BIGINT AS sn,
              sum(n * n) OVER (PARTITION BY event_type, hour)::BIGINT AS sq
            FROM g),
      t AS (SELECT event_type, hour, day, n,
              k * n - sn AS dev, k * sq - sn * sn AS varnum
            FROM w)
      SELECT event_type, hour, day, n,
             CASE WHEN varnum = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE CAST(dev AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE)) END
               AS z,
             dev * dev > 4 * varnum AS is_anomaly
      FROM t ORDER BY event_type, hour, day""",
    // the full recompute — equality proves the incremental merge
    "e_incr_agg" -> s"""
      SELECT event_type, count(*)::BIGINT AS n,
             ${Exact.dsumSql("value")} AS total_value,
             max(value) AS max_value,
             min(CAST(ts AS TIMESTAMP)) AS first_ts,
             max(CAST(ts AS TIMESTAMP)) AS last_ts
      FROM events GROUP BY 1 ORDER BY event_type""",
    "e_markov" -> """
      WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                    event_type
                  FROM events),
      nx AS (SELECT event_type AS from_type,
               lead(event_type)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             FROM ev),
      g AS (SELECT from_type, to_type, count(*)::BIGINT AS n
            FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             n / (sum(n) OVER (PARTITION BY from_type))::BIGINT AS p
      FROM g ORDER BY from_type, to_type""",
    "e_funnel_time" -> """
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                  FROM events),
      pu AS (SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t2,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t3,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
             FROM ev GROUP BY 1),
      gaps AS (
        SELECT '2_view' AS step,
               epoch_us(t2) - epoch_us(t1) AS gap_us
        FROM pu WHERE t1 IS NOT NULL AND t2 >= t1
        UNION ALL
        SELECT '3_click', epoch_us(t3) - epoch_us(t2)
        FROM pu WHERE t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2
        UNION ALL
        SELECT '4_purchase', epoch_us(t4) - epoch_us(t3)
        FROM pu WHERE t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2 AND t4 >= t3),
      h AS (SELECT step, gap_us, count(*)::BIGINT AS cnt
            FROM gaps GROUP BY 1, 2),
      w AS (SELECT step, gap_us, cnt,
              sum(cnt) OVER (PARTITION BY step ORDER BY gap_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
              sum(cnt) OVER (PARTITION BY step)::BIGINT AS n
            FROM h)
      SELECT step,
             min(CASE WHEN cum >= (n + 1) // 2 THEN gap_us END)::BIGINT
               AS median_gap_us,
             min(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap_us END)::BIGINT
               AS p90_gap_us,
             max(n)::BIGINT AS n_users
      FROM w GROUP BY 1 ORDER BY step""",
    "e_ab_test" -> """
      WITH pu AS (SELECT user_id,
               sum(CASE WHEN event_type = 'purchase' AND "value" >= 95
                        THEN 1 ELSE 0 END)::BIGINT AS np,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round("value" * 1000000) AS BIGINT)
                        ELSE 0 END)::BIGINT AS vfp
             FROM events GROUP BY 1),
      a AS (SELECT user_id % 2 AS arm, count(*)::BIGINT AS n_users,
              sum(CASE WHEN np > 0 THEN 1 ELSE 0 END)::BIGINT AS n_converted,
              sum(vfp)::BIGINT AS svfp
            FROM pu GROUP BY 1),
      t AS (SELECT *, sum(n_users) OVER ()::BIGINT AS tu,
              sum(n_converted) OVER ()::BIGINT AS tc
            FROM a)
      SELECT arm, n_users, n_converted,
             n_converted / n_users AS conv_rate,
             CAST(svfp AS DOUBLE) / 1.0e6 AS total_value,
             (CAST(svfp AS DOUBLE) / 1.0e6) / n_users AS value_per_user,
             n_converted / n_users - (tc - n_converted) / (tu - n_users) AS lift,
             CASE WHEN tc = 0 OR tc = tu THEN CAST(NULL AS DOUBLE)
                  ELSE (n_converted / n_users - (tc - n_converted) / (tu - n_users)) /
                       sqrt((tc / tu) * (1 - tc / tu)
                            * (1.0 / n_users + 1.0 / (tu - n_users))) END AS z_score
      FROM t ORDER BY arm""",
    "e_attribution" -> s"""
      WITH ev AS (SELECT user_id, event_id, "value", event_type,
                    CAST(ts AS TIMESTAMP) AS ts,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
                  FROM events),
      w AS (SELECT *,
              last_value(CASE WHEN is_p = 0 THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch
            FROM ev)
      SELECT coalesce(touch, 'none') AS touch_type,
             count(*)::BIGINT AS n_purchases,
             ${dsumSql("value")} AS attributed_value
      FROM w WHERE is_p = 1 GROUP BY 1 ORDER BY touch_type""",
    "e_backtest" -> s"""
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      wd AS (
        SELECT event_type, day, n,
               list(n) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN ${EwmaWindowDays - 1} PRECEDING
                             AND CURRENT ROW) AS evals,
               list(n) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN ${HoltWindowDays - 1} PRECEDING
                             AND CURRENT ROW) AS hvals
        FROM daily),
      p AS (
        SELECT event_type, day, n,
               CAST(list_reduce(list_prepend(0::BIGINT, list_reverse(evals)),
                                (a, x) -> 2 * a + x) AS DOUBLE)
                 / CAST((1::BIGINT << len(evals)) - 1 AS DOUBLE) AS e_pred,
               CAST((${holtNumSql("len(hvals)", i => s"hvals[$i]", _._1)})
                    + (${holtNumSql("len(hvals)", i => s"hvals[$i]", _._2)})
                    AS DOUBLE)
                 / CAST(1::BIGINT << (2 * (len(hvals) - 1)) AS DOUBLE)
                 AS h_pred
        FROM wd),
      l AS (
        SELECT event_type, n,
               lag(e_pred) OVER (PARTITION BY event_type ORDER BY day)
                 AS e_prev,
               lag(h_pred) OVER (PARTITION BY event_type ORDER BY day)
                 AS h_prev
        FROM p),
      e AS (
        SELECT event_type,
               CAST(round(abs(n - e_prev) * 1.0e6) AS BIGINT) AS e_err,
               CAST(round(abs(n - h_prev) * 1.0e6) AS BIGINT) AS h_err
        FROM l WHERE e_prev IS NOT NULL),
      g AS (
        SELECT event_type, count(*)::BIGINT AS n_days,
               sum(e_err)::BIGINT AS se, sum(h_err)::BIGINT AS sh
        FROM e GROUP BY 1)
      SELECT event_type, n_days,
             CAST(se AS DOUBLE) / 1.0e6 / n_days AS mae_ewma,
             CAST(sh AS DOUBLE) / 1.0e6 / n_days AS mae_holt,
             CASE WHEN sh < se THEN 'holt'
                  WHEN se < sh THEN 'ewma'
                  ELSE 'tie' END AS winner
      FROM g ORDER BY event_type""",
    "e_inter_event" -> """
      WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events),
      g AS (SELECT epoch_us(ts) AS us,
              lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_us
            FROM ev),
      b AS (SELECT (length(bin((us - prev_us) // 1000000 + 1)) - 1)::INT
                     AS bkt
            FROM g WHERE prev_us IS NOT NULL),
      h AS (SELECT bkt, count(*)::BIGINT AS n_gaps FROM b GROUP BY 1)
      SELECT bkt, (1::BIGINT << bkt) - 1 AS gap_lo_s, n_gaps,
             n_gaps / (SELECT sum(n_gaps)::BIGINT FROM h) AS share
      FROM h ORDER BY bkt""",
    "e_attr_window" -> s"""
      WITH ev AS (SELECT user_id, event_id, "value", event_type,
                    CAST(ts AS TIMESTAMP) AS ts,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
                  FROM events),
      w AS (SELECT *,
              last_value(CASE WHEN is_p = 0 THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch,
              last_value(CASE WHEN is_p = 0 THEN epoch_us(ts) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS touch_us
            FROM ev),
      c AS (SELECT CASE WHEN touch IS NULL THEN 'none'
                        WHEN epoch_us(ts) - touch_us > ${AttrWindowDays * 86400L * 1000000L}
                          THEN 'expired'
                        ELSE touch END AS touch_type,
              "value"
            FROM w WHERE is_p = 1)
      SELECT touch_type, count(*)::BIGINT AS n_purchases,
             ${dsumSql("value")} AS attributed_value
      FROM c GROUP BY 1 ORDER BY touch_type""",
    "q_gaps_islands" -> """
      WITH d AS (SELECT DISTINCT user_id,
                   date_diff('day', DATE '2024-01-01',
                     CAST(CAST(ts AS TIMESTAMP) AS DATE))::BIGINT AS dayn
                 FROM events),
      g AS (SELECT user_id, dayn,
              dayn - row_number() OVER (PARTITION BY user_id ORDER BY dayn)
                AS grp
            FROM d),
      i AS (SELECT user_id, grp, count(*)::BIGINT AS len FROM g GROUP BY 1, 2)
      SELECT user_id, sum(len)::BIGINT AS n_active_days,
             count(*)::BIGINT AS n_streaks, max(len)::BIGINT AS longest_streak
      FROM i GROUP BY 1 ORDER BY user_id""",
    "e_retention" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      cw AS (SELECT user_id,
               date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cw,
               date_trunc('week', ts) AS ew
             FROM ev),
      g AS (SELECT cw::TIMESTAMP AS cohort_week,
              (date_diff('day', cw, ew) // 7)::BIGINT AS week_n,
              count(DISTINCT user_id)::BIGINT AS n_active
            FROM cw GROUP BY 1, 2)
      SELECT cohort_week, week_n, n_active,
             max(CASE WHEN week_n = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week)::BIGINT AS cohort_size,
             n_active / max(CASE WHEN week_n = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week) AS retention
      FROM g ORDER BY cohort_week, week_n""",
    "e_cohort" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      cw AS (SELECT user_id,
               date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cw,
               date_trunc('week', ts) AS ew
             FROM ev)
      SELECT cw::TIMESTAMP AS cohort_week,
             (date_diff('day', cw, ew) // 7)::BIGINT AS week_n,
             count(DISTINCT user_id)::BIGINT AS n_active
      FROM cw GROUP BY 1, 2 ORDER BY 1, 2""",
    "e_event_funnel" -> """
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                  FROM events),
      pu AS (SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t2,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t3,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
             FROM ev GROUP BY 1),
      dep AS (SELECT CASE WHEN t1 IS NULL THEN 0
                          WHEN t2 IS NULL OR t2 < t1 THEN 1
                          WHEN t3 IS NULL OR t3 < t2 THEN 2
                          WHEN t4 IS NULL OR t4 < t3 THEN 3
                          ELSE 4 END AS depth
              FROM pu),
      ag AS (SELECT
               sum(CASE WHEN depth >= 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN depth >= 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
               sum(CASE WHEN depth >= 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
               sum(CASE WHEN depth >= 4 THEN 1 ELSE 0 END)::BIGINT AS n4
             FROM dep)
      SELECT 1::BIGINT AS step, 'signup' AS step_name, n1 AS n_users,
             CAST(NULL AS DOUBLE) AS conv_rate FROM ag
      UNION ALL SELECT 2, 'view', n2,
             CASE WHEN n1 = 0 THEN NULL ELSE n2 / n1 END FROM ag
      UNION ALL SELECT 3, 'click', n3,
             CASE WHEN n2 = 0 THEN NULL ELSE n3 / n2 END FROM ag
      UNION ALL SELECT 4, 'purchase', n4,
             CASE WHEN n3 = 0 THEN NULL ELSE n4 / n3 END FROM ag
      ORDER BY step""",
    "e_upsert" -> s"""
      WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
      upd AS (SELECT o_orderkey AS k, o_totalprice + 1.0 AS price
              FROM orders WHERE o_orderkey % 10 = 3
              UNION ALL
              SELECT o_orderkey + 100000000, o_totalprice
              FROM orders WHERE o_orderkey % 10 = 7),
      m AS (SELECT coalesce(u.k, b.k) AS k,
              coalesce(u.price, b.price) AS price,
              CASE WHEN u.k IS NULL THEN 'kept'
                   WHEN b.k IS NULL THEN 'inserted'
                   ELSE 'updated' END AS op
            FROM base b FULL OUTER JOIN upd u ON b.k = u.k)
      SELECT op, count(*)::BIGINT AS n_rows, ${dsumSql("price")} AS total_price
      FROM m GROUP BY op ORDER BY op""",
    "e_scd2" -> """
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                    event_id
                  FROM events),
      f AS (SELECT *, CASE WHEN lag(event_type)
                             OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
            FROM ev),
      g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                        AS grp
            FROM f),
      r AS (SELECT user_id, grp, event_type, min(ts) AS valid_from,
              count(*)::BIGINT AS n_events
            FROM g GROUP BY 1, 2, 3),
      l AS (SELECT *, lead(valid_from)
                        OVER (PARTITION BY user_id ORDER BY valid_from, grp)
                        AS valid_to
            FROM r)
      SELECT user_id, event_type, valid_from, valid_to,
             valid_to IS NULL AS is_current, n_events
      FROM l ORDER BY user_id, valid_from, grp""",
    "e_quality_report" -> """
      SELECT event_type,
             count(*) AS n_rows,
             count(CASE WHEN user_id IS NULL THEN 1 END) AS null_user,
             count(CASE WHEN value IS NULL THEN 1 END) AS null_value,
             count(CASE WHEN value < 0 THEN 1 END) AS neg_value,
             count(CASE WHEN value > 1000 THEN 1 END) AS over_cap,
             count(CASE WHEN length(props) = 0 OR props IS NULL THEN 1 END)
               AS empty_props,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q_json_extract" -> """
      SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "q_tumbling_window" -> s"""
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
             event_type, count(*) AS n, ${dsumSql("value")} AS total_value
      FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q_session_window" -> """
      WITH flagged AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tus,
               lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        FROM events),
      sess AS (
        SELECT user_id, event_id, tus,
               CAST(sum(CASE WHEN prev_us IS NULL
                        OR epoch_us(tus) - prev_us > 1800000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id,
             min(tus) AS session_start,
             max(tus) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_start""",
    "q_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tus,
               lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        FROM events),
      sess AS (
        SELECT user_id, event_id, tus,
               CAST(sum(CASE WHEN prev_us IS NULL
                        OR epoch_us(tus) - prev_us > 1800000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, count(*) AS n_events,
             min(tus) AS session_start, max(tus) AS session_end
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",
    "e_pareto" -> """
      WITH uc AS (SELECT user_id, count(*)::BIGINT AS c
                  FROM events GROUP BY 1),
      h AS (SELECT c, count(*)::BIGINT AS nu,
              (c * count(*))::BIGINT AS ev
            FROM uc GROUP BY 1),
      p AS (SELECT c, nu, ev,
              (sum(nu) OVER w - nu)::BIGINT AS cu,
              (sum(ev) OVER w - ev)::BIGINT AS ce,
              sum(nu) OVER ()::BIGINT AS u_tot,
              sum(ev) OVER ()::BIGINT AS e_tot
            FROM h WINDOW w AS (ORDER BY c DESC)),
      x AS (SELECT p.*, t.pct::BIGINT AS pct
            FROM p, unnest([1, 5, 10, 25, 50]) AS t(pct)),
      y AS (SELECT pct, (u_tot * pct + 99) // 100 AS rk,
              cu, ce, c, nu, e_tot
            FROM x)
      SELECT pct, rk AS top_users,
             (ce + (rk - cu) * c)::BIGINT AS events_cum,
             e_tot AS n_events_total,
             (ce + (rk - cu) * c) / e_tot AS share,
             (100 * (ce + (rk - cu) * c)) / (pct * e_tot) AS lift
      FROM y WHERE rk > cu AND rk <= cu + nu ORDER BY pct""",
    "e_gini" -> {
      val L = Exact.Limb
      val mid = s"(x // $L) * (c % $L) + (x % $L) * (c // $L)"
      val low = s"(x % $L) * (c % $L)"
      s"""
      WITH pu AS (SELECT user_id, count(*)::BIGINT AS x
                  FROM events GROUP BY 1),
      bc AS (SELECT x, count(*)::BIGINT AS nc FROM pu GROUP BY 1),
      pr AS (SELECT x, nc,
               coalesce(sum(nc) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS b
             FROM bc),
      t AS (SELECT x, nc,
              ${Exact.guardedDuck(
                s"nc > $GiniRowLimit OR b > $GiniRowLimit",
                "e_gini ledger envelope exceeded (n_users >= 2^30 or n_events >= 2^53)",
                "(2 * nc * b + nc * (nc + 1))::BIGINT")} AS c
            FROM pr),
      a AS (SELECT sum(nc)::BIGINT AS n_users,
              sum(x * nc)::BIGINT AS n_events,
              sum((x // $L) * (c // $L))::BIGINT AS s_a,
              sum(($mid) // $L)::BIGINT AS s_mh,
              sum(($mid) % $L)::BIGINT AS s_ml,
              sum(($low) // $L)::BIGINT AS s_ch,
              sum(($low) % $L)::BIGINT AS s_cl
            FROM t)
      SELECT n_users, n_events,
        ${Exact.guardedDuck(
          s"n_users >= ${1L << 30} OR n_events >= ${1L << 53}",
          "e_gini ledger envelope exceeded (n_users >= 2^30 or n_events >= 2^53)",
          s"""((${Exact.limb3DblDuck("s_a + s_mh", "s_ml + s_ch", "s_cl")})
              - (${Exact.limbDblDuck(
                  s"(n_users + 1) * (n_events // $L)",
                  s"(n_users + 1) * (n_events % $L)")}))
             / (${Exact.limbDblDuck(
                  s"n_users * (n_events // $L)",
                  s"n_users * (n_events % $L)")})""")} AS gini
      FROM a"""
    },
    "e_paths" -> """
      WITH flagged AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS tus,
               lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        FROM events),
      sess AS (
        SELECT user_id, event_id, event_type, tus,
               CAST(sum(CASE WHEN prev_us IS NULL
                        OR epoch_us(tus) - prev_us > 1800000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged),
      led AS (
        SELECT event_type,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3,
               lead(session_id, 2) OVER w AS s3,
               session_id
        FROM sess
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
      SELECT event_type || '>' || t2 || '>' || t3 AS path,
             count(*)::BIGINT AS n
      FROM led WHERE s3 = session_id
      GROUP BY 1 ORDER BY n DESC, path""",
    "q_asof_join" -> """
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
        FROM events WHERE event_type IN ('view', 'click')),
      w AS (
        SELECT *,
               last_value(CASE WHEN is_click = 0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
               last_value(CASE WHEN is_click = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
        FROM ev)
      SELECT event_id AS click_id, user_id, view_id,
             epoch_us(ts) - epoch_us(view_ts) AS gap_us
      FROM w WHERE is_click = 1 ORDER BY click_id""",
    "q_asof_fwd" -> """
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
        FROM events WHERE event_type IN ('view', 'click')),
      w AS (
        SELECT *,
               first_value(CASE WHEN is_click = 0 THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, is_click DESC, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS view_id,
               first_value(CASE WHEN is_click = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, is_click DESC, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS view_ts
        FROM ev)
      SELECT event_id AS click_id, user_id, view_id,
             epoch_us(view_ts) - epoch_us(ts) AS gap_us
      FROM w WHERE is_click = 1 ORDER BY click_id""",
    "q_range_join" -> """
      SELECT e.event_id AS err_id, count(*) AS n_clicks
      FROM events e JOIN events c
        ON c.event_type = 'click' AND e.event_type = 'error'
       AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(e.ts AS TIMESTAMP))
       AND epoch_us(CAST(c.ts AS TIMESTAMP)) <= epoch_us(CAST(e.ts AS TIMESTAMP)) + 300000000
      GROUP BY 1 ORDER BY err_id""",
    // the salt is invisible in the result: a plain exact-sum groupBy.
    "q_skew_salted" -> s"""
      SELECT event_type, count(*) AS n, ${dsumSql("value")} AS total_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q_lead_lag" -> """
      WITH t AS (SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, "value"
                 FROM events WHERE user_id < 50)
      SELECT user_id, event_id, ts_us, "value",
             lag("value", 1) OVER w AS prev_value,
             lead("value", 1) OVER w AS next_value,
             ts_us - lag(ts_us, 1) OVER w AS gap_us
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      ORDER BY user_id, ts_us, event_id""")
}
