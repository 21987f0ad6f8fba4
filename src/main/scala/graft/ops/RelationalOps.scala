package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational coverage the reference lacks (SURVEY.md §2.2 — joins, aggs,
  * windows, sorts, set-ops, scalar function families) expressed as
  * declarative DataFrame plans so Catalyst gets pushdown/pruning/join
  * selection for free. Scale notes per query in Scaladoc.
  */
object RelationalOps {
  import Tables._
  import Exact._

  /** TPC-H Q1 shape: scan → filter → partial+final hash agg, no join.
    * Scales linearly; shuffle is |groups| (6 rows) — negligible. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    * customer is the small side (10% of orders): Catalyst broadcasts it
    * under AQE at bench scale; at 100 TB the orders⋈lineitem join shuffles
    * on orderkey — the natural co-partitioning key (bucket both by orderkey
    * in a real deployment to eliminate it). */
  def q3TopkJoin(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  }

  /** TPC-H Q5 shape: star join over region→nation→customer→orders→lineitem.
    * region/nation are tiny → explicit broadcast; the fact-side joins
    * shuffle once on custkey and once on orderkey. */
  def q5StarJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("r_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")

  /** Broadcast-join rollup over two tiny dims: zero shuffle on the dims,
    * one on the supplier agg keys. */
  def qJoinBroadcast(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal")).as("total_bal"))
      .orderBy("r_name", "n_name")

  /** LEFT SEMI (EXISTS): customers having an open order. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** LEFT ANTI (NOT EXISTS): customers with no pending order. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Ranking window: top-3 orders per customer by totalprice (deterministic
    * tiebreak on orderkey). Single shuffle on custkey. */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** NTILE quartile banding — the missing sibling of the rank/dist
    * window family: per order priority, orders are split into 4
    * equal-count bands by total price and each band is summarized
    * (count, price lo/hi). The standard spend-segmentation readout
    * (quartile fences per segment) and the one window function the
    * inventory lacked. The window ORDER BY carries the unique
    * o_orderkey tiebreak, so band assignment is deterministic in both
    * engines even under price ties; both engines implement SQL-standard
    * ntile (first `n mod 4` bands get the extra row).
    *
    * Plan/scale: one priority-keyed window pass (ntile needs the
    * partition row count — Spark buffers each partition once), then a
    * 20-row agg. Partitions are the 5 priorities — for a skewed
    * real-world key the banding column would move to a percent_rank
    * bucketing, same output contract. */
  def qNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      .groupBy("o_orderpriority", "quartile")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("price_lo"),
        max(col("o_totalprice")).as("price_hi"))
      .orderBy("o_orderpriority", "quartile")
  }

  /** Running-total window with an explicit ROWS frame. The accumulator is
    * DECIMAL so the running double is order-exact vs the oracle (a raw
    * double running sum would drift: DuckDB uses segment-tree window agg,
    * Spark a streaming accumulator — different addition orders). */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(22, 8))).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** RANGE-frame window (value-bounded, vs qWindowRunning's ROWS frame):
    * for each lineitem, how many items of its return flag fall within 5
    * quantity units below it. The frame is defined by VALUES, so the row
    * set per frame — and the exact integer count/sum over it — is
    * deterministic under ties. */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("qty"))
      .rangeBetween(-5, Window.currentRow)
    lineitem(s, d)
      .filter(col("l_orderkey") <= 2000)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
      .withColumn("n_within5", count(lit(1)).over(w))
      .withColumn("qty_within5", sum(col("qty")).over(w))
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
  }

  /** ROLLUP grouping hierarchy; group keys COALESCEd to 'ALL' so NULL
    * ordering never diverges between engines (Spark sorts NULLS FIRST,
    * DuckDB NULLS LAST by default). */
  def qRollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("qty"))
      .orderBy("returnflag", "linestatus")

  /** CUBE over (returnflag, linestatus): all 4 grouping combinations in one
    * pass — Spark expands grouping sets map-side, so it's still a single
    * shuffle keyed by (grouping-set id, keys). */
  def qCube(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("price"))
      .orderBy("returnflag", "linestatus")

  /** PIVOT: per-nation supplier account balance spread across region
    * columns — `groupBy().pivot()` compiles to conditional aggregation
    * (one pass, one shuffle), which is also how the oracle expresses it. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .pivot(col("r_name"), Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
      .agg(count(lit(1)))
      .select(col("n_name"),
        coalesce(col("AFRICA"), lit(0L)).as("africa"),
        coalesce(col("AMERICA"), lit(0L)).as("america"),
        coalesce(col("ASIA"), lit(0L)).as("asia"),
        coalesce(col("EUROPE"), lit(0L)).as("europe"),
        coalesce(col("MIDDLE EAST"), lit(0L)).as("middle_east"))
      .orderBy("n_name")

  /** Distribution-analytic window family: percent_rank, cume_dist and
    * ntile(4) over each customer's orders by price — the remaining
    * SQL-standard analytics beyond rank/row_number. All three are exact
    * rational functions of integer ranks under a TOTAL order
    * (deterministic tiebreak on orderkey), so the doubles are engine
    * -identical. One shuffle on the customer key. */
  def qWindowDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).cast("bigint").as("quartile"))
      .orderBy("o_custkey", "o_totalprice", "o_orderkey")
  }

  /** UNPIVOT (melt): the wide → long inverse of [[qPivot]], via the
    * Dataset.unpivot API (plans as Expand — one narrow pass, no shuffle
    * beyond the source agg). The wide input is the pivot result itself,
    * so the pair is a round-trip. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    qPivot(s, d)
      .unpivot(
        ids = Array(col("n_name")),
        values = Array(col("africa"), col("america"), col("asia"),
          col("europe"), col("middle_east")),
        variableColumnName = "region",
        valueColumnName = "n_suppliers")
      .filter(col("n_suppliers") > 0)
      .orderBy("n_name", "region")

  /** Ordered string aggregation (LISTAGG/string_agg): per region, the
    * nation names concatenated in DETERMINISTIC sorted order —
    * `sort_array(collect_list(...))` then join, because a bare
    * collect_list order is partition-arrival nondeterminism that would
    * hash-differ run to run, let alone engine to engine. One small-dim
    * agg; broadcast joins. */
  def qStringAgg(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("r_name")

  /** Scalar subquery: orders priced above the global exact average. The
    * single-row aggregate broadcasts; the fact scan is one pass. */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val globalAvg = orders(s, d).agg(davg(col("o_totalprice")).as("g"))
    orders(s, d)
      .crossJoin(broadcast(globalAvg))
      .filter(col("o_totalprice") > col("g"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** INTERSECT (distinct): customers with both an 'O' and an 'F' order. */
  def qIntersect(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** EXCEPT (distinct): ordering customers with no open ('O') order. */
  def qExcept(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** EXCEPT ALL — the MULTISET difference the DISTINCT variant
    * ([[qExcept]]) silently collapses: a customer with 3 fulfilled and
    * 1 open order keeps multiplicity 2 here (3 − 1), where EXCEPT
    * keeps them iff they have no open order at all. Spark plans its
    * native `exceptAll` as a ±1-tagged union + sum-key aggregate +
    * sequence re-expansion — one shuffle, no join; the oracle is the
    * SQL-standard EXCEPT ALL both engines define identically. */
  def qExceptAll(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.select(col("o_custkey"))
      .exceptAll(o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** INTERSECT ALL — multiplicity min(left, right) per key, the multiset
    * twin of [[qExceptAll]]; same native one-shuffle plan shape. */
  def qIntersectAll(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.select(col("o_custkey"))
      .intersectAll(o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heap +
    * driver merge, no full sort, no shuffle of the full table. */
  def qTopk(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** String function family (SURVEY.md §2.2 row: absent in reference,
    * standard engine surface). */
  def qStringFns(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 500)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        reverse(col("p_brand")).as("rev_brand"))
      .orderBy("p_partkey")

  /** Date/time function family over orders timestamps. */
  def qDateFns(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_2002"))
      .orderBy("o_orderkey")

  /** Math function family; sqrt is IEEE-exact so safe raw, everything else
    * is exact integer/decimal arithmetic. */
  def qMathFns(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("rounded"),
        abs(col("l_discount") - lit(0.05)).as("abs_diff"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_tax") + lit(1), 2).as("tax_sq"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy("l_orderkey", "l_linenumber")

  /** CASE WHEN bucketing + HAVING-style post-aggregation filter. */
  def qCaseHaving(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .filter(col("n") > 10)
      .orderBy("bucket")

  /** Explicit GROUPING SETS — the general form rollup/cube specialize.
    * Spark expands the sets map-side like cube: still one shuffle keyed by
    * (grouping-set id, keys). */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_discount")).as("disc"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("disc"))
      .orderBy("returnflag", "linestatus")

  /** Variance / stddev / correlation with oracle-exact determinism: the
    * built-in var_samp/corr accumulate doubles in partition order (non-
    * reproducible bit-level), so the moments are assembled from EXACT
    * integer sums — cents as BIGINT, squared cents as a LIMB-SPLIT
    * BIGINT pair ([[Exact.limbDbl]]: cents² ~1e14 × 6e5 rows overflows
    * 2^53 and NO native wide-integer→DOUBLE cast is bit-identical
    * across engines up there) — then one fixed-shape double formula.
    * Same single-shuffle partial-agg plan as any sum. */
  def qStatsExact(s: SparkSession, d: String): DataFrame = {
    val L = Exact.Limb
    val scc = Exact.limbDbl("scc_h", "scc_l")
    lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"),
        sum(col("c")).as("sc"),
        sum(expr(s"(c * c) DIV ${L}L")).as("scc_h"),
        sum(expr(s"(c * c) % ${L}L")).as("scc_l"),
        sum(col("q") * col("c")).as("sqc"))
      .select(col("l_returnflag"), col("n"),
        expr("(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1)")
          .as("var_qty"),
        expr(s"sqrt(($scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1)) / 100.0")
          .as("stddev_price"),
        expr(s"""(n * CAST(sqc AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sc AS DOUBLE)) /
                (sqrt(n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
                 sqrt(n * $scc - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)))""")
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Exact distributed quantiles (discrete median + p90) in histogram
    * two-phase form — the shape that survives skewed group keys: phase 1
    * is a partial-aggregated count per (group, value) whose shuffle volume
    * is |distinct values| per group regardless of row skew (a naive
    * row_number window over the 3-value group key funnels the whole table
    * through 3 tasks); phase 2 runs the cumulative window over the tiny
    * histogram. The quantile picked (smallest value whose cumulative count
    * reaches the position) is identical to row_number selection. */
  def qMedianDisc(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
    val wAll = Window.partitionBy(col("l_returnflag"))
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(expr("cum >= (n + 1) DIV 2"), col("qty"))).as("median_qty"),
        min(when(expr("cum >= (9 * n + 9) DIV 10"), col("qty"))).as("p90_qty"),
        max(col("n")).as("n"))
      .orderBy("l_returnflag")
  }

  /** Continuous (interpolated) percentiles via the built-in `percentile`
    * aggregate — the linear-interpolation twin of [[qMedianDisc]]'s
    * discrete histogram. Both engines implement the standard type-7
    * estimator (pos = p·(n−1), linear between the straddling order
    * statistics), and l_quantity's small-integer domain keeps the
    * interpolated doubles bit-identical. Spark plans this as a
    * partial-aggregatable sort-based percentile per group — fine at a
    * handful of groups; for skew-prone or high-cardinality grouping the
    * histogram form in [[qMedianDisc]] is the scale path. */
  def qPercentileCont(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5D)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9D)").as("p90_qty"),
        expr("percentile(l_quantity, 0.99D)").as("p99_qty"))
      .orderBy("l_returnflag")

  /** NOT IN subquery — the null-aware anti-join shape (distinct from
    * qAntiJoin's NOT EXISTS, which is null-oblivious): one NULL in the
    * subquery result legally empties the output, so Spark plans a
    * null-aware join (broadcast at this dim size). Customers whose nation
    * hosts no negative-balance supplier.
    *
    * SCALE NOTE: the null-aware plan executes as a
    * BroadcastNestedLoopJoin — correct and cheap for a dim-sized subquery,
    * a scale-killer against a fact-sized one (no hash lookup, no shuffle
    * partitioning; every probe row scans the broadcast). When the subquery
    * column's nullability is known (or enforced), use the
    * [[qNotInNotNull]] rewrite instead — it plans a hash anti join. */
  def qNotIn(s: SparkSession, d: String): DataFrame = {
    // NOT IN needs the SQL form — the DataFrame left_anti join is the
    // null-oblivious NOT EXISTS plan, not the null-aware one. The temp
    // views are uniquely named and dropped as soon as the plan is resolved
    // (sql() analyzes eagerly), so no catalog state leaks or clobbers.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val vSupp = s"graft_nk_$tag"
    val vCust = s"graft_cust_$tag"
    supplier(s, d).filter(col("s_acctbal") < 0).select(col("s_nationkey"))
      .createOrReplaceTempView(vSupp)
    customer(s, d).createOrReplaceTempView(vCust)
    try s.sql(
      s"""SELECT c_custkey, c_nationkey FROM $vCust
          WHERE c_nationkey NOT IN (SELECT s_nationkey FROM $vSupp)
          ORDER BY c_custkey""")
    finally {
      s.catalog.dropTempView(vSupp)
      s.catalog.dropTempView(vCust)
    }
  }

  /** The production form of NOT IN for a non-null (or made non-null)
    * subquery side: `IS NOT NULL` filters on BOTH sides + regular
    * left_anti join. NOT IN ≡ anti join only when neither side can produce
    * NULL: a NULL subquery value poisons every membership test, and a NULL
    * probe value evaluates NOT IN to NULL (row dropped) whenever the
    * subquery is non-empty — whereas a bare anti join would KEEP it (NULL
    * key matches nothing). So the rewrite filters NULLs on both sides; the
    * one residual divergence is a NULL probe row against an EMPTY subquery
    * (NOT IN keeps it, this drops it) — acceptable in production where the
    * key is non-null anyway, and exact on TPC-H (both keys non-null). The
    * payoff: Spark plans a broadcast/shuffled HASH anti join, which scales
    * like any equi-join (shuffle on the key, hash probe) instead of
    * qNotIn's nested-loop scan. */
  def qNotInNotNull(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_nationkey").isNotNull)
      .join(
        supplier(s, d)
          .filter(col("s_acctbal") < 0 && col("s_nationkey").isNotNull)
          .select(col("s_nationkey")),
        col("c_nationkey") === col("s_nationkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"))
      .orderBy("c_custkey")

  /** Multiple DISTINCT aggregates in one pass — Catalyst plans this via
    * Expand (one row replica per distinct clause) + two-phase aggregation;
    * the shuffle key stays (group, replica-id), so it scales like any
    * hash aggregation. */
  def qCountDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** FULL OUTER join: nations' premium-customer counts vs discount-supplier
    * counts — either side can be absent (coalesced keys/zeros). */
  def qFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val su = supplier(s, d).filter(col("s_acctbal") < 0)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    c.join(su, Seq("nk"), "full_outer")
      .select(col("nk").as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** CROSS JOIN (explicit cartesian): region × region ordered pairs —
    * tiny × tiny via broadcast NLJ; the operator surface, not a scale
    * pattern. */
  def qCrossJoin(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).select(col("r_name"))
    r.as("a").crossJoin(broadcast(r.as("b")))
      .select(col("a.r_name").as("r1"), col("b.r_name").as("r2"))
      .orderBy("r1", "r2")
  }

  /** Array function family: build, sort, aggregate and serialize arrays
    * per group (output stays scalar so the oracle hash-compares). Sorting
    * the collected list makes collect_list's arrival order irrelevant. */
  def qArrayFns(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .filter(col("s_suppkey") <= 40)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(collect_list(col("s_suppkey")).as("keys"))
      .select(col("nationkey"),
        size(col("keys")).as("n_keys"),
        expr("array_join(array_sort(keys), ',')").as("key_csv"),
        expr("array_max(keys)").as("max_key"),
        expr("array_min(keys)").as("min_key"),
        expr("aggregate(array_sort(keys), 0L, (a, x) -> a + x)").as("key_sum"),
        expr("array_contains(keys, 7L)").as("has_7"))
      .orderBy("nationkey")

  /** Map-typed columns end-to-end: build a region→count map per grouping
    * via map_from_entries, then point-lookup, key/value introspection and
    * a fold over sorted keys. Maps stay intermediate (outputs are scalars)
    * so the oracle hash-compares engine-neutral values; DuckDB replays
    * the map as its own MAP type with the same lookups. */
  def qMapFns(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .groupBy(expr("n_nationkey % 5").as("grp"))
      .agg(expr("map_from_entries(array_sort(collect_list(struct(n_name, n_regionkey))))")
        .as("m"))
      .select(col("grp"),
        size(col("m")).as("n_entries"),
        expr("element_at(m, 'NATION_5')").as("n5_region"),
        expr("array_join(map_keys(m), ',')").as("keys_csv"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("region_sum"))
      .orderBy("grp")

  /** RFM customer segmentation: per customer, recency (last order date),
    * frequency (order count) and monetary (exact total spend), each
    * mapped to a 1–5 quintile score (5 = most recent / most frequent /
    * highest spend, i.e. the oracle's ascending `ntile(5)`), plus the
    * concatenated "rfm" segment string. Every ordering ends on the
    * unique custkey, so bucket assignment is total-order deterministic
    * in both engines.
    *
    * Plan/scale: the per-customer rollup is one partial-agg shuffle on
    * the uniform o_custkey. Each exact quintile is then the
    * [[CorpusOps.curriculum]] bucket decomposition — NOT a
    * single-partition ntile window: a monotone fixed-width binning of
    * the dimension, a bucket-local row_number, and a broadcast
    * prefix-sum base table (catalog-sized: days / distinct counts /
    * $1k spend bins), from which the SQL-spec ntile bucket is computed
    * arithmetically from (global rank, n). Identical output to the
    * oracle's global ntile, but every window is partitioned, so a
    * weeks-of-users RFM at 100 TB never funnels through one task; the
    * three dimension passes reuse one rollup exchange (ReuseExchange —
    * identical subtrees). */
  def qRfm(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val per = orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("spend"))

    // Monotone fixed-width bucket per dimension (equal dims share a
    // bucket, so the bucket-local (dim, custkey) sort is a true
    // refinement of the global order), all three assigned in one narrow
    // projection, with the three bucket-local row_numbers chained on the
    // SAME relation — windows compose without intervening joins.
    val dims = Seq( // (kind, bucket expr, local order column)
      ("r", "datediff(last_order, DATE'1992-01-01')", "last_order"),
      ("f", "n_orders", "n_orders"),
      ("m", "CAST(floor(spend / 1000.0e0) AS BIGINT)", "spend"))
    val withB = dims.foldLeft(per) { case (df, (k, bktE, dim)) =>
      df.withColumn(s"${k}_bkt", expr(bktE))
        .withColumn(s"${k}_lr", row_number().over(
          w.partitionBy(col(s"${k}_bkt"))
            .orderBy(col(dim), col("custkey"))).cast("bigint"))
    }
    // ONE melted aggregation pass builds all three prefix-sum base
    // tables ((kind, bkt) grain, catalog-sized: days / distinct counts /
    // $1k bins), so the rollup subtree appears exactly twice in the plan
    // and its shuffle is reused. Both bases windows partition by kind —
    // nothing in the plan is an unpartitioned window.
    val bases = withB
      .select(explode(expr(
        """array(struct('r' AS kind, r_bkt AS bkt),
                 struct('f' AS kind, f_bkt AS bkt),
                 struct('m' AS kind, m_bkt AS bkt))""")).as("kb"))
      .groupBy(col("kb.kind").as("kind"), col("kb.bkt").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("base", coalesce(
        sum(col("cnt")).over(w.partitionBy(col("kind")).orderBy(col("bkt"))
          .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_tot",
        sum(col("cnt")).over(w.partitionBy(col("kind"))))
      .select(col("kind"), col("bkt"), col("base"), col("n_tot"))

    // SQL-spec ntile from the exact global rank (base + local
    // row_number): the first n%5 buckets take ceil(n/5) rows, the rest
    // floor(n/5) — pure arithmetic, no global sort anywhere.
    def ntile5(rank: String, n: String) =
      s"""CAST(CASE
            WHEN $rank <= ($n % 5) * ($n DIV 5 + 1)
            THEN ($rank - 1) DIV ($n DIV 5 + 1) + 1
            ELSE ($n % 5) +
              ($rank - 1 - ($n % 5) * ($n DIV 5 + 1)) DIV ($n DIV 5) + 1
          END AS INT)"""

    val scored = dims.foldLeft(withB) { case (df, (k, _, _)) =>
      df.join(broadcast(bases.filter(col("kind") === k)
          .select(col("bkt").as(s"${k}_bkt"), col("base").as(s"${k}_base"),
            col("n_tot").as(s"${k}_n"))), s"${k}_bkt")
        .withColumn(s"${k}_score",
          expr(ntile5(s"${k}_base + ${k}_lr", s"${k}_n")))
    }
    scored
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .select("custkey", "last_order", "n_orders", "spend",
        "r_score", "f_score", "m_score", "segment")
      .orderBy("custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_rfm" -> qRfm,
    "q1_agg" -> q1Agg,
    "q_map_fns" -> qMapFns,
    "q3_topk_join" -> q3TopkJoin,
    "q5_star_join" -> q5StarJoin,
    "q_join_broadcast" -> qJoinBroadcast,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_window_rank" -> qWindowRank,
    "q_ntile" -> qNtile,
    "q_window_running" -> qWindowRunning,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_window_dist" -> qWindowDist,
    "q_string_agg" -> qStringAgg,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept,
    "q_except_all" -> qExceptAll,
    "q_intersect_all" -> qIntersectAll,
    "q_topk" -> qTopk,
    "q_string_fns" -> qStringFns,
    "q_date_fns" -> qDateFns,
    "q_math_fns" -> qMathFns,
    "q_case_having" -> qCaseHaving,
    "q_grouping_sets" -> qGroupingSets,
    "q_window_range" -> qWindowRange,
    "q_not_in" -> qNotIn,
    "q_not_in_notnull" -> qNotInNotNull,
    "q_count_distinct" -> qCountDistinct,
    "q_stats_exact" -> qStatsExact,
    "q_median_disc" -> qMedianDisc,
    "q_percentile_cont" -> qPercentileCont,
    "q_full_outer" -> qFullOuter,
    "q_cross_join" -> qCrossJoin,
    "q_array_fns" -> qArrayFns)

  val oracles: Map[String, String] = Map(
    "e_rfm" -> s"""
      WITH per AS (
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS last_order,
               count(*)::BIGINT AS n_orders,
               ${dsumSql("o_totalprice")} AS spend
        FROM orders GROUP BY 1),
      sc AS (
        SELECT *,
               CAST(ntile(5) OVER (ORDER BY last_order, custkey) AS INT)
                 AS r_score,
               CAST(ntile(5) OVER (ORDER BY n_orders, custkey) AS INT)
                 AS f_score,
               CAST(ntile(5) OVER (ORDER BY spend, custkey) AS INT)
                 AS m_score
        FROM per)
      SELECT custkey, last_order, n_orders, spend, r_score, f_score, m_score,
             r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
               AS segment
      FROM sc ORDER BY custkey""",
    "q1_agg" -> s"""
      SELECT l_returnflag, l_linestatus,
             ${dsumSql("l_quantity")} AS sum_qty,
             ${dsumSql("l_extendedprice")} AS sum_base_price,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${davgSql("l_quantity")} AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q3_topk_join" -> s"""
      SELECT l_orderkey, o_orderdate,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_star_join" -> s"""
      SELECT r_name,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY r_name ORDER BY r_name""",
    "q_join_broadcast" -> s"""
      SELECT r_name, n_name, count(*) AS n_suppliers,
             ${dsumSql("s_acctbal")} AS total_bal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey""",
    "q_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey""",
    "q_window_rank" -> """
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_ntile" -> """
      SELECT o_orderpriority, quartile, count(*)::BIGINT AS n_orders,
             min(o_totalprice) AS price_lo, max(o_totalprice) AS price_hi
      FROM (
        SELECT o_orderpriority, o_totalprice,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey)::BIGINT
                 AS quartile
        FROM orders) t
      GROUP BY 1, 2 ORDER BY o_orderpriority, quartile""",
    "q_window_running" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(sum(CAST(o_totalprice AS DECIMAL(22,8)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_total
      FROM orders WHERE o_custkey < 200
      ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "q_rollup" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, ${dsumSql("l_quantity")} AS qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",
    "q_cube" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, ${dsumSql("l_extendedprice")} AS price
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",
    "q_pivot" -> """
      SELECT n_name,
             count(*) FILTER (WHERE r_name = 'AFRICA') AS africa,
             count(*) FILTER (WHERE r_name = 'AMERICA') AS america,
             count(*) FILTER (WHERE r_name = 'ASIA') AS asia,
             count(*) FILTER (WHERE r_name = 'EUROPE') AS europe,
             count(*) FILTER (WHERE r_name = 'MIDDLE EAST') AS middle_east
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY n_name ORDER BY n_name""",
    "q_window_dist" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume,
             ntile(4) OVER w::BIGINT AS quartile
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_totalprice, o_orderkey""",
    "q_unpivot" -> """
      WITH wide AS (
        SELECT n_name,
               count(*) FILTER (WHERE r_name = 'AFRICA')::BIGINT AS africa,
               count(*) FILTER (WHERE r_name = 'AMERICA')::BIGINT AS america,
               count(*) FILTER (WHERE r_name = 'ASIA')::BIGINT AS asia,
               count(*) FILTER (WHERE r_name = 'EUROPE')::BIGINT AS europe,
               count(*) FILTER (WHERE r_name = 'MIDDLE EAST')::BIGINT
                 AS middle_east
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name)
      SELECT n_name, region, n_suppliers
      FROM wide
      UNPIVOT (n_suppliers FOR region
               IN (africa, america, asia, europe, middle_east))
      WHERE n_suppliers > 0
      ORDER BY n_name, region""",
    "q_string_agg" -> """
      SELECT r_name, count(*)::BIGINT AS n_nations,
             string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",
    "q_scalar_subquery" -> s"""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (SELECT ${davgSql("o_totalprice")} FROM orders)
      ORDER BY o_orderkey""",
    "q_intersect" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey""",
    "q_except" -> """
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey""",
    "q_except_all" -> """
      SELECT o_custkey FROM orders
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey""",
    "q_intersect_all" -> """
      SELECT o_custkey FROM orders
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey""",
    "q_topk" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
    "q_string_fns" -> """
      SELECT p_partkey,
             upper(p_name) AS up_name,
             lower(p_brand) AS lo_brand,
             substr(p_type, 1, 5) AS type5,
             CAST(length(p_name) AS INT) AS name_len,
             replace(p_name, ' ', '_') AS snake_name,
             concat_ws('|', p_brand, p_type) AS brand_type,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             reverse(p_brand) AS rev_brand
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "q_date_fns" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(day(o_orderdate) AS INT) AS dom,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
               AS days_to_2002
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
    "q_math_fns" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice, 1) AS rounded,
             abs(l_discount - 0.05) AS abs_diff,
             CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             sqrt(l_quantity) AS qty_sqrt,
             pow(l_tax + 1, 2) AS tax_sq,
             l_orderkey % 7 AS mod7
      FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, l_linenumber""",
    "q_case_having" -> s"""
      SELECT bucket, count(*) AS n, ${dsumSql("o_totalprice")} AS total
      FROM (SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                        WHEN o_totalprice < 200000 THEN 'medium'
                        ELSE 'large' END AS bucket, o_totalprice
            FROM orders) t
      GROUP BY bucket HAVING count(*) > 10 ORDER BY bucket""",
    "q_grouping_sets" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, ${dsumSql("l_discount")} AS disc
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY returnflag, linestatus""",
    "q_not_in" -> """
      SELECT c_custkey, c_nationkey FROM customer
      WHERE c_nationkey NOT IN
        (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
      ORDER BY c_custkey""",
    "q_not_in_notnull" -> """
      SELECT c_custkey, c_nationkey FROM customer
      WHERE c_nationkey NOT IN
        (SELECT s_nationkey FROM supplier
         WHERE s_acctbal < 0 AND s_nationkey IS NOT NULL)
      ORDER BY c_custkey""",
    "q_count_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_window_range" -> """
      WITH t AS (SELECT l_returnflag, l_orderkey, l_linenumber,
                   CAST(l_quantity AS BIGINT) AS qty
                 FROM lineitem WHERE l_orderkey <= 2000)
      SELECT l_returnflag, l_orderkey, l_linenumber, qty,
             count(*) OVER w AS n_within5,
             CAST(sum(qty) OVER w AS BIGINT) AS qty_within5
      FROM t
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY qty
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    "q_stats_exact" -> s"""
      WITH t AS (SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                 FROM lineitem),
      m AS (SELECT l_returnflag, count(*) AS n,
              sum(q) AS sq, sum(q * q) AS sqq,
              sum(c) AS sc,
              sum((c * c) // ${Exact.Limb})::BIGINT AS scc_h,
              sum((c * c) % ${Exact.Limb})::BIGINT AS scc_l,
              sum(q * c) AS sqc
            FROM t GROUP BY 1)
      SELECT l_returnflag, n,
             (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1)
               AS var_qty,
             sqrt((${Exact.limbDblDuck("scc_h", "scc_l")} - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1)) / 100.0
               AS stddev_price,
             (n * CAST(sqc AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sc AS DOUBLE)) /
             (sqrt(n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
              sqrt(n * ${Exact.limbDblDuck("scc_h", "scc_l")} - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)))
               AS corr_qty_price
      FROM m ORDER BY l_returnflag""",
    "q_median_disc" -> """
      WITH t AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                   row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
                 FROM lineitem)
      SELECT l_returnflag,
             max(CASE WHEN rn = (n + 1) // 2 THEN qty END) AS median_qty,
             max(CASE WHEN rn = (9 * n + 9) // 10 THEN qty END) AS p90_qty,
             max(n) AS n
      FROM t GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_map_fns" -> """
      WITH e AS (SELECT n_nationkey % 5 AS grp, n_name, n_regionkey FROM nation),
      m AS (SELECT grp, map(list(n_name ORDER BY n_name),
                            list(n_regionkey ORDER BY n_name)) AS mp
            FROM e GROUP BY grp)
      SELECT grp, cardinality(mp)::INT AS n_entries,
             map_extract(mp, 'NATION_5')[1] AS n5_region,
             array_to_string(map_keys(mp), ',') AS keys_csv,
             list_reduce(list_prepend(0::BIGINT, map_values(mp)),
               (a, x) -> a + x) AS region_sum
      FROM m ORDER BY grp""",
    "q_percentile_cont" -> """
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS p50_qty,
             quantile_cont(l_quantity, 0.9) AS p90_qty,
             quantile_cont(l_quantity, 0.99) AS p99_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_full_outer" -> """
      WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                 FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
            FROM supplier WHERE s_acctbal < 0 GROUP BY 1)
      SELECT coalesce(c.nk, s.nk) AS nationkey,
             coalesce(n_cust, 0) AS n_cust,
             coalesce(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c.nk = s.nk
      ORDER BY nationkey""",
    "q_cross_join" -> """
      SELECT a.r_name AS r1, b.r_name AS r2
      FROM region a CROSS JOIN region b
      ORDER BY r1, r2""",
    "q_array_fns" -> """
      WITH g AS (SELECT s_nationkey AS nationkey, list(s_suppkey) AS keys
                 FROM supplier WHERE s_suppkey <= 40 GROUP BY 1)
      SELECT nationkey,
             CAST(len(keys) AS INT) AS n_keys,
             array_to_string(list_sort(keys), ',') AS key_csv,
             list_max(keys) AS max_key,
             list_min(keys) AS min_key,
             list_reduce(list_prepend(0::BIGINT, list_sort(keys)), (a, x) -> a + x)
               AS key_sum,
             list_contains(keys, 7) AS has_7
      FROM g ORDER BY nationkey""")
}
