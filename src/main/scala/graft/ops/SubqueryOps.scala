package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Exact.{davgSql, dsumSql}

/** Correlated-subquery surface: the classic TPC-H decorrelation shapes
  * (Q2/Q4/Q11/Q15/Q17/Q18/Q22), accepted as SQL and handed to Catalyst —
  * NOT pre-decorrelated by hand into joins. The point of this package is
  * the frontend capability: a user ports correlated analytics SQL
  * verbatim and the optimizer (RewriteCorrelatedScalarSubquery /
  * RewritePredicateSubquery) turns each correlated sub-select into the
  * aggregate-plus-join or semi/anti-join plan a scale-out engine needs —
  * no per-row re-execution of the subquery exists anywhere in Spark's
  * execution model, so these shapes are 100 TB-safe by construction
  * (PlanSpec asserts the decorrelated operators and the absence of
  * cartesian products).
  *
  * Exactness: every money aggregate inside a comparison goes through the
  * [[Exact]] scaled-BIGINT forms, written as SQL text that parses and
  * evaluates bit-identically in Spark and DuckDB, so scalar-subquery
  * thresholds (avg account balance, revenue shares, max revenue) can be
  * compared with `=`/`>` without engine drift. `min`/`max`/integral-
  * valued sums (quantities) are order-independent and need no scaling.
  *
  * Each builder registers per-query temp views (names prefixed `gsq_`)
  * and returns the parsed plan; the oracle runs the SAME query text over
  * DuckDB's direct parquet views, modulo view naming.
  */
object SubqueryOps {

  private def views(s: SparkSession, d: String): Unit = {
    Tables.lineitem(s, d).createOrReplaceTempView("gsq_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("gsq_orders")
    Tables.customer(s, d).createOrReplaceTempView("gsq_customer")
    Tables.supplier(s, d).createOrReplaceTempView("gsq_supplier")
  }

  /** Q2 shape — correlated scalar MIN: lineitems priced at their part's
    * minimum. Catalyst decorrelates to a partial-agg on l_partkey joined
    * back on the uniform part key. */
  private val qCorrMinSql = """
    SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, l.l_extendedprice
    FROM %LI% l
    WHERE l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                               FROM %LI% l2
                               WHERE l2.l_partkey = l.l_partkey)
    ORDER BY l.l_partkey, l.l_orderkey, l.l_linenumber"""

  def qCorrMin(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qCorrMinSql.replace("%LI%", "gsq_lineitem"))
  }

  /** Q4 shape — correlated EXISTS: order-priority counts over orders
    * with at least one line shipped after the order date. Decorrelates
    * to a left semi join on the uniform order key. */
  private val qCorrExistsSql = """
    SELECT o.o_orderpriority, count(*)%CAST% AS n_orders
    FROM %ORD% o
    WHERE EXISTS (SELECT 1 FROM %LI% l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority"""

  def qCorrExists(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qCorrExistsSql.replace("%ORD%", "gsq_orders")
      .replace("%LI%", "gsq_lineitem").replace("%CAST%", ""))
  }

  /** Q18 shape — IN over an aggregated subquery: orders whose total
    * line quantity exceeds 300. The IN becomes a semi join against the
    * HAVING-filtered aggregate (quantities are integral doubles — the
    * sum is exact in both engines). */
  private val qCorrInSql = """
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM %ORD% o
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM %LI%
                           GROUP BY l_orderkey
                           HAVING sum(l_quantity) > 300.0)
    ORDER BY o.o_orderkey"""

  def qCorrIn(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qCorrInSql.replace("%ORD%", "gsq_orders")
      .replace("%LI%", "gsq_lineitem"))
  }

  /** Q17 shape — correlated scalar AVG: lineitems with quantity under
    * half their part's average quantity (the "small parcel" probe).
    * Integral-valued quantities make the correlated avg bit-exact in
    * both engines. */
  private val qCorrAvgSql = """
    SELECT l.l_partkey, l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM %LI% l
    WHERE l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity)
                                FROM %LI% l2
                                WHERE l2.l_partkey = l.l_partkey)
    ORDER BY l.l_partkey, l.l_orderkey, l.l_linenumber"""

  def qCorrAvg(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qCorrAvgSql.replace("%LI%", "gsq_lineitem"))
  }

  /** Q11 shape — HAVING against a global-aggregate scalar subquery:
    * parts whose revenue exceeds 0.1% of total revenue. Both sums ride
    * the exact scaled-BIGINT form, so the share threshold compares
    * bit-identical doubles. */
  private def qShareHavingSql = s"""
    SELECT l_partkey, ${dsumSql("l_extendedprice")} AS revenue
    FROM %LI%
    GROUP BY l_partkey
    HAVING ${dsumSql("l_extendedprice")} >
      0.0008 * (SELECT ${dsumSql("l_extendedprice")} FROM %LI%)
    ORDER BY l_partkey"""

  def qShareHaving(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qShareHavingSql.replace("%LI%", "gsq_lineitem"))
  }

  /** Q15 shape — scalar MAX over a reused aggregate view: the supplier(s)
    * achieving maximum discounted revenue. The CTE is referenced twice;
    * the aggregation exchange is canonically identical on both sides and
    * reused at runtime. Revenue is the exact scaled sum, so `= max` is
    * engine-stable. */
  private def qTopSupplierSql = s"""
    WITH rev AS (
      SELECT l_suppkey,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_rev
      FROM %LI% GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM %SUP% s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s.s_suppkey"""

  def qTopSupplier(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qTopSupplierSql.replace("%LI%", "gsq_lineitem")
      .replace("%SUP%", "gsq_supplier"))
  }

  /** Q22 shape — scalar-subquery threshold + NOT EXISTS anti join:
    * above-average-balance customers with no completed ('F') order,
    * rolled up by nation. The average is the exact scaled form; NOT
    * EXISTS becomes a left anti join on the uniform customer key. */
  private def qRichIdleSql = s"""
    SELECT c.c_nationkey, count(*)%CAST% AS n_cust,
           ${dsumSql("c.c_acctbal")} AS total_bal
    FROM %CUST% c
    WHERE c.c_acctbal > (SELECT ${davgSql("c2.c_acctbal")}
                         FROM %CUST% c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM %ORD% o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey"""

  def qRichIdle(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql(qRichIdleSql.replace("%CUST%", "gsq_customer")
      .replace("%ORD%", "gsq_orders").replace("%CAST%", ""))
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers
    * by account balance per nation — the "top-N per group as the user
    * writes it" frontend. Catalyst's DecorrelateInnerQuery rewrites the
    * per-row LIMIT into a c_nationkey-partitioned row_number window +
    * rank filter under a broadcast join — the exact plan a hand-written
    * top-N-per-group would build, with no per-outer-row re-execution
    * anywhere. Ties break on c_custkey, so the top-2 is total-order
    * deterministic in both engines. */
  private val qLateralTopkSql = """
    SELECT n.n_nationkey, t.c_custkey, t.c_acctbal
    FROM %NAT% n, LATERAL (
      SELECT c_custkey, c_acctbal FROM %CUST% c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    ORDER BY n.n_nationkey, t.c_custkey"""

  def qLateralTopk(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("gsq_nation")
    views(s, d)
    s.sql(qLateralTopkSql.replace("%NAT%", "gsq_nation")
      .replace("%CUST%", "gsq_customer"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lateral_topk" -> qLateralTopk,
    "q_corr_min" -> qCorrMin,
    "q_corr_exists" -> qCorrExists,
    "q_corr_in" -> qCorrIn,
    "q_corr_avg" -> qCorrAvg,
    "q_share_having" -> qShareHaving,
    "q_top_supplier" -> qTopSupplier,
    "q_rich_idle" -> qRichIdle)

  val oracles: Map[String, String] = Map(
    "q_lateral_topk" -> qLateralTopkSql.replace("%NAT%", "nation")
      .replace("%CUST%", "customer"),
    "q_corr_min" -> qCorrMinSql.replace("%LI%", "lineitem"),
    "q_corr_exists" -> qCorrExistsSql.replace("%ORD%", "orders")
      .replace("%LI%", "lineitem").replace("%CAST%", "::BIGINT"),
    "q_corr_in" -> qCorrInSql.replace("%ORD%", "orders")
      .replace("%LI%", "lineitem"),
    "q_corr_avg" -> qCorrAvgSql.replace("%LI%", "lineitem"),
    "q_share_having" -> qShareHavingSql.replace("%LI%", "lineitem"),
    "q_top_supplier" -> qTopSupplierSql.replace("%LI%", "lineitem")
      .replace("%SUP%", "supplier"),
    "q_rich_idle" -> qRichIdleSql.replace("%CUST%", "customer")
      .replace("%ORD%", "orders").replace("%CAST%", "::BIGINT"))
}
