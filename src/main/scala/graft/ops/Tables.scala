package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * Every query-builder takes `(SparkSession, sfDir)` and resolves tables
  * through here so sf0.001/0.01/0.1 are interchangeable.
  */
object Tables {
  /** Pure reader — session configuration (native function registration,
    * excluded optimizer rules, nanos handling) belongs to session
    * construction: [[graft.GraftSession.init]] or
    * `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** Schema-adaptive events reader: the driver has shipped `events.ts` in
    * different physical shapes across testdata generations, and a real
    * engine reads what's there rather than hard-assuming one. Dispatch on
    * the loaded dtype:
    *   - LongType — TIMESTAMP(NANOS) parquet under
    *     `spark.sql.legacy.parquet.nanosAsLong` (GraftSession.init) arrives
    *     as raw nanos; convert with exact integer division (floor), the
    *     same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP.
    *   - TimestampNTZType — TIMESTAMP(MICROS, isAdjustedToUTC=false);
    *     cast to TIMESTAMP under the UTC session, bit-equal to DuckDB's
    *     naive `CAST(ts AS TIMESTAMP)` already present in every oracle.
    *   - TimestampType — already the engine's working type; pass through.
    * Any other dtype fails loudly here (one named error) instead of as
    * dozens of unrelated analysis failures downstream. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (dir=$d); expected " +
          "nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Shared helpers for DuckDB-oracle-exact arithmetic.
  *
  * Double summation is addition-order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's — so any SUM over a double
  * column is routed through an exact DECIMAL accumulator and only cast
  * back to DOUBLE at the end. Both engines then produce bit-identical
  * doubles. (SURVEY.md §7.6 "oracle alignment".)
  */
/** Driver-side md5-derived 60-bit hash — the Scala twin of the engines'
  * shared `conv(substr(md5(x),1,15),16,10)` primitive, for generating
  * deterministic constants (LSH hyperplanes, minhash permutation seeds)
  * that get inlined as literals into both the Spark plan and oracle SQL. */
object Hash60 {
  def apply(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}

/** Vector expression fragments, backed by the native `vec_dot` Catalyst
  * expression (graft.functions.VecDot — registered by Tables.t): a tight
  * codegen'd loop that accumulates left-to-right in double, the same
  * association order as the oracle's sequential `list_reduce` fold, so
  * doubles stay bit-identical. (Both alternatives lose: Spark HOF folds run
  * interpreted per row; flat 64-term chains blow Janino's 64KB method
  * limit and drop the whole stage out of codegen.) */
object Vec {
  val Dim = 64

  def dot(a: String, b: String): String = s"vec_dot($a, $b)"

  def normSq(a: String): String = s"vec_dot($a, $a)"

  /** Dot with a constant integer weight vector. */
  def dotConst(a: String, w: Seq[Long]): String =
    s"vec_dot($a, array(${w.mkString("L, ")}L))"
}

object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** 10^6 — covers expressions with up to 6 decimal places (inputs are
    * 2-dp money values; products like price*(1-disc) have 4). */
  private val Scale = 1000000L

  /** Exact sum of a money-like double expression → double: round to
    * scaled integer micro-units, sum exactly in BIGINT, convert and divide
    * ONCE at the end. A DECIMAL(22,8) accumulator is not enough: Spark
    * rounds double→decimal via the double's string form while DuckDB
    * rounds the exact binary value, and with enough rows the half-way
    * disagreements surface (seen at sf0.1). Here the scaled value is
    * within ~1e-4 of an integer, so `round` is unambiguous in both
    * engines and every later step is exact-integer → identical doubles at
    * any row count. */
  def dsum(c: Column): Column =
    sum(round(c * Scale).cast("long")).cast("double") / Scale.toDouble

  /** Matching oracle-side SQL fragment (sum(BIGINT) is HUGEINT in DuckDB —
    * the explicit DOUBLE cast mirrors Spark's long→double conversion of
    * the same exact integer). */
  def dsumSql(expr: String): String =
    s"(CAST(sum(CAST(round(($expr) * $Scale) AS BIGINT)) AS DOUBLE) / $Scale.0)"

  /** 2^30 — the limb width of the split-sum device below. */
  val Limb = 1073741824L

  /** LIMB-SPLIT exact summation: a Σ of nonnegative BIGINT terms that
    * overflows 2^53 cannot be handed to either engine's native
    * wide-integer→DOUBLE cast — Spark (BigDecimal) and DuckDB (int128)
    * disagree by 1 ulp on rare values (observed at sf0.1 on a ~6·10¹⁹
    * sum of squared cents), and DECIMAL division/`//` in DuckDB routes
    * through DOUBLE, so no decimal-side split is sound either. Instead
    * the SUM itself is carried as two BIGINT accumulators —
    * h = Σ (t DIV 2^30), l = Σ (t % 2^30) — and recombined as
    *   (h + l DIV 2^30) · 2^30 + (l % 2^30)
    * with pure BIGINT ops plus two IEEE ops on identical sub-2^53
    * operands: bit-equal across engines by construction. Bounds: terms
    * t < 2^53 and row count < 2^33 per aggregation group (beyond that,
    * add a third limb). [[limbDbl]] / [[limbDblDuck]] render the
    * recombiner in each dialect (integer division spells DIV / //). */
  def limbDbl(h: String, l: String): String =
    s"""(CAST(($h) + ($l) DIV $Limb AS DOUBLE) * ${Limb}.0e0
         + CAST(($l) % $Limb AS DOUBLE))"""
  def limbDblDuck(h: String, l: String): String =
    s"""(CAST(($h) + ($l) // $Limb AS DOUBLE) * ${Limb}.0e0
         + CAST(($l) % $Limb AS DOUBLE))"""

  /** THREE-limb recombiner for sums whose per-term values outgrow
    * BIGINT: value = h2·2^60 + h1·2^30 + h0 with possibly denormalized
    * BIGINT accumulators (each a sum of bounded nonnegative terms).
    * Normalization (carry h0 into h1, h1 into h2) runs in pure BIGINT;
    * the final Horner chain is three exact sub-2^53 casts plus four
    * IEEE ops evaluated in the same order by both engines. Bounds:
    * normalized h2 < 2^53 (value < 2^113) and every accumulator
    * nonnegative — negative operands break DIV/% parity (Spark
    * truncates, DuckDB floors); see [[negCount]]. */
  def limb3Dbl(h2: String, h1: String, h0: String): String = {
    val c1 = s"(($h1) + ($h0) DIV $Limb)"
    s"""((CAST(($h2) + $c1 DIV $Limb AS DOUBLE) * ${Limb}.0e0
          + CAST($c1 % $Limb AS DOUBLE)) * ${Limb}.0e0
          + CAST(($h0) % $Limb AS DOUBLE))"""
  }
  def limb3DblDuck(h2: String, h1: String, h0: String): String = {
    val c1 = s"(($h1) + ($h0) // $Limb)"
    s"""((CAST(($h2) + $c1 // $Limb AS DOUBLE) * ${Limb}.0e0
          + CAST($c1 % $Limb AS DOUBLE)) * ${Limb}.0e0
          + CAST(($h0) % $Limb AS DOUBLE))"""
  }

  /** Precondition guards for the limb devices. The limb contract
    * requires NONNEGATIVE terms (Spark's DIV truncates toward zero
    * while DuckDB's // floors, so one negative term silently desyncs
    * the bit-exact cross-engine recombination instead of failing) plus
    * caller-specific magnitude envelopes. Callers that rely on data
    * conventions (e.g. TPC-H money columns — a credit/return row would
    * go negative) aggregate a [[negCount]] sentinel beside the limbs
    * and wrap the recombined readout in [[guarded]]/[[guardedDuck]]:
    * the query then THROWS on the offending input in either engine —
    * the same failure surface on both sides — instead of desyncing. */
  def negCount(cond: String): String =
    s"sum(CASE WHEN ($cond) THEN 1 ELSE 0 END)"
  def guarded(cond: String, msg: String, value: String): String =
    s"CASE WHEN ($cond) THEN raise_error('$msg') ELSE ($value) END"
  def guardedDuck(cond: String, msg: String, value: String): String =
    s"CASE WHEN ($cond) THEN error('$msg') ELSE ($value) END"

  /** Exact mean: the exact scaled sum, converted once, divided by count. */
  def davg(c: Column): Column =
    dsum(c) / count(lit(1))

  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / count(*))"
}
