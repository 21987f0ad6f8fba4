package graft.ops

/** Deterministic natural logarithm for cross-engine (Spark ↔ DuckDB)
  * bit-identical arithmetic.
  *
  * `ln()` itself is NOT hash-safe: the JVM's `Math.log` and DuckDB's libm
  * `log` disagree in the last ulp on ~0.2% of inputs (measured on this
  * container: 4/2000 mismatched bit patterns). Information-theoretic
  * operators (entropy, PMI, TF-IDF, LM log-likelihood, PSI drift) need a
  * log both engines compute IDENTICALLY, so this module generates one from
  * primitives that ARE deterministic across engines — IEEE-754 double
  * `+ - * /` in a fixed evaluation order, integer bit ops, and shared
  * decimal literals:
  *
  *   n = m · 2^k   with  k = length(bin(n)) − 1,  m = n / 2^k ∈ [1, 2)
  *   ln(m) = 2·atanh(z),  z = (m−1)/(m+1) ∈ [0, 1/3)
  *   atanh(z) = z · Σ_{j=0..17} z^{2j} / (2j+1)      (fixed-order Horner)
  *   ln(n) = 2·z·horner(z²) + k·ln2                  (ln2 a shared literal)
  *
  * Truncation error ≤ (1/3)^37/37 ≈ 6e-19 relative — below double
  * precision; measured max relative error vs `Math.log` over 1..200000 is
  * 2.2e-16, and the JVM/DuckDB bit patterns agree on ALL of 1..200000
  * ([[graft.ops.DetMathSpec]] re-proves the Spark side against a scalar
  * JVM reference on every CI run).
  *
  * Two sharp edges, learned the hard way:
  *   - A bare decimal literal (`0.333…`) parses as DECIMAL in BOTH engines
  *     and silently switches the arithmetic to exact decimal → different
  *     final doubles. Every literal here is exponent-form (`…e0`), which
  *     both engines type as DOUBLE ([[dlit]]).
  *   - Input must be an integer expression ≥ 1 (counts; callers add-one
  *     smooth where zeros are possible). `bin(0)` would give k=0, m=0 and
  *     a divergent series — garbage, not an error.
  *
  * Scale: everything emitted is a handful of codegen-friendly scalar ops
  * per row — no UDF, no lookup-table join, no driver work. SUMs of these
  * doubles remain order-dependent; aggregating callers must route terms
  * through the scaled-BIGINT pattern ([[Exact.dsum]]-style) as usual.
  */
object DetMath {

  /** Render a double so BOTH engines parse it as a DOUBLE literal:
    * exponent form (`0.3e0`), since bare decimals type as DECIMAL in both
    * Spark and DuckDB and DECIMAL arithmetic rounds differently. The
    * shortest-roundtrip `toString` re-parses to the same double in both
    * engines. */
  def dlit(x: Double): String = {
    val r = x.toString
    if (r.contains('E') || r.contains('e')) r else r + "e0"
  }

  private val Ln2 = dlit(math.log(2.0))

  /** 1/(2j+1) for j = 0..17 — enough terms that the series truncation is
    * below double ulp for z < 1/3 (see object doc). */
  private val Coefs = (0 until 18).map(j => dlit(1.0 / (2 * j + 1)))

  private def horner(t: String): String =
    Coefs.init.foldRight(Coefs.last)((c, acc) => s"(($acc) * $t + $c)")

  /** The five `(alias, expression)` steps computing `ln(n)` into column
    * `<p>_ln`, with intermediates `<p>_k/_m/_z/_t`. Each expression only
    * references earlier aliases, so the sequence works as a Spark
    * `withColumn` chain and as a DuckDB SELECT list with lateral column
    * aliases alike. `n` must be a BIGINT expression ≥ 1; `shift1` is the
    * dialect's `1 << k` fragment. */
  private def steps(n: String, p: String, shift1: String => String): Seq[(String, String)] = Seq(
    s"${p}_k" -> s"length(bin($n)) - 1",
    s"${p}_m" -> s"$n / ${shift1(s"${p}_k")}",
    s"${p}_z" -> s"(${p}_m - 1.0e0) / (${p}_m + 1.0e0)",
    s"${p}_t" -> s"${p}_z * ${p}_z",
    s"${p}_ln" -> s"2.0e0 * ${p}_z * ${horner(s"${p}_t")} + ${p}_k * $Ln2")

  /** Spark dialect: chain with `.withColumn(name, expr(e))`. */
  def lnSpark(n: String, p: String): Seq[(String, String)] =
    steps(n, p, k => s"shiftleft(cast(1 as bigint), $k)")

  /** DuckDB dialect: splice `"$e AS $name"` into one SELECT list (lateral
    * aliases) or a CTE chain. */
  def lnDuck(n: String, p: String): Seq[(String, String)] =
    steps(n, p, k => s"(1::BIGINT << $k)")

  // ---- deterministic exp — same engineering, inverse function ----

  /** 1/j! for j = 0..15 — Taylor for e^r on |r| ≤ ln2/2 ≈ 0.347, where
    * the 16th term is ~4e-19 relative: below double ulp. */
  private val ExpCoefs = (0 until 16).map { j =>
    dlit(1.0 / (1 to j).foldLeft(1L)(_ * _).toDouble)
  }

  private def expHorner(r: String): String =
    ExpCoefs.init.foldRight(ExpCoefs.last)((c, acc) => s"(($acc) * $r + $c)")

  /** The four `(alias, expression)` steps computing `exp(x)` into
    * `<p>_exp` via range reduction x = k·ln2 + r, |r| ≤ ln2/2, then a
    * fixed-order Taylor Horner and an exact 2^k scale. Same determinism
    * argument as the ln steps (IEEE ops in fixed order, shared DOUBLE
    * literals, exact power-of-two scaling); JVM↔DuckDB bit-identical over
    * a 30k-point grid ([[graft.ops.DetMathSpec]]). Domain: |x| < 43
    * (beyond that 2^k needs shifts past 62 bits — far outside any
    * log-prob / perplexity use). `x` must be a DOUBLE expression. */
  private def expSteps(x: String, p: String, shift1: String => String): Seq[(String, String)] = Seq(
    s"${p}_k" -> s"cast(floor($x / $Ln2 + 0.5e0) as bigint)",
    s"${p}_r" -> s"$x - ${p}_k * $Ln2",
    s"${p}_h" -> expHorner(s"${p}_r"),
    s"${p}_exp" -> (s"${p}_h * (CASE WHEN ${p}_k >= 0 " +
      s"THEN cast(${shift1(s"${p}_k")} as double) " +
      s"ELSE 1.0e0 / cast(${shift1(s"(-${p}_k)")} as double) END)"))

  /** Spark dialect exp steps. shiftleft's bit-count operand is INT. */
  def expSpark(x: String, p: String): Seq[(String, String)] =
    expSteps(x, p, k => s"shiftleft(cast(1 as bigint), cast($k as int))")

  /** DuckDB dialect exp steps. */
  def expDuck(x: String, p: String): Seq[(String, String)] =
    expSteps(x, p, k => s"(1::BIGINT << $k)")

  /** The DuckDB exp steps as SELECT-list fragments. */
  def expDuckSelect(x: String, p: String): String =
    expDuck(x, p).map { case (a, e) => s"$e AS $a" }.mkString(",\n             ")

  /** Apply the Spark exp steps to a DataFrame. */
  def withExp(df: org.apache.spark.sql.DataFrame, x: String, p: String): org.apache.spark.sql.DataFrame =
    expSpark(x, p).foldLeft(df) { case (d, (a, e)) =>
      d.withColumn(a, org.apache.spark.sql.functions.expr(e))
    }

  /** The DuckDB steps rendered as SELECT-list fragments: `expr AS alias,
    * …` — append after the caller's own columns. */
  def lnDuckSelect(n: String, p: String): String =
    lnDuck(n, p).map { case (a, e) => s"$e AS $a" }.mkString(",\n             ")

  /** Apply the Spark steps to a DataFrame. */
  def withLn(df: org.apache.spark.sql.DataFrame, n: String, p: String): org.apache.spark.sql.DataFrame =
    lnSpark(n, p).foldLeft(df) { case (d, (a, e)) =>
      d.withColumn(a, org.apache.spark.sql.functions.expr(e))
    }

  /** Drop the four intermediate columns of prefix `p`, keeping `<p>_ln`. */
  def dropLnTmp(df: org.apache.spark.sql.DataFrame, p: String): org.apache.spark.sql.DataFrame =
    df.drop(s"${p}_k", s"${p}_m", s"${p}_z", s"${p}_t")
}
