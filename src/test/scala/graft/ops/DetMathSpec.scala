package graft.ops

import graft.SparkSpec

/** Proves the Spark side of [[DetMath]]'s determinism contract: the
  * generated SQL expression chain, evaluated by Spark (codegen), produces
  * BIT-IDENTICAL doubles to a scalar JVM reference implementing the same
  * fixed-order arithmetic — over every n in 1..200000. (The DuckDB side of
  * the contract is proven by the oracle hash gate on every query that uses
  * DetMath; this spec pins the Spark↔JVM half so a regression is caught in
  * CI, not at verify time.)
  */
class DetMathSpec extends SparkSpec {

  /** Scalar reference: same decomposition, same literal coefficients, same
    * evaluation order as the generated expression. */
  private def lnRef(n: Long): Double = {
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << k)
    val z = (m - 1.0) / (m + 1.0)
    val t = z * z
    val coefs = (0 until 18).map(j => 1.0 / (2 * j + 1))
    var h = coefs.last
    var j = coefs.length - 2
    while (j >= 0) { h = h * t + coefs(j); j -= 1 }
    2.0 * z * h + k * 0.6931471805599453
  }

  test("lnSpark bit-matches the scalar JVM reference over 1..200000") {
    import spark.implicits._
    val df = spark.range(1, 200001).toDF("n")
    val rows = DetMath.withLn(df, "n", "l")
      .selectExpr("n", "l_ln")
      .collect()
    assert(rows.length == 200000)
    rows.foreach { r =>
      val n = r.getLong(0)
      val got = java.lang.Double.doubleToLongBits(r.getDouble(1))
      val want = java.lang.Double.doubleToLongBits(lnRef(n))
      assert(got == want, s"ln($n): got bits $got want $want")
    }
  }

  test("lnSpark is accurate to ~1 ulp vs Math.log") {
    import spark.implicits._
    val df = spark.range(2, 100001).toDF("n")
    val maxRel = DetMath.withLn(df, "n", "l")
      .selectExpr("max(abs(l_ln - ln(cast(n as double))) / abs(ln(cast(n as double))))")
      .as[Double].head()
    assert(maxRel < 1e-15, s"max relative error $maxRel")
  }

  /** Scalar reference for the exp steps — same fixed order. */
  private def expRef(x: Double): Double = {
    val ln2 = 0.6931471805599453
    val k = math.floor(x / ln2 + 0.5).toLong
    val r = x - k * ln2
    val coefs = (0 until 16).map(j => 1.0 / (1 to j).foldLeft(1L)(_ * _).toDouble)
    var h = coefs.last
    var j = coefs.length - 2
    while (j >= 0) { h = h * r + coefs(j); j -= 1 }
    h * (if (k >= 0) (1L << k).toDouble else 1.0 / (1L << -k))
  }

  test("expSpark bit-matches the scalar JVM reference over [-15, 15]") {
    import spark.implicits._
    val df = spark.range(0, 30001).toDF("i")
      .selectExpr("i", "i / 1000.0e0 - 15.0e0 as x")
    val rows = DetMath.withExp(df, "x", "e")
      .selectExpr("x", "e_exp")
      .collect()
    assert(rows.length == 30001)
    rows.foreach { r =>
      val x = r.getDouble(0)
      val got = java.lang.Double.doubleToLongBits(r.getDouble(1))
      val want = java.lang.Double.doubleToLongBits(expRef(x))
      assert(got == want, s"exp($x): got bits $got want $want")
    }
  }

  test("expSpark is accurate vs Math.exp") {
    import spark.implicits._
    val df = spark.range(0, 30001).toDF("i")
      .selectExpr("i / 1000.0e0 - 15.0e0 as x")
    val maxRel = DetMath.withExp(df, "x", "e")
      .selectExpr("max(abs(e_exp - exp(x)) / exp(x))")
      .as[Double].head()
    assert(maxRel < 1e-14, s"max relative error $maxRel")
  }

  test("spark and duck step chains differ only in the shift fragment") {
    val sp = DetMath.lnSpark("x", "p").toMap
    val du = DetMath.lnDuck("x", "p").toMap
    assert(sp.keySet == du.keySet)
    assert(sp("p_z") == du("p_z") && sp("p_t") == du("p_t") && sp("p_ln") == du("p_ln"))
    assert(sp("p_m") != du("p_m")) // dialect-specific 1<<k
  }
}
