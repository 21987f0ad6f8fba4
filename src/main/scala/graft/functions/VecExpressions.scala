package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays, accumulating
  * left-to-right in double — `vec_dot(a, b)`.
  *
  * Why a custom `Expression` (SURVEY.md §7.4 preference order): the
  * per-element formulations both lose at scale — Spark's higher-order
  * functions (`aggregate`/`zip_with`) are evaluated interpreted per row,
  * and a flat 64-term `a[1]*b[1] + ...` chain blows generated methods past
  * Janino's 64KB limit once it appears a few times in one stage (observed:
  * whole-stage codegen fallback on the ANN plans). This compiles to a tight
  * primitive loop inside whole-stage codegen.
  *
  * Semantics: strict left-to-right accumulation starting at 0.0 — the same
  * association order as a sequential fold (`list_reduce` with a prepended
  * 0.0 in DuckDB), so double results are bit-identical to the oracle.
  * Norm-squared is `vec_dot(a, a)`. Array elements must be non-null
  * (embedding vectors / literal weights); a null ARRAY yields NULL.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of numeric type, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case LongType    => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case ShortType   => (a, i) => a.getShort(i).toDouble
    case ByteType    => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val ga = getter(elemType(left))
    val gb = getter(elemType(right))
    val n = a.numElements()
    // A dimension mismatch is always a data bug — fail loudly instead of
    // silently truncating to the shorter vector (a plausible wrong number).
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += ga(a, i) * gb(b, i); i += 1 }
    acc
  }

  private def genGet(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(elemType(left), a, i)} * ${genGet(elemType(right), b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** The fused shingling kernel behind [[Shingles3]] — one static method so
  * generated code calls straight into it from inside whole-stage codegen
  * (the `StaticInvoke` pattern) instead of falling out of the span. */
object ShingleUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** Distinct 3-token shingles of a single-space-tokenized string, in one
    * pass over the bytes. Exactly `array_distinct(transform(sequence(...),
    * i -> concat(tok_i, ' ', tok_i+1, ' ', tok_i+2)))` over
    * `split(text, ' ')`: field-splitting on the 0x20 byte keeps leading /
    * consecutive / trailing empty tokens (Java regex-split with limit −1
    * semantics, incl. `"" → [""]`), so the token stream — and therefore
    * every shingle — is byte-identical to the SQL chain (spec-proven);
    * 0x20 never occurs inside a multi-byte UTF-8 sequence, so byte
    * splitting is codepoint-safe. Distinct keeps first occurrence, like
    * `array_distinct`. */
  def shingles3(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    // field split: n delimiters → n+1 fields
    var nToks = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nToks += 1; i += 1 }
    if (nToks < 3) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](nToks)
    var start = 0
    var t = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        toks(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](nToks * 2)
    var k = 0
    while (k + 2 < nToks) {
      seen.add(UTF8String.concat(toks(k), Space, toks(k + 1), Space, toks(k + 2)))
      k += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native fused shingling — `shingles3(text)`: split on single spaces,
  * emit the distinct 3-token shingles, all in one primitive pass.
  *
  * Why a custom `Expression` (same §7.4 reasoning as [[VecDot]]): the SQL
  * formulation `array_distinct(transform(sequence(1, size(toks) - 2),
  * i -> concat(...)))` evaluates its lambda INTERPRETED per element — per
  * token, per document, on the hottest path the engine has (every member
  * of the pairCounts dedup family starts with this projection). The fused
  * kernel tokenizes, shingles, and dedups in one pass and is invoked as a
  * static call from inside whole-stage codegen. Semantics are proven
  * byte-identical to the SQL chain in OpsSpec (so every DuckDB oracle
  * stays valid unchanged). */
case class Shingles3(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles3(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleUtil.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** Static kernels for [[VecQUnit]] — one per element type so generated
  * code calls a monomorphic primitive loop from inside whole-stage
  * codegen (the [[ShingleUtil]] pattern). */
object VecUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Fused unit-normalize + floor-quantize of a float vector: exactly
    * `transform(a, x -> CAST(floor(scale * (CAST(x AS DOUBLE) /
    * sqrt(vec_dot(a, a)))) AS BIGINT))` — norm-squared accumulated
    * left-to-right in double ([[VecDot]]'s order, = the oracle's
    * sequential fold), each element then one divide, one multiply, one
    * floor. A zero vector returns NULL (the SQL chain's callers filter
    * `nsq > 0` BEFORE quantizing; fused, the zero case must not reach
    * ANSI's NaN→BIGINT cast error). */
  def qunitFloat(a: ArrayData, scale: Double): GenericArrayData = {
    val n = a.numElements()
    var nsq = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; nsq += x * x; i += 1 }
    if (nsq == 0.0) return null
    val norm = Math.sqrt(nsq)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = Math.floor(scale * (a.getFloat(i).toDouble / norm)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Double-element twin of [[qunitFloat]]. */
  def qunitDouble(a: ArrayData, scale: Double): GenericArrayData = {
    val n = a.numElements()
    var nsq = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); nsq += x * x; i += 1 }
    if (nsq == 0.0) return null
    val norm = Math.sqrt(nsq)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = Math.floor(scale * (a.getDouble(i) / norm)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused fixed-point quantization of a float vector: exactly
    * `transform(a, v -> CAST(floor(CAST(v AS DOUBLE) * scale) AS
    * BIGINT))` — one IEEE multiply + floor per element, identical bits
    * to the HOF chain. Finite inputs only (embedding components): a
    * NaN/±Inf element would silently saturate where the ANSI cast
    * raises, so callers own that precondition. */
  /** Kernel of [[graft.functions.PqArgmin]]: K = flat.length/(sub+1)
    * codeword blocks of (c1, components…); returns the j minimizing
    * c1ⱼ − 2·dotⱼ with [[VecDot]]'s left-to-right double accumulation
    * and strict-< first-wins ties (== array_min's lexicographic
    * (dist, code) order, codes being distinct and ascending). */
  def pqArgmin(a: ArrayData, flat: ArrayData, off: Int, sub: Int): Long = {
    val block = sub + 1
    if (off + sub > a.numElements())
      throw new IllegalArgumentException(
        s"pq_argmin: offset + subDim out of range (${off + sub} > " +
          s"${a.numElements()})")
    if (flat.numElements() % block != 0)
      throw new IllegalArgumentException(
        s"pq_argmin: codebook length ${flat.numElements()} is not a " +
          s"multiple of subDim + 1 = $block")
    val k = flat.numElements() / block
    var best = Double.PositiveInfinity
    var bestJ = 0L
    var j = 0
    while (j < k) {
      val base = j * block
      var dot = 0.0
      var i = 0
      while (i < sub) {
        dot += a.getFloat(off + i).toDouble * flat.getDouble(base + 1 + i)
        i += 1
      }
      val d = flat.getDouble(base) - 2.0 * dot
      if (d < best) { best = d; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Second-best twin of [[pqArgmin]]: the code j of the SECOND element
    * in ascending lexicographic (dist, code) order — the multi-probe
    * assignment's second cell. Same fail-loud window/shape checks, same
    * left-to-right double dot, same `c1 − 2·dot` shape; with distinct
    * codes the (dist, code) pairs are totally ordered, so "second" is
    * well-defined and equals `row_number() OVER (ORDER BY d, j) = 2`.
    * Needs ≥ 2 codewords (fail-loud). */
  def pqArgmin2(a: ArrayData, flat: ArrayData, off: Int, sub: Int): Long = {
    val block = sub + 1
    if (off + sub > a.numElements())
      throw new IllegalArgumentException(
        s"pq_argmin2: offset + subDim out of range (${off + sub} > " +
          s"${a.numElements()})")
    if (flat.numElements() % block != 0)
      throw new IllegalArgumentException(
        s"pq_argmin2: codebook length ${flat.numElements()} is not a " +
          s"multiple of subDim + 1 = $block")
    val k = flat.numElements() / block
    if (k < 2)
      throw new IllegalArgumentException(
        s"pq_argmin2: codebook has $k codeword(s); second-best needs >= 2")
    var best = Double.PositiveInfinity
    var bestJ = -1L
    var second = Double.PositiveInfinity
    var secondJ = -1L
    var j = 0
    while (j < k) {
      val base = j * block
      var dot = 0.0
      var i = 0
      while (i < sub) {
        dot += a.getFloat(off + i).toDouble * flat.getDouble(base + 1 + i)
        i += 1
      }
      val d = flat.getDouble(base) - 2.0 * dot
      // lexicographic (d, j): strict-< on d suffices because j ascends
      if (d < best) {
        second = best; secondJ = bestJ
        best = d; bestJ = j
      } else if (d < second) {
        second = d; secondJ = j
      }
      j += 1
    }
    secondJ
  }

  /** Top-k generalization of [[pqArgmin]]/[[pqArgmin2]]: the codes of
    * the `kSel` SMALLEST elements in ascending lexicographic (dist,
    * code) order — the multi-probe assignment's probe set and the IVF
    * query side's NProbe cell selection in ONE tight loop over the same
    * flattened codebook (no K-row scoring materialized, no codegen
    * growth in K). Element p equals
    * `row_number() OVER (ORDER BY d, j) = p + 1` over the scored cells;
    * elements 0/1 equal [[pqArgmin]]/[[pqArgmin2]] by construction
    * (spec-pinned). Same fail-loud window/shape checks as the siblings;
    * requires 1 ≤ kSel ≤ K. Insertion sort into a kSel-sized buffer:
    * kSel is a probe count (single digits) — O(K·kSel) worst case,
    * O(K) in practice (most cells never displace the buffer tail). */
  def pqArgminK(a: ArrayData, flat: ArrayData, off: Int, sub: Int,
      kSel: Int): GenericArrayData = {
    val block = sub + 1
    if (off + sub > a.numElements())
      throw new IllegalArgumentException(
        s"pq_argmink: offset + subDim out of range (${off + sub} > " +
          s"${a.numElements()})")
    if (flat.numElements() % block != 0)
      throw new IllegalArgumentException(
        s"pq_argmink: codebook length ${flat.numElements()} is not a " +
          s"multiple of subDim + 1 = $block")
    val k = flat.numElements() / block
    if (kSel < 1 || kSel > k)
      throw new IllegalArgumentException(
        s"pq_argmink: k = $kSel out of range (codebook has $k codewords)")
    val dists = new Array[Double](kSel)
    val codes = new Array[Long](kSel)
    var filled = 0
    var j = 0
    while (j < k) {
      val base = j * block
      var dot = 0.0
      var i = 0
      while (i < sub) {
        dot += a.getFloat(off + i).toDouble * flat.getDouble(base + 1 + i)
        i += 1
      }
      val d = flat.getDouble(base) - 2.0 * dot
      // strict < everywhere: equal dists keep the earlier (lower) code
      // first — the lexicographic (d, j) order, j ascending
      if (filled < kSel) {
        var pos = filled
        while (pos > 0 && d < dists(pos - 1)) {
          dists(pos) = dists(pos - 1); codes(pos) = codes(pos - 1); pos -= 1
        }
        dists(pos) = d; codes(pos) = j; filled += 1
      } else if (d < dists(kSel - 1)) {
        var pos = kSel - 1
        while (pos > 0 && d < dists(pos - 1)) {
          dists(pos) = dists(pos - 1); codes(pos) = codes(pos - 1); pos -= 1
        }
        dists(pos) = d; codes(pos) = j
      }
      j += 1
    }
    val out = new Array[Any](kSel)
    var p = 0
    while (p < kSel) { out(p) = codes(p); p += 1 }
    new GenericArrayData(out)
  }

  def qfloorFloat(a: ArrayData, scale: Double): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = Math.floor(a.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Double-element twin of [[qfloorFloat]]. */
  def qfloorDouble(a: ArrayData, scale: Double): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = Math.floor(a.getDouble(i) * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused quantize-and-dot: Σᵢ floor(vᵢ·scale) · wᵢ over BIGINT, the
    * exact left-to-right fold of `aggregate(zip_with(transform(a, v ->
    * CAST(floor(CAST(v AS DOUBLE) * scale) AS BIGINT)), w, (x, y) ->
    * x * y), 0L, (acc, t) -> acc + t)` with NO intermediate arrays —
    * integer multiply-adds are associative-exact, so the result is
    * bit-identical to the HOF chain for any accumulation order; the
    * sequential loop also matches ANSI's overflow-free regime (callers
    * keep |terms| ≤ ~2^26, documented at the call sites). */
  def qdotFloat(a: ArrayData, scale: Double, w: ArrayData): Long = {
    val n = a.numElements()
    if (n != w.numElements())
      throw new IllegalArgumentException(
        s"vec_qdot: array length mismatch ($n vs ${w.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.floor(a.getFloat(i).toDouble * scale).toLong * w.getLong(i)
      i += 1
    }
    acc
  }

  /** Double-element twin of [[qdotFloat]]. */
  def qdotDouble(a: ArrayData, scale: Double, w: ArrayData): Long = {
    val n = a.numElements()
    if (n != w.numElements())
      throw new IllegalArgumentException(
        s"vec_qdot: array length mismatch ($n vs ${w.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.floor(a.getDouble(i) * scale).toLong * w.getLong(i)
      i += 1
    }
    acc
  }
}

/** Native fused unit-quantization — `vec_qunit(arr, scale)`: the
  * micro-unit integer coordinates `floor(scale · x/‖x‖)` every
  * exact-ledger embedding op starts from (`s_diversity`,
  * `s_centroid_outliers`), in one primitive pass.
  *
  * Why a custom `Expression` (§7.4, the [[VecDot]]/[[Shingles3]]
  * reasoning): the SQL spelling is a higher-order `transform` whose
  * lambda runs INTERPRETED per element AND drops the projection out of
  * whole-stage codegen — on a 100 TB corpus that is Dim interpreted
  * closure calls per row on a narrow pass that should be a tight loop.
  * Semantics are bit-identical to the SQL chain (spec-proven per
  * element over random vectors), so every DuckDB oracle stays valid
  * unchanged. NULL for a zero vector — callers' `isNotNull` filter is
  * the fused spelling of the old `nsq > 0` gate. */
case class VecQUnit(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_qunit"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double), got ${l.sql}, ${r.sql}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[Double]
    if (isFloat) VecUtil.qunitFloat(arr, sc) else VecUtil.qunitDouble(arr, sc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val m = if (isFloat) "qunitFloat" else "qunitDouble"
      s"""
         |${ev.value} = graft.functions.VecUtil.$m($a, $s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecQUnit =
    copy(left = newLeft, right = newRight)
}

/** Native fused fixed-point quantization — `vec_qfloor(arr, scale)`:
  * the `floor(v·scale)` BIGINT coordinates the exact-Gramian /
  * centroid-drift ledgers start from, in one primitive pass.
  *
  * Why a custom `Expression` (§7.4, the [[VecQUnit]] reasoning): the SQL
  * spelling is a higher-order `transform` whose lambda runs INTERPRETED
  * per element and drops the projection out of whole-stage codegen — the
  * r14 verdict measured that constant as the dominant residual on the
  * hottest vector passes. Bit-identical to the HOF chain (spec-proven
  * per element); the DuckDB oracles stay on `list_transform` unchanged. */
case class VecQFloor(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_qfloor"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, double), got ${l.sql}, ${r.sql}")
    }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[Double]
    if (isFloat) VecUtil.qfloorFloat(arr, sc) else VecUtil.qfloorDouble(arr, sc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) => {
      val m = if (isFloat) "qfloorFloat" else "qfloorDouble"
      s"graft.functions.VecUtil.$m($a, $s)"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecQFloor =
    copy(left = newLeft, right = newRight)
}

/** Native fused quantize-and-dot — `vec_qdot(arr, scale, weights)`:
  * Σ floor(vᵢ·scale)·wᵢ as ONE tight BIGINT loop, no intermediate
  * arrays. The kernel behind the PCA projection pass (`s_pca_project`):
  * the SQL spelling is `aggregate(zip_with(transform(...)))` — three
  * interpreted HOF lambdas AND two materialized 64-element arrays per
  * row on a pass that is otherwise one multiply-add per element.
  * Exact-integer result ⇒ bit-identical to the HOF chain; DuckDB
  * oracles stay on the `list_transform`/`list_reduce` spelling. */
case class VecQDot(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_qdot"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType,
            ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, s, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, double, array<bigint>), " +
          s"got ${a.sql}, ${s.sql}, ${w.sql}")
    }

  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, s: Any, w: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[Double]
    val wts = w.asInstanceOf[ArrayData]
    if (isFloat) VecUtil.qdotFloat(arr, sc, wts)
    else VecUtil.qdotDouble(arr, sc, wts)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s, w) => {
      val m = if (isFloat) "qdotFloat" else "qdotDouble"
      s"graft.functions.VecUtil.$m($a, $s, $w)"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): VecQDot =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native PQ subspace argmin — `pq_argmin(arr, flat, offset, subDim)`:
  * the code j ∈ [0, K) minimizing
  * `flat[j·(subDim+1)] − 2·Σᵢ arr[offset+i]·flat[j·(subDim+1)+1+i]`
  * (ties to the LOWEST j), i.e. the per-subspace codeword assignment of
  * PQ encoding with the K codewords packed as literal
  * (c1ⱼ, componentsⱼ…) blocks. One tight loop per row — no `slice`
  * array materialization, no K named_structs, no struct-ordering
  * comparisons: the SQL spelling
  * `array_min(array(named_struct('dist', c1 - 2*vec_dot(slice(...)),
  * 'code', j), ...)).code` allocates and comparison-walks 2·K objects
  * per subspace per row, which the r15 100× probe measured as the
  * dominant constant of the whole PQ family (s_pq_encode 23s at 200k
  * vectors; the ADC ranking inherits the same cost through the codes
  * relation). Arithmetic is bit-identical to the chain: the same
  * left-to-right double accumulation as [[VecDot]], the same
  * `c1 − 2.0·dot` shape, and strict `<` == `array_min`'s (dist, code)
  * lexicographic tie to the lowest code (property-proven in
  * R15InvariantSpec). Fail-loud like [[VecDot]]: an out-of-range
  * (offset, subDim) window or a codebook whose length is not a
  * multiple of subDim + 1 raises IllegalArgumentException on BOTH
  * ArrayData representations (UnsafeArrayData would otherwise read
  * garbage silently where GenericArrayData throws). */
case class PqArgmin(left: Expression, right: Expression,
    offset: Int, subDim: Int) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_argmin"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _))
          if offset >= 0 && subDim > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>) with " +
          s"offset >= 0 and subDim > 0, got ${l.sql}, ${r.sql}, " +
          s"offset=$offset, subDim=$subDim")
    }

  override def nullSafeEval(a: Any, f: Any): Any =
    VecUtil.pqArgmin(a.asInstanceOf[ArrayData],
      f.asInstanceOf[ArrayData], offset, subDim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, f) =>
      s"graft.functions.VecUtil.pqArgmin($a, $f, $offset, $subDim)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgmin =
    copy(left = newLeft, right = newRight)
}

/** Second-best twin of [[PqArgmin]] — `pq_argmin2(arr, flat, offset,
  * subDim)`: the code of the SECOND element in ascending (dist, code)
  * order, i.e. the multi-probe assignment's second cell
  * (== `row_number() OVER (ORDER BY d, j) = 2` over the scored cells,
  * without materializing the K-row scoring). Same kernel discipline as
  * [[PqArgmin]]: one tight loop, fail-loud window/shape checks on both
  * ArrayData representations, ≥ 2 codewords required. */
case class PqArgmin2(left: Expression, right: Expression,
    offset: Int, subDim: Int) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_argmin2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _))
          if offset >= 0 && subDim > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>) with " +
          s"offset >= 0 and subDim > 0, got ${l.sql}, ${r.sql}, " +
          s"offset=$offset, subDim=$subDim")
    }

  override def nullSafeEval(a: Any, f: Any): Any =
    VecUtil.pqArgmin2(a.asInstanceOf[ArrayData],
      f.asInstanceOf[ArrayData], offset, subDim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, f) =>
      s"graft.functions.VecUtil.pqArgmin2($a, $f, $offset, $subDim)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgmin2 =
    copy(left = newLeft, right = newRight)
}

/** Top-k twin of [[PqArgmin]] — `pq_argmink(arr, flat, offset, subDim,
  * k)`: the codes of the k smallest elements in ascending (dist, code)
  * order as an `array<bigint>`, i.e. the multi-probe assignment's probe
  * set / the IVF query side's NProbe cells without materializing the
  * K-row scoring. Same kernel discipline as the siblings: one tight
  * loop, fail-loud window/shape checks on both ArrayData
  * representations, 1 ≤ k ≤ codewords required. */
case class PqArgminK(left: Expression, right: Expression,
    offset: Int, subDim: Int, kSel: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_argmink"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _))
          if offset >= 0 && subDim > 0 && kSel > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>) with " +
          s"offset >= 0, subDim > 0 and k > 0, got ${l.sql}, ${r.sql}, " +
          s"offset=$offset, subDim=$subDim, k=$kSel")
    }

  override def nullSafeEval(a: Any, f: Any): Any =
    VecUtil.pqArgminK(a.asInstanceOf[ArrayData],
      f.asInstanceOf[ArrayData], offset, subDim, kSel)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, f) =>
      s"graft.functions.VecUtil.pqArgminK($a, $f, $offset, $subDim, $kSel)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgminK =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[CharCounts]] — the [[ShingleUtil]] pattern. */
object TextKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** Count each target character's occurrences in `text` in ONE pass:
    * returns one BIGINT per target, in target order. Targets must be
    * distinct ASCII characters — ASCII bytes in UTF-8 only ever encode
    * that character (continuation bytes are ≥ 0x80), so a byte scan is
    * exact for any text, multibyte or not; a non-ASCII target would
    * need code-point walking and is rejected loudly. */
  def charCounts(text: UTF8String, chars: UTF8String): GenericArrayData = {
    val cb = chars.getBytes
    val lut = new Array[Int](128)
    java.util.Arrays.fill(lut, -1)
    var k = 0
    while (k < cb.length) {
      val c = cb(k)
      if ((c & 0x80) != 0)
        throw new IllegalArgumentException(
          "char_counts: target characters must be ASCII")
      if (lut(c) != -1)
        throw new IllegalArgumentException(
          "char_counts: target characters must be distinct")
      lut(c) = k
      k += 1
    }
    val counts = new Array[Long](cb.length)
    val tb = text.getBytes
    var i = 0
    while (i < tb.length) {
      val b = tb(i)
      if ((b & 0x80) == 0) {
        val idx = lut(b)
        if (idx >= 0) counts(idx) += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(Long.box: Long => Any))
  }
}

/** Native single-pass multi-character counter —
  * `char_counts(text, 'chars')`: one BIGINT per target character, in
  * target order. The kernel behind `t_code_detect`'s syntax-density
  * ledger: the SQL spelling is K `length(text) − length(replace(text,
  * c, ''))` terms, i.e. K full string copies per row per character
  * family — on a 100 TB corpus that is K payload copies on a pass that
  * should read each byte once. This compiles to ONE byte scan with a
  * 128-entry lookup inside whole-stage codegen. Counting is exact
  * integer work, so the DuckDB oracles stay on the replace() spelling
  * unchanged; per-character bit-equality with the SQL chain is
  * property-proven ([[graft.ops.R11ExtendSpec]]). */
case class CharCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(t: Any, c: Any): Any =
    TextKernels.charCounts(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      c.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      s"${ev.value} = graft.functions.TextKernels.charCounts($t, $c);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharCounts =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions: available both as a
  * `SparkSessionExtensions` injection (`spark.sql.extensions=
  * graft.functions.GraftExtensions`) and as an imperative
  * `GraftFunctions.register(spark)` for sessions the engine doesn't build.
  */
object GraftFunctions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))),
    (FunctionIdentifier("shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "shingles3"),
      (children: Seq[Expression]) => Shingles3(children(0))),
    (FunctionIdentifier("vec_qunit"),
      new ExpressionInfo(classOf[VecQUnit].getName, "vec_qunit"),
      (children: Seq[Expression]) => VecQUnit(children(0), children(1))),
    (FunctionIdentifier("vec_qfloor"),
      new ExpressionInfo(classOf[VecQFloor].getName, "vec_qfloor"),
      (children: Seq[Expression]) => VecQFloor(children(0), children(1))),
    (FunctionIdentifier("vec_qdot"),
      new ExpressionInfo(classOf[VecQDot].getName, "vec_qdot"),
      (children: Seq[Expression]) =>
        VecQDot(children(0), children(1), children(2))),
    (FunctionIdentifier("char_counts"),
      new ExpressionInfo(classOf[CharCounts].getName, "char_counts"),
      (children: Seq[Expression]) => CharCounts(children(0), children(1))),
    // offset/subDim are constructor params (the Like-escapeChar shape),
    // so the builder folds the two trailing literals itself — the
    // top_k precedent below
    (FunctionIdentifier("pq_argmin"),
      new ExpressionInfo(classOf[PqArgmin].getName, "pq_argmin"),
      (children: Seq[Expression]) => {
        if (children.size != 4) throw new IllegalArgumentException(
          "pq_argmin requires exactly 4 arguments " +
            s"(arr, flat, offset, subDim), got ${children.size}")
        def intLit(i: Int, what: String): Int = children(i) match {
          case e if e.foldable => e.eval() match {
            case n: java.lang.Integer => n.intValue()
            case n: java.lang.Long if n >= 0 && n <= Int.MaxValue =>
              n.intValue()
            case v => throw new IllegalArgumentException(
              s"pq_argmin: $what must be a non-negative INT literal, got $v")
          }
          case e => throw new IllegalArgumentException(
            s"pq_argmin: $what must be a literal, got $e")
        }
        PqArgmin(children(0), children(1),
          intLit(2, "offset (argument 3)"), intLit(3, "subDim (argument 4)"))
      }),
    (FunctionIdentifier("pq_argmin2"),
      new ExpressionInfo(classOf[PqArgmin2].getName, "pq_argmin2"),
      (children: Seq[Expression]) => {
        if (children.size != 4) throw new IllegalArgumentException(
          "pq_argmin2 requires exactly 4 arguments " +
            s"(arr, flat, offset, subDim), got ${children.size}")
        def intLit(i: Int, what: String): Int = children(i) match {
          case e if e.foldable => e.eval() match {
            case n: java.lang.Integer => n.intValue()
            case n: java.lang.Long if n >= 0 && n <= Int.MaxValue =>
              n.intValue()
            case v => throw new IllegalArgumentException(
              s"pq_argmin2: $what must be a non-negative INT literal, got $v")
          }
          case e => throw new IllegalArgumentException(
            s"pq_argmin2: $what must be a literal, got $e")
        }
        PqArgmin2(children(0), children(1),
          intLit(2, "offset (argument 3)"), intLit(3, "subDim (argument 4)"))
      }),
    (FunctionIdentifier("pq_argmink"),
      new ExpressionInfo(classOf[PqArgminK].getName, "pq_argmink"),
      (children: Seq[Expression]) => {
        if (children.size != 5) throw new IllegalArgumentException(
          "pq_argmink requires exactly 5 arguments " +
            s"(arr, flat, offset, subDim, k), got ${children.size}")
        def intLit(i: Int, what: String): Int = children(i) match {
          case e if e.foldable => e.eval() match {
            case n: java.lang.Integer => n.intValue()
            case n: java.lang.Long if n >= 0 && n <= Int.MaxValue =>
              n.intValue()
            case v => throw new IllegalArgumentException(
              s"pq_argmink: $what must be a non-negative INT literal, got $v")
          }
          case e => throw new IllegalArgumentException(
            s"pq_argmink: $what must be a literal, got $e")
        }
        PqArgminK(children(0), children(1),
          intLit(2, "offset (argument 3)"), intLit(3, "subDim (argument 4)"),
          intLit(4, "k (argument 5)"))
      }),
    // Spark's own bounded top-k aggregate (the engine behind pandas-API
    // nsmallest), surfaced as `top_k(expr, k, reverse)`: each partial
    // buffer holds AT MOST k values (a bounded priority queue), so the
    // exchange ships k rows per map task per group instead of feeding a
    // corpus-sized sort partition to a rank window. reverse=true keeps
    // the k SMALLEST under the child type's natural ordering (struct
    // children compare field-by-field, so (dist, id) ties break to the
    // lowest id — exactly row_number() OVER (ORDER BY dist, id) <= k).
    // Result array order is engine-internal: wrap in array_sort.
    (FunctionIdentifier("top_k"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK]
          .getName, "top_k"),
      (children: Seq[Expression]) => {
        // The registry exposes top_k to arbitrary SQL, so the builder
        // validates arity and both literals explicitly — the
        // companion's own extractors are package-private. Errors here
        // surface as analysis-time failures with the function's name,
        // never an IndexOutOfBounds/NPE from a malformed call.
        if (children.size != 3) throw new IllegalArgumentException(
          s"top_k requires exactly 3 arguments (expr, k, reverse), got ${children.size}")
        def lit(i: Int, what: String): Any = children(i) match {
          case e if e.foldable =>
            val v = e.eval()
            if (v == null) throw new IllegalArgumentException(
              s"top_k: $what must be a non-null literal")
            v
          case e => throw new IllegalArgumentException(
            s"top_k: $what must be a literal, got $e")
        }
        val k = lit(1, "k (argument 2)") match {
          case n: java.lang.Integer => n.intValue()
          // match Long unconditionally so an out-of-range k reports its
          // actual problem, not the catch-all "must be an INT literal"
          case n: java.lang.Long =>
            if (n < 1) throw new IllegalArgumentException( // before intValue
              s"top_k: k must be >= 1, got $n")            // truncates it
            if (n > Int.MaxValue) throw new IllegalArgumentException(
              s"top_k: k must fit in INT (<= ${Int.MaxValue}), got $n")
            n.intValue()
          case other => throw new IllegalArgumentException(
            s"top_k: k must be an INT literal, got $other")
        }
        if (k < 1) throw new IllegalArgumentException(
          s"top_k: k must be >= 1, got $k")
        val rev = lit(2, "reverse (argument 3)") match {
          case b: java.lang.Boolean => b.booleanValue()
          case other => throw new IllegalArgumentException(
            s"top_k: reverse must be a BOOLEAN literal, got $other")
        }
        new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          children(0), k, rev, 0, 0)
      }))

  /** Idempotent: re-registering replaces the previous entry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (name, info, builder) =>
      registry.registerFunction(name, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point injecting the native functions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
