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
      (children: Seq[Expression]) => VecDot(children(0), children(1))))

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
