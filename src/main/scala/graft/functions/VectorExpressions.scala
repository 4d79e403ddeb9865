package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native codegen'd vector math over `array<float>` / `array<double>`
 * columns — the ANN hot path. The higher-order-function forms
 * (`aggregate(zip_with(...))`) evaluate an interpreted lambda per element
 * and are excluded from subexpression elimination, so a cosine (three dot
 * products) costs six interpreted array passes per row; these expressions
 * run one fused primitive loop inside whole-stage codegen, no boxing.
 *
 * Semantics intentionally mirror the HOF forms they replace, so scores are
 * bit-identical to the previously validated oracle math:
 *  - accumulate left-to-right in `double` (floats widened per element);
 *  - result is NULL when the arrays differ in length (zip_with pads with
 *    nulls) or any element is null;
 *  - cosine returns 0.0 when either norm is zero.
 */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  @transient protected lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient protected lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java accessor snippet for one element, widened to double. */
  protected def elemJava(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Dot product; one fused loop. */
case class ArrayDot(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += getElem(x, i, leftIsFloat) * getElem(y, i, rightIsFloat)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${elemJava(x, i, leftIsFloat)} * ${elemJava(y, i, rightIsFloat)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity; the three accumulators (x·y, x·x, y·y) run in ONE
 *  fused loop instead of three separate array passes. */
case class ArrayCosine(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def prettyName: String = "array_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = getElem(x, i, leftIsFloat)
      val yv = getElem(y, i, rightIsFloat)
      xy += xv * yv; xx += xv * xv; yy += yv * yv
      i += 1
    }
    val denom = math.sqrt(xx) * math.sqrt(yy)
    if (denom == 0.0) 0.0 else xy / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = ${elemJava(x, i, leftIsFloat)};
         |    double $yv = ${elemJava(y, i, rightIsFloat)};
         |    $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $xy / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}
