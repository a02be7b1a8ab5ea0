package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen kernel for the fixed-point (quantized) ADC distance
  * fold: Σ (fix(a_i) − fix(b_i))² over two double arrays, where
  * `fix(x) = cast(round(x · scale, 0) as long)` — exactly Spark's
  * `round` on DoubleType (BigDecimal.valueOf → setScale(0, HALF_UP),
  * NaN/Infinity passed through) followed by the non-ANSI double→long
  * cast. Replaces the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> (fix(x)−fix(y))*(fix(x)−fix(y))),
  * 0L, acc + x)` HOF chain in the PQ/ADC paths (guide §4: no interpreted
  * expressions in the hot path). All arithmetic after the per-element
  * rounding is exact integer math with the same wrap semantics as the
  * long fold it replaces, so every oracle value is bit-for-bit unchanged.
  *
  * Equal-length non-null arrays are assumed (every call site slices both
  * sides to the same subspace width); like the fold's zip_with, elements
  * are visited in ascending index order.
  */
case class QuantSqDiffSum(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quant_sq_diff_sum expects array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  private def fix(x: Double): Long = {
    val t = x * scale
    val r =
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) t
      else java.math.BigDecimal.valueOf(t)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    r.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = fix(x.getDouble(i)) - fix(y.getDouble(i))
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val fixFn = ctx.freshName("quantFix")
      ctx.addNewFunction(fixFn,
        s"""
           |private long $fixFn(double x) {
           |  double t = x * ${scale}D;
           |  if (Double.isNaN(t) || Double.isInfinite(t)) return (long) t;
           |  return (long) java.math.BigDecimal.valueOf(t)
           |    .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
           |}
         """.stripMargin)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $fixFn($a.getDouble($i)) - $fixFn($b.getDouble($i));
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantSqDiffSum =
    copy(left = newLeft, right = newRight)
}

object QuantSqDiffSum {
  def column(a: Column, b: Column, scale: Double): Column =
    GraftBridge.column(QuantSqDiffSum(
      GraftBridge.expression(a), GraftBridge.expression(b), scale))
}
