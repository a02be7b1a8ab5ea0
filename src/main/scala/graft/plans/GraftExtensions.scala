package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{DotProduct, Hamming64}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,
  * (acc, v) -> acc + v)` — into the whole-stage-codegen
  * [[graft.functions.DotProduct]] kernel. The HOF spelling is how a
  * plain-SQL user writes a dot product; interpreted lambda dispatch per
  * element makes it ~an order of magnitude slower than the native
  * expression (PERF.md's q62 analysis), and this rule lets that user
  * keep the declarative spelling and still get the kernel.
  *
  * Semantics contract: identical on rectangular, non-null-element array
  * pairs — the documented shape of every embedding column in this
  * library. (On malformed input they differ in kind, not value: the HOF
  * propagates a NULL product from ragged zip padding or a null element,
  * the kernel folds over the min prefix. The rule therefore lives in the
  * opt-in [[GraftExtensions]], not in every session.)
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(
                mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                zargs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(
              aa: NamedLambdaVariable, ab: NamedLambdaVariable, _),
              margs, _),
            LambdaFunction(fv: NamedLambdaVariable, Seq(farg), _))
          if isDoubleArray(l) && isDoubleArray(r) &&
            Set(mx.exprId, my.exprId) == zargs.map(_.exprId).toSet &&
            Set(aa.exprId, ab.exprId) == margs.map(_.exprId).toSet &&
            fv.exprId == farg.exprId =>
        DotProduct(l, r)
    }
}

/** The library's `SparkSessionExtensions` hook
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)`): registers the native
  * codegen expressions as SQL functions (`dot_product`, `hamming64`)
  * so `spark.sql` users reach them without the Scala column API, and
  * injects [[DotProductRewrite]] so the HOF spelling optimizes into the
  * kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DotProductRewrite)
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[Hamming64].getName, "hamming64"),
      (children: Seq[Expression]) => Hamming64(children(0), children(1))))
  }
}
