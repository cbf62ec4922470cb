package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer extension (the `Rule[LogicalPlan]` leg of SURVEY §2.2(c)):
  * rewrite the interpreted higher-order dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * to the codegen'd native [[DotProduct]]. The HOF form is the natural
  * way to WRITE a dot product in DataFrame code, but ArrayAggregate/
  * ZipWith evaluate interpreted (per-element lambda dispatch + an
  * intermediate zipped array); the native expression is a primitive
  * fused loop inside whole-stage codegen. Both accumulate in index
  * order, so the rewrite is bit-exact — v02 runs WITH the rule active
  * and still hash-matches its DuckDB oracle, which is the end-to-end
  * proof.
  *
  * The match is deliberately narrow (literal 0.0 seed, pure x*y zip
  * lambda, pure acc+v merge, identity finish): anything else keeps the
  * built-in path. This is the standard shape for a substitution rule —
  * prove a tiny algebraic island, rewrite only inside it. */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isPureBinary(
      fn: LambdaFunction, mk: (Expression, Expression) => Expression): Boolean =
    fn match {
      case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        body.semanticEquals(mk(x, y)) || body.semanticEquals(mk(y, x))
      case _ => false
    }

  private def isIdentity(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable), _) => body.semanticEquals(x)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, zipFn: LambdaFunction),
            Literal(0.0, DoubleType),
            mergeFn: LambdaFunction,
            finishFn: LambdaFunction)
          if isPureBinary(zipFn, Multiply(_, _))
            && isPureBinary(mergeFn, Add(_, _))
            && isIdentity(finishFn) =>
        DotProduct(a, b)
    }

  /** Session-scoped activation (idempotent); production uses
    * [[graft.plans.GraftPlanExtensions]]. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
}
