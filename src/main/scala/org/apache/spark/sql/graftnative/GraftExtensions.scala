package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the built-ins-only dot-product pattern
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,e) -> acc+e)` into
  * the codegen'd [[DoubleDot]] expression. DoubleDot reproduces the HOF
  * semantics exactly (left-fold order, null elements and unequal lengths
  * => null), so the substitution never changes results — it removes the
  * per-element lambda interpretation that dominates similarity hot loops.
  *
  * Users who write the portable HOF form (e.g. via
  * [[graft.ext.Vectors.dotHof]]) get native speed automatically once the
  * rule is installed — via `spark.sql.extensions=...GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(
            a,
            b,
            LambdaFunction(
              Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable),
              _)),
          Literal(zero: java.lang.Double, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable, el: NamedLambdaVariable, _),
            Seq(macc: NamedLambdaVariable, mel: NamedLambdaVariable),
            _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(ffin: NamedLambdaVariable), _))
        // bit-exact +0.0 check: -0.0 == 0.0 is true but folding from -0.0
        // vs DoubleDot's +0.0 start could flip a negative-zero result
        if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
          mx.exprId == zx.exprId && my.exprId == zy.exprId &&
          acc.exprId == macc.exprId && el.exprId == mel.exprId &&
          fin.exprId == ffin.exprId &&
          isDoubleArray(a) && isDoubleArray(b) =>
      DoubleDot(a, b)
  }
}

/** Session-extensions entry point:
  * `--conf spark.sql.extensions=org.apache.spark.sql.graftnative.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
