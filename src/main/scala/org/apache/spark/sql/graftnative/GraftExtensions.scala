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
/** SQL-callable registrations of the native expressions, so `spark.sql`
  * users get them without touching the Scala API. Consumed by
  * [[GraftExtensions]] at session build, or dropped into a live session's
  * registry via [[registerInto]] (e.g. notebook sessions launched without
  * the extensions conf).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (exprs: Seq[Expression]) => SimHash64(exprs.head)),
      (
        FunctionIdentifier("winnow_fingerprints"),
        new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
        (exprs: Seq[Expression]) =>
          WinnowFingerprints(
            exprs(0),
            exprs(1).eval().asInstanceOf[Number].intValue(),
            exprs(2).eval().asInstanceOf[Number].intValue())))

  def registerInto(session: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      session.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectPlannerStrategy(_ => TopKStrategy)
    GraftFunctions.registrations.foreach(e.injectFunction)
  }
}
