package graft.plans

import graft.functions.DotProductExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the composed dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * into the native [[graft.functions.DotProductExpr]]. Higher-order
  * lambdas evaluate interpreted (one virtual call per element); the native
  * expression is a single compiled loop inside whole-stage codegen —
  * bit-identical output (same left-to-right double accumulation), ~10×
  * faster on wide vectors.
  *
  * Safety gates — the rewrite fires only when it provably preserves
  * semantics:
  *  - both array element types are float/double and NON-NULLABLE
  *    (`containsNull = false`): with a null element the HOF yields null,
  *    while the native loop reads raw slots, so nullable arrays keep the
  *    HOF path;
  *  - the multiply operands are exactly the two lambda variables (modulo a
  *    widening cast to double, which the rewrite re-applies array-level);
  *  - the fold is `0.0 + acc + v` with an identity finish — any other
  *    zero/merge/finish shape is a different fold and is left alone.
  *
  * Injection: cluster-wide via `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.GraftExtensions]] calls `injectOptimizerRule`), or per-session
  * via `spark.experimental.extraOptimizations` (GraftSession.local does
  * this so every query run by Verify/Bench benefits).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def stripCastToDouble(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => c
    case other => other
  }

  /** Is `e` exactly the lambda variable `v` (possibly double-widened)? */
  private def isVar(e: Expression, v: NamedExpression): Boolean =
    stripCastToDouble(e) match {
      case nlv: NamedLambdaVariable => nlv.exprId == v.exprId
      case _ => false
    }

  private def doubleableNonNullArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType | FloatType, containsNull) => !containsNull
    case _ => false
  }

  private def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, false) => e
    case _ => Cast(e, ArrayType(DoubleType, containsNull = false))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(x, y), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(al, ar, _), Seq(acc, v), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
      if doubleableNonNullArray(a) && doubleableNonNullArray(b) &&
        // multiply is x*y in either order (double multiply is commutative bitwise)
        ((isVar(ml, x) && isVar(mr, y)) || (isVar(ml, y) && isVar(mr, x))) &&
        // merge is acc+v in either order (double add is commutative bitwise)
        ((isVar(al, acc) && isVar(ar, v)) || (isVar(al, v) && isVar(ar, acc))) &&
        fin.exprId == facc.exprId =>
      DotProductExpr(toDoubleArray(a), toDoubleArray(b))
  }
}
