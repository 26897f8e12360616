package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Session extensions carrying the engine's Pinot-compat analysis rules.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (the
  * Verify/Bench mains and tests do), or via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => MvPredicateRewrite)
  }
}

/** Pinot MV-column exists-semantics (SURVEY §7.5, reference
  * `pinot-core/.../operator/filter/` predicate evaluation over MV
  * forward indexes): a FILTER predicate comparing a multi-value
  * (array-typed) column to a scalar matches when ANY element matches —
  * `mvCol = 5` ⇒ `array_contains(mvCol, 5)`, `mvCol <> 5` ⇒ exists an
  * element ≠ 5. Spark would fail these with a type mismatch, so this
  * resolution rule rewrites them once both sides are resolved. Only
  * FILTER predicates are rewritten (matching the reference, where the
  * semantics exist only in the filter operators).
  */
object MvPredicateRewrite extends Rule[LogicalPlan] {

  private def isMv(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[ArrayType]

  private def elem(arr: Expression): ArrayType =
    arr.dataType.asInstanceOf[ArrayType]

  // transformDown so Not(EqualTo(mv, v)) matches BEFORE its inner
  // EqualTo would be rewritten to array_contains. NOT_EQ over an MV
  // column is EXCLUSIVE in the reference (`Predicate.Type.NOT_EQ`;
  // `BaseDictionaryBasedPredicateEvaluator.applyMV` requires every
  // value to pass): a doc matches only when NO element equals v —
  // i.e. Not(ArrayContains), which the plain negation already gives.
  private def rewrite(cond: Expression): Expression = cond.transformDown {
    case EqualTo(arr, v) if isMv(arr) && v.resolved && !isMv(v) =>
      ArrayContains(arr, Cast(v, elem(arr).elementType))
    case EqualTo(v, arr) if isMv(arr) && v.resolved && !isMv(v) =>
      ArrayContains(arr, Cast(v, elem(arr).elementType))
    case Not(EqualTo(arr, v)) if isMv(arr) && v.resolved && !isMv(v) =>
      // none-equals (Pinot exclusive NOT_EQ over MV)
      Not(ArrayContains(arr, Cast(v, elem(arr).elementType)))
    case In(arr, vs) if isMv(arr) && vs.forall(v => v.resolved && !isMv(v)) =>
      vs.map(v => ArrayContains(arr, Cast(v, elem(arr).elementType))
        .asInstanceOf[Expression]).reduce(Or)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if child.resolved =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}
