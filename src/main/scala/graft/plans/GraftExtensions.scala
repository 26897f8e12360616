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
    e.injectResolutionRule(_ => TimestampNumericComparison)
    // hint-resolution batch: must run BEFORE ResolveFunctions, which
    // throws (rather than leaving the node unresolved) on unknown names
    e.injectHintResolutionRule(s => UnderscoreFunctionNames(s))
  }
}

/** Pinot compares TIMESTAMP and numeric columns directly — TIMESTAMP's
  * physical representation IS epoch millis (`DataType.TIMESTAMP`,
  * `TimestampUtils`), so `ts_col = long_col` is a millis comparison.
  * Spark ANSI rejects the mixed comparison; rewrite the TIMESTAMP side
  * to `unix_millis` when compared against an integral type. Filter
  * predicates only, like the reference's predicate evaluators. */
object TimestampNumericComparison extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, UnixMillis}
  import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

  private def integral(e: Expression): Boolean =
    e.resolved && (e.dataType == LongType || e.dataType == IntegerType)
  private def ts(e: Expression): Boolean =
    e.resolved && e.dataType == TimestampType

  // a CAST(integral AS TIMESTAMP) inside the mixed comparison is a
  // Pinot millis value, not Spark's seconds cast — unwrap it so both
  // sides stay in millis (valid Spark queries never reach this rule:
  // ANSI rejects the mixed comparison outright)
  private def millisView(e: Expression): Expression = e match {
    case Cast(inner, TimestampType, _, _) if integral(inner) => inner
    case _ => UnixMillis(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if child.resolved =>
      val newCond = cond.transformUp {
        case c: BinaryComparison if ts(c.left) && integral(c.right) =>
          c.withNewChildren(Seq(millisView(c.left), c.right))
        case c: BinaryComparison if integral(c.left) && ts(c.right) =>
          c.withNewChildren(Seq(c.left, millisView(c.right)))
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}

/** Pinot resolves function names underscore-insensitively
  * (`AggregationFunctionType.getAggregationFunctionType` /
  * `TransformFunctionType.getTransformFunctionType` canonicalize by
  * removing underscores, so `SEGMENT_PARTITIONED_DISTINCT_COUNT` and
  * `segmentPartitionedDistinctCount` are the same function). Spark's
  * registry is spelling-exact; this rule retries an unresolved
  * single-part function name with underscores stripped when that
  * spelling IS registered — giving the whole registered surface the
  * reference's spelling flexibility without enumerating variants. */
final case class UnderscoreFunctionNames(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction

  private def exists(name: String): Boolean =
    spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(name))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case uf: UnresolvedFunction
        if uf.nameParts.size == 1 && uf.nameParts.head.contains("_") &&
          !exists(uf.nameParts.head) && exists(uf.nameParts.head.replace("_", "")) =>
      uf.copy(nameParts = Seq(uf.nameParts.head.replace("_", "")))
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
