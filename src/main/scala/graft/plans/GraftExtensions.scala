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
    e.injectResolutionRule(_ => BooleanNumericSemantics)
    e.injectResolutionRule(_ => OrderByExpressionAlias)
    // dateTrunc-comparison → raw-column range (the reference's
    // TimePredicateFilterOptimizer); operator-optimization batch so the
    // emitted ranges feed the same run's pushdown/unwrap-cast rules
    e.injectOptimizerRule(_ => TimePredicateRewrite)
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

  private def num(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
  private def str(e: Expression): Boolean =
    e.resolved && e.dataType == org.apache.spark.sql.types.StringType

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case c: BinaryComparison if ts(c.left) && integral(c.right) =>
      c.withNewChildren(Seq(millisView(c.left), c.right))
    case c: BinaryComparison if integral(c.left) && ts(c.right) =>
      c.withNewChildren(Seq(c.left, millisView(c.right)))
    // Calcite coerces a string compared to a numeric APPROXIMATELY
    // (double), not ANSI-Spark's integral cast that rejects
    // '1e404'-style decimal strings. Spark's own coercion may have
    // already wrapped the string side in Cast(_, integral) — unwrap.
    case c: BinaryComparison =>
      def strSide(e: Expression): Option[Expression] = e match {
        case Cast(inner, t, _, _)
            if str(inner) && (t == org.apache.spark.sql.types.LongType ||
              t == org.apache.spark.sql.types.IntegerType ||
              t == org.apache.spark.sql.types.ShortType ||
              t == org.apache.spark.sql.types.ByteType) =>
          Some(inner)
        case _ if str(e) => Some(e)
        case _ => None
      }
      val dbl = org.apache.spark.sql.types.DoubleType
      (strSide(c.left), strSide(c.right)) match {
        case (Some(s), None) if num(c.right) =>
          c.withNewChildren(Seq(Cast(s, dbl), Cast(c.right, dbl)))
        case (None, Some(s)) if num(c.left) =>
          c.withNewChildren(Seq(Cast(c.left, dbl), Cast(s, dbl)))
        case _ => c
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if child.resolved =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) f else Filter(newCond, child)
    // the same millis semantics hold for join conditions
    // (`ON t1.ts_col = t2.long_col` — reference TypeCoercion suite)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined && j.left.resolved && j.right.resolved =>
      val newCond = rewrite(j.condition.get)
      if (newCond fastEquals j.condition.get) j
      else j.copy(condition = Some(newCond))
  }
}

/** Pinot stores BOOLEAN as INT and lets it flow through numeric
  * aggregates and comparisons (`PinotDataType.BOOLEAN` toInt/getDouble;
  * `BooleanQueriesTest.java:244-256` — `MAX(booleanColumn)` is a
  * DOUBLE, `HAVING maxBoolean < 1` compares it numerically). Spark
  * types the column BooleanType: MAX/MIN stay boolean, SUM/AVG and
  * numeric comparisons fail analysis. Rewrite the boolean operand to
  * its 0/1 INT view in exactly those numeric contexts; pure-boolean
  * comparisons (`b = false`, bare predicates) are untouched. */
object BooleanNumericSemantics extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate._
  import org.apache.spark.sql.types.{BooleanType, IntegerType, NumericType}

  private def bool(e: Expression): Boolean =
    e.resolved && e.dataType == BooleanType
  private def num(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[NumericType]
  private def asInt(e: Expression): Expression = Cast(e, IntegerType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case c: BinaryComparison if bool(c.left) && num(c.right) =>
          c.withNewChildren(Seq(asInt(c.left), c.right))
        case c: BinaryComparison if num(c.left) && bool(c.right) =>
          c.withNewChildren(Seq(c.left, asInt(c.right)))
        case Max(c) if bool(c) => Max(asInt(c))
        case Min(c) if bool(c) => Min(asInt(c))
        case s @ Sum(c, _) if bool(c) => s.copy(child = asInt(c))
        case a @ Average(c, _) if bool(c) => a.copy(child = asInt(c))
      }
    }
}

/** Calcite (the reference's planner) resolves ORDER BY / sort
  * expressions by matching them against the select list
  * (`SqlValidatorImpl` expandOrderExpr): `GROUP BY upper(c) …
  * ORDER BY upper(c)` orders by the output column even though `c`
  * itself is not visible above the aggregate. Spark resolves sort
  * expressions against child output attributes only, so the repeated
  * expression fails with UNRESOLVED_COLUMN. This rule retargets an
  * unresolved non-trivial sort expression to the child output
  * attribute whose auto-generated alias text matches it. */
object OrderByExpressionAlias extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.plans.logical.Sort

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[`'\"\\s()]", "")

  /** Best-effort text of a (partially) unresolved expression, shaped
    * like Spark's auto-generated output alias for the same expression.
    * A miss only means no rewrite — the query fails exactly as before. */
  private def render(e: Expression): Option[String] =
    try {
      def go(x: Expression): String = x match {
        case a: UnresolvedAttribute => a.name
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          f.nameParts.mkString(".") + "(" +
            f.arguments.map(go).mkString(",") + ")"
        case UnaryMinus(c, _) => "-" + go(c)
        case _ if x.children.isEmpty => x.sql
        case _ => x.prettyName + "(" + x.children.map(go).mkString(",") + ")"
      }
      Some(norm(go(e)))
    } catch { case _: Throwable => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s @ Sort(order, global, child, hint)
        if !s.resolved && child.resolved =>
      val byAlias: Map[String, Attribute] =
        child.output.map(a => norm(a.name) -> a).toMap
      val newOrder = order.map { so =>
        val e = so.child
        val replaceable = !e.resolved && !e.isInstanceOf[UnresolvedAttribute] &&
          e.exists(_.isInstanceOf[UnresolvedAttribute])
        if (!replaceable) so
        else render(e).flatMap(byAlias.get) match {
          case Some(attr) => so.copy(child = attr)
          case None => so
        }
      }
      if (newOrder == order) s else Sort(newOrder, global, child, hint)
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
  /** ∃ element of `arr` satisfying `body(elem)` — a pre-bound
    * higher-order exists (the analyzer leaves an already-bound
    * lambda untouched). */
  private def existsElem(arr: Expression,
      body: Expression => Expression): Expression = {
    val et = elem(arr)
    val x = NamedLambdaVariable("mv_elem", et.elementType, et.containsNull)
    ArrayExists(arr, LambdaFunction(body(x), Seq(x)))
  }

  private def castTo(arr: Expression, v: Expression): Expression =
    Cast(v, elem(arr).elementType)

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
    // RANGE over MV: ONE element must satisfy the WHOLE range
    // (`RangePredicateEvaluator` applyMV: any single value passes the
    // predicate). BETWEEN arrives parsed as GTE ∧ LTE over the same
    // child (possibly via Spark 4's common-expression ref), so the
    // conjunction must fuse into a single exists BEFORE the individual
    // comparisons are rewritten independently — which would accept a
    // doc whose bounds are met by DIFFERENT elements.
    case And(GreaterThanOrEqual(a, lo), LessThanOrEqual(b, hi))
        if isMv(a) && a.fastEquals(b) &&
          lo.resolved && !isMv(lo) && hi.resolved && !isMv(hi) =>
      existsElem(a, x =>
        And(GreaterThanOrEqual(x, castTo(a, lo)),
          LessThanOrEqual(x, castTo(a, hi))))
    case GreaterThan(arr, v) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => GreaterThan(x, castTo(arr, v)))
    case GreaterThanOrEqual(arr, v) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => GreaterThanOrEqual(x, castTo(arr, v)))
    case LessThan(arr, v) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => LessThan(x, castTo(arr, v)))
    case LessThanOrEqual(arr, v) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => LessThanOrEqual(x, castTo(arr, v)))
    // literal-on-the-left forms
    case GreaterThan(v, arr) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => GreaterThan(castTo(arr, v), x))
    case GreaterThanOrEqual(v, arr) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => GreaterThanOrEqual(castTo(arr, v), x))
    case LessThan(v, arr) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => LessThan(castTo(arr, v), x))
    case LessThanOrEqual(v, arr) if isMv(arr) && v.resolved && !isMv(v) =>
      existsElem(arr, x => LessThanOrEqual(castTo(arr, v), x))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if child.resolved =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}
