package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** The reference's `TimePredicateFilterOptimizer`
  * (`pinot-core/.../query/optimizer/filter/TimePredicateFilterOptimizer.java`):
  * a comparison between `dateTrunc(unit, ts)` and a literal is
  * rewritten to a range on the RAW time column, so the predicate
  * reaches the column's indexes instead of evaluating calendar math
  * per row. Spark re-expression: an operator-optimization rule that
  * inverts [[DateTruncEpoch]] around the literal (driver-side
  * java.time, same calendar the expression itself uses) and emits
  * plain comparisons on the truncation's child — which Spark then
  * pushes into the parquet scan (row-group stats / sorted layouts),
  * and which replaces a per-row ZonedDateTime construction with a
  * codegen'd long comparison even when nothing pushes.
  *
  * The rewrite is POINTWISE EQUIVALENT (both sides NULL on NULL input,
  * equal otherwise, by monotonicity of the floor), so it is safe in
  * any boolean context including NOT. Literal-side alignment follows
  * the reference: `dateTrunc(ts) = unaligned-literal` becomes an empty
  * range `ts >= v AND ts < v` rather than constant FALSE, preserving
  * NULL propagation.
  *
  * Child shapes unwrapped so the emitted range lands on the RAW
  * column (all produced by the `datetrunc` builder in PinotFunctions):
  *   - long columns (identity casts / ×1 input-unit scaling stripped;
  *     other exact positive scalings `raw × k` — the builder's
  *     seconds/minutes/hours/days input units — divide through the
  *     bounds with ceiling division, valid for BOTH ends of a
  *     half-open [lo, hi) range on integers: raw×k ≥ lo ⇔
  *     raw ≥ ⌈lo/k⌉ and raw×k < hi ⇔ raw < ⌈hi/k⌉. Columns whose
  *     scaled value would overflow Long are outside the contract —
  *     the same assumption the reference's optimizer makes. The
  *     3-arg dateTrunc form divides the millis truncation BACK to
  *     input units before comparing — that double-division wrapper
  *     stays un-rewritten: its toward-zero rounding at pre-epoch
  *     values breaks the exact-inversion contract),
  *   - `UnixMillis(tsCol)` → TIMESTAMP literals on tsCol,
  *   - `UnixMillis(Cast(ntzCol, TS, UTC))` → TIMESTAMP_NTZ literals
  *     (fixed-offset zones only — DST overlaps make the local→instant
  *     map non-invertible, so zoned casts keep the unsplit child).
  *
  * `timeConvert` comparisons stay un-rewritten: its builder routes
  * through double division, whose precision loss at large epochs
  * breaks the exact-inversion contract this rule relies on.
  */
object TimePredicateRewrite extends Rule[LogicalPlan] {

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  /** Next boundary strictly after the ALIGNED boundary `b`. */
  private def next(unit: String, b: Long, tz: String): Long = {
    val zdt = java.time.Instant.ofEpochMilli(b)
      .atZone(java.time.ZoneId.of(tz))
    val n = unit.toLowerCase match {
      case "millisecond" => return Math.addExact(b, 1L)
      case "second" => zdt.plusSeconds(1)
      case "minute" => zdt.plusMinutes(1)
      case "hour" => zdt.plusHours(1)
      case "day" => zdt.plusDays(1)
      case "week" => zdt.plusWeeks(1)
      case "month" => zdt.plusMonths(1)
      case "quarter" => zdt.plusMonths(3)
      case "year" => zdt.plusYears(1)
      case other => throw new IllegalArgumentException(other)
    }
    n.toInstant.toEpochMilli
  }

  private def floor(unit: String, v: Long, tz: String): Long =
    graft.functions.DateTimeAlgos.dateTruncEpoch(unit, v, tz)

  /** Smallest boundary ≥ v. */
  private def ceil(unit: String, v: Long, tz: String): Long = {
    val f = floor(unit, v, tz)
    if (f == v) v else next(unit, f, tz)
  }

  /** Smallest boundary > v. */
  private def after(unit: String, v: Long, tz: String): Long =
    next(unit, floor(unit, v, tz), tz)

  /** Millis range [lo, hi) equivalent to `trunc OP v` (trunc on the
    * LEFT). None = comparison kind not handled. */
  private def bounds(cmp: BinaryComparison, unit: String, tz: String,
      v: Long): Option[(Option[Long], Option[Long])] = cmp match {
    case _: EqualTo =>
      val f = floor(unit, v, tz)
      if (f == v) Some((Some(v), Some(next(unit, v, tz))))
      else Some((Some(v), Some(v))) // empty range: FALSE, NULL-preserving
    case _: GreaterThan => Some((Some(after(unit, v, tz)), None))
    case _: GreaterThanOrEqual => Some((Some(ceil(unit, v, tz)), None))
    case _: LessThan => Some((None, Some(ceil(unit, v, tz))))
    case _: LessThanOrEqual => Some((None, Some(after(unit, v, tz))))
    case _ => None
  }

  private def flip(cmp: BinaryComparison): BinaryComparison = cmp match {
    case GreaterThan(l, r) => LessThan(r, l)
    case GreaterThanOrEqual(l, r) => LessThanOrEqual(r, l)
    case LessThan(l, r) => GreaterThan(r, l)
    case LessThanOrEqual(l, r) => GreaterThanOrEqual(r, l)
    case other => other // EqualTo is symmetric
  }

  /** The raw column the range comparisons should land on, plus the
    * millis→literal lift for its type. */
  private def rawOperand(child: Expression)
      : Option[(Expression, Long => Literal)] = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, LongType, _, _) if c.dataType == LongType => strip(c)
      case Multiply(c, Literal(1L, LongType), _) => strip(c)
      case Multiply(c, Literal(1, IntegerType), _) => strip(c)
      case other => other
    }
    def fixedOffset(tz: Option[String]): Boolean =
      tz.forall(z => java.time.ZoneId.of(z)
        .getRules.isFixedOffset)
    strip(child) match {
      case UnixMillis(inner) => inner match {
        case Cast(ntz, TimestampType, tz, _)
            if ntz.dataType == TimestampNTZType && fixedOffset(tz) &&
              tz.forall(z => java.time.ZoneId.of(z).getRules
                .getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0) =>
          Some((ntz, ms =>
            Literal(Math.multiplyExact(ms, 1000L), TimestampNTZType)))
        case ts if ts.dataType == TimestampType =>
          Some((ts, ms =>
            Literal(Math.multiplyExact(ms, 1000L), TimestampType)))
        case _ => None
      }
      // exact positive input-unit scaling (datetrunc's SECONDS/…
      // arms): millisValue = raw × k, so both half-open bounds divide
      // through with CEILING division (see scaladoc). floorDiv-based
      // ceil is sign-correct for pre-epoch (negative) bounds.
      case Multiply(c, lit, _) if c.dataType == LongType &&
          longLit(lit).exists(_ > 0) =>
        val k = longLit(lit).get
        Some((c, ms => Literal(
          Math.floorDiv(Math.addExact(ms, k - 1), k), LongType)))
      case Multiply(lit, c, _) if c.dataType == LongType &&
          longLit(lit).exists(_ > 0) =>
        val k = longLit(lit).get
        Some((c, ms => Literal(
          Math.floorDiv(Math.addExact(ms, k - 1), k), LongType)))
      case e if e.dataType == LongType =>
        Some((e, ms => Literal(ms, LongType)))
      case _ => None
    }
  }

  private def rangePred(cmp: BinaryComparison, unit: String, tz: String,
      child: Expression, v: Long): Option[Expression] =
    try {
      bounds(cmp, unit, tz, v).flatMap { case (lo, hi) =>
        rawOperand(child).map { case (raw, lift) =>
          val parts =
            lo.map(b => GreaterThanOrEqual(raw, lift(b))).toSeq ++
              hi.map(b => LessThan(raw, lift(b)))
          parts.reduceLeft[Expression](And)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cmp @ BinaryComparison(DateTruncEpoch(unit, child, tz), rhs)
          if longLit(rhs).isDefined && child.deterministic =>
        rangePred(cmp, unit, tz, child, longLit(rhs).get).getOrElse(cmp)
      case cmp @ BinaryComparison(lhs, DateTruncEpoch(unit, child, tz))
          if longLit(lhs).isDefined && child.deterministic =>
        val f = flip(cmp)
        rangePred(f, unit, tz, child, longLit(lhs).get).getOrElse(cmp)
      case in @ In(DateTruncEpoch(unit, child, tz), list)
          if list.nonEmpty && list.forall(longLit(_).isDefined) &&
            child.deterministic && list.size <= 64 =>
        val arms = list.flatMap(l =>
          rangePred(EqualTo(child, l), unit, tz, child, longLit(l).get))
        if (arms.size == list.size) arms.reduceLeft[Expression](Or) else in
    }
}
