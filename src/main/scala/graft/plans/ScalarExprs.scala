package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small static-backed scalar expressions for reference functions with
  * iterative cores that plain Catalyst composition can't express:
  * geohash encode/decode (`scalar/GeohashFunctions.java:121-146`),
  * gcd/lcm (`ArithmeticFunctions.java`), string Hamming distance.
  * Each emits a direct static call in `doGenCode`, staying inside
  * whole-stage codegen. */
case class GeoHashEncode(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(lat: Any, lon: Any): Any =
    UTF8String.fromString(graft.functions.GeoAlgos.encodeGeoHash(
      toD(lat), toD(lon), precision))

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case s: org.apache.spark.unsafe.types.UTF8String =>
      java.lang.Double.parseDouble(s.toString)
    case other => throw new IllegalArgumentException(
      s"expected a numeric coordinate, got ${other.getClass.getSimpleName}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""${ev.value} =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        graft.functions.GeoAlgos.encodeGeoHash((double) $a, (double) $b,
          $precision));""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeoHashEncode =
    copy(left = newLeft, right = newRight)
}

/** mode: "lat" | "lon" | "latlon" (array). */
case class GeoHashDecode(child: Expression, mode: String)
    extends UnaryExpression {
  override def dataType: DataType =
    if (mode == "latlon") ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    mode match {
      case "lat" => graft.functions.GeoAlgos.decodeGeoHashLatitude(s)
      case "lon" => graft.functions.GeoAlgos.decodeGeoHashLongitude(s)
      case _ => org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(graft.functions.GeoAlgos.decodeGeoHash(s))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = "graft.functions.GeoAlgos"
    mode match {
      case "lat" => defineCodeGen(ctx, ev,
        c => s"$g.decodeGeoHashLatitude($c.toString())")
      case "lon" => defineCodeGen(ctx, ev,
        c => s"$g.decodeGeoHashLongitude($c.toString())")
      case _ => defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
          s"$g.decodeGeoHash($c.toString()))")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GeoHashDecode =
    copy(child = newChild)
}

/** algo: "gcd" | "lcm" over longs; "hamming" over strings. */
case class BinaryAlgoExpr(left: Expression, right: Expression, algo: String)
    extends BinaryExpression {
  override def dataType: DataType =
    if (algo == "hamming") IntegerType else LongType

  override def nullSafeEval(a: Any, b: Any): Any = algo match {
    case "gcd" => graft.functions.MathAlgos.gcd(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "lcm" => graft.functions.MathAlgos.lcm(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "hamming" => graft.functions.MathAlgos.hammingDistance(
      a.toString, b.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.MathAlgos"
    algo match {
      case "hamming" => defineCodeGen(ctx, ev,
        (a, b) => s"$m.hammingDistance($a.toString(), $b.toString())")
      case x => defineCodeGen(ctx, ev, (a, b) => s"$m.$x($a, $b)")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinaryAlgoExpr =
    copy(left = newLeft, right = newRight)
}

/** Reference `dateTrunc`: epoch millis floored to a calendar unit
  * boundary in an explicit zone (UTC unless given), LONG out — unlike
  * Spark's `date_trunc` (TIMESTAMP out, session zone). */
case class DateTruncEpoch(unit: String, child: Expression, tz: String = "UTC")
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    graft.functions.DateTimeAlgos.dateTruncEpoch(
      unit, input.asInstanceOf[Long], tz)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.DateTimeAlgos.dateTruncEpoch("$unit", $c, "$tz")""")
  override protected def withNewChildInternal(newChild: Expression): DateTruncEpoch =
    copy(child = newChild)
}

/** Type-dispatching epoch view of a column: TIMESTAMP → epoch millis
  * (Pinot's TIMESTAMP physical type IS millis, `DateTimeFunctions`
  * accept either spelling), anything else → LONG as-is. Resolution is
  * deferred until the child's type is known (RuntimeReplaceable), which
  * a FunctionRegistry builder can't do eagerly. */
case class EpochNumeric(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.TimestampType =>
      org.apache.spark.sql.catalyst.expressions.UnixMillis(child)
    // NTZ cannot cast to LONG directly; with the engine's fixed UTC
    // session timezone the TZ reinterpretation is the identity
    case org.apache.spark.sql.types.TimestampNTZType =>
      // explicit zone: the analyzer's ResolveTimeZone does not descend
      // into a RuntimeReplaceable's replacement tree
      org.apache.spark.sql.catalyst.expressions.UnixMillis(
        org.apache.spark.sql.catalyst.expressions.Cast(
          child, org.apache.spark.sql.types.TimestampType, Some("UTC")))
    case _ =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        child, org.apache.spark.sql.types.LongType)
  }
  override protected def withNewChildInternal(newChild: Expression): EpochNumeric =
    copy(child = newChild)
}

object ScalarExprs {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  /** TIMESTAMP → millis, numeric → long (see [[EpochNumeric]]). */
  def epochNumeric(c: Column): Column = col(EpochNumeric(ex(c)))

  def encodeGeoHash(lat: Column, lon: Column, precision: Int): Column =
    col(GeoHashEncode(ex(lat.cast(DoubleType)), ex(lon.cast(DoubleType)),
      precision))

  def decodeGeoHash(h: Column, mode: String): Column =
    col(GeoHashDecode(ex(h), mode))

  def binaryAlgo(a: Column, b: Column, algo: String): Column =
    if (algo == "hamming") col(BinaryAlgoExpr(ex(a), ex(b), algo))
    else col(BinaryAlgoExpr(ex(a.cast(LongType)), ex(b.cast(LongType)), algo))
}
