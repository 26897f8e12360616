package graft.plans

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SUMPRECISION (`SumPrecisionAggregationFunction.java`): exact
  * arbitrary-precision decimal sum. The reference accumulates
  * `java.math.BigDecimal` with no precision cap (its BIG_DECIMAL type
  * is unbounded — fixture values reach 1E+328), which no Spark
  * DecimalType can represent; the result is therefore surfaced as the
  * BigDecimal's plain string form, matching the reference's serialized
  * output. Optional precision/scale arguments round the final value
  * like the reference's `setPrecision`/`setScale` post-processing.
  *
  * Scale: state crossing the shuffle is one BigDecimal per group;
  * addition is exact and associative, so partial/final plans are
  * byte-identical to a single pass.
  */
case class BigDecimalSumAgg(
    child: Expression,
    precision: Option[Int],
    scale: Option[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBigDecimal] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "sumprecision"

  override def createAggregationBuffer(): JBigDecimal = null

  private def toBig(v: Any): JBigDecimal = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case s: UTF8String => new JBigDecimal(s.toString.trim)
    case d: java.lang.Double => JBigDecimal.valueOf(d)
    case f: java.lang.Float => JBigDecimal.valueOf(f.toDouble)
    case n: Number => JBigDecimal.valueOf(n.longValue())
    case other => new JBigDecimal(other.toString)
  }

  override def update(buf: JBigDecimal, row: InternalRow): JBigDecimal = {
    val v = child.eval(row)
    if (v == null) buf
    else {
      val b = toBig(v)
      if (buf == null) b else buf.add(b)
    }
  }

  override def merge(buf: JBigDecimal, other: JBigDecimal): JBigDecimal =
    if (other == null) buf else if (buf == null) other else buf.add(other)

  override def eval(buf: JBigDecimal): Any =
    if (buf == null) null
    else {
      var r = buf
      precision.foreach(p => r = r.round(new MathContext(p)))
      scale.foreach(s => r = r.setScale(s, RoundingMode.HALF_UP))
      UTF8String.fromString(r.toPlainString)
    }

  override def serialize(buf: JBigDecimal): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else buf.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): JBigDecimal =
    if (bytes.isEmpty) null
    else new JBigDecimal(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))

  override def withNewMutableAggBufferOffset(o: Int): BigDecimalSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BigDecimalSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** `CAST(x AS BIG_DECIMAL)` scalar — unbounded precision, surfaced as
  * the plain string form (`BigDecimal.valueOf(double).toPlainString`),
  * since Spark decimals cap at 38 digits. */
case class ToBigDecimalString(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "bigdecimal"
  override protected def nullSafeEval(v: Any): Any = {
    val bd = v match {
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case s: UTF8String => new JBigDecimal(s.toString.trim)
      case d: java.lang.Double => JBigDecimal.valueOf(d)
      case f: java.lang.Float => JBigDecimal.valueOf(f.toDouble)
      case n: Number => JBigDecimal.valueOf(n.longValue())
      case other => new JBigDecimal(other.toString)
    }
    UTF8String.fromString(bd.toPlainString)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
