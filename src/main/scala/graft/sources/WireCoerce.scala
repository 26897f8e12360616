package graft.sources

import java.math.{BigDecimal => JBigDecimal}
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Shared coercion from a wire-decoded field map (BSON / protobuf /
  * thrift document) to a Spark [[Row]] under an explicit schema — the
  * analog of the reference's DataTypeTransformer, which coerces every
  * RecordExtractor's Java output to the declared column type
  * (`pinot-segment-local/.../recordtransformer/DataTypeTransformer.java`).
  * Missing fields and inconvertible values become null (the reference's
  * null-default path); numeric values widen/narrow numerically. */
object WireCoerce {

  def toRow(fields: collection.Map[String, Any], schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map(f => coerce(fields.getOrElse(f.name, null), f.dataType)))

  def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: Int, IntegerType) => x
    case (x: Long, LongType) => x
    case (x: Double, DoubleType) => x
    case (x: Float, FloatType) => x
    case (x: Boolean, BooleanType) => x
    case (x: String, StringType) => x
    case (x: Array[Byte], BinaryType) => x
    case (x: Timestamp, TimestampType) => x
    case (x: Number, IntegerType) => x.intValue()
    case (x: Number, LongType) => x.longValue()
    case (x: Number, DoubleType) => x.doubleValue()
    case (x: Number, FloatType) => x.floatValue()
    case (x: Number, ShortType) => x.shortValue()
    case (x: Number, ByteType) => x.byteValue()
    case (x: Number, _: DecimalType) => x match {
      case d: JBigDecimal => BigDecimal(d)
      case d: java.math.BigInteger => BigDecimal(d)
      case n => BigDecimal(n.toString)
    }
    case (x: Boolean, IntegerType) => if (x) 1 else 0
    case (x: Timestamp, LongType) => x.getTime
    case (x: Long, TimestampType) => new Timestamp(x)
    case (x, StringType) => x match {
      case bytes: Array[Byte] => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      case other => other.toString
    }
    case (x: Array[_], ArrayType(et, _)) => x.toSeq.map(coerce(_, et))
    case (x: Seq[_], ArrayType(et, _)) => x.map(coerce(_, et))
    case (m: collection.Map[_, _], st: StructType) =>
      toRow(m.asInstanceOf[collection.Map[String, Any]], st)
    case (m: collection.Map[_, _], MapType(_, vt, _)) =>
      m.map { case (k, x) => k.toString -> coerce(x, vt) }
    case (x: String, BooleanType) => x.equalsIgnoreCase("true")
    case (x: String, IntegerType) => x.toIntOption.map(Int.box).orNull
    case (x: String, LongType) => x.toLongOption.map(Long.box).orNull
    case (x: String, DoubleType) => x.toDoubleOption.map(Double.box).orNull
    case _ => null
  }
}
