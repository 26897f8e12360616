package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM helpers behind `StaticInvoke`-based compat scalars —
  * conversions the reference implements imperatively
  * (`DataTypeConversionFunctions.java`, `BigDecimalUtils.java`,
  * `DateTimeFunctions.ago`). A top-level object compiles with static
  * forwarders, so both codegen and the reflective eval path reach
  * these directly. */
object CompatJvm {

  /** Reference BigDecimalUtils.serialize (`BigDecimalUtils.java:47`):
    * 2 bytes of scale (big-endian, signed) + unscaled BigInteger bytes. */
  def bigDecimalToBytes(d: Decimal): Array[Byte] = {
    if (d == null) return null
    val bd = d.toJavaBigDecimal
    val unscaled = bd.unscaledValue.toByteArray
    val out = new Array[Byte](unscaled.length + 2)
    val scale = bd.scale
    out(0) = ((scale >> 8) & 0xff).toByte
    out(1) = (scale & 0xff).toByte
    System.arraycopy(unscaled, 0, out, 2, unscaled.length)
    out
  }

  /** Reference BigDecimalUtils.deserialize; the result is rescaled to
    * the fixed DecimalType(38, 18) output slot (Spark decimals carry a
    * static scale where the reference's BigDecimal is per-value). */
  def bytesToBigDecimal(b: Array[Byte]): Decimal = {
    if (b == null || b.length < 3) return null
    val scale = (((b(0) << 8) | (b(1) & 0xff)).toShort).toInt
    val unscaled = new BigInteger(java.util.Arrays.copyOfRange(b, 2, b.length))
    val bd = new JBigDecimal(unscaled, scale)
    Decimal(bd.setScale(18, RoundingMode.HALF_UP), 38, 18)
  }

  /** ISO-8601 duration string → millis (reference
    * `DateTimeFunctions.ago`:551 uses `Duration.parse`); null on parse
    * failure instead of throwing (column null contract). */
  def periodMillis(p: UTF8String): java.lang.Long =
    if (p == null) null
    else
      try java.lang.Long.valueOf(java.time.Duration.parse(p.toString).toMillis)
      catch { case _: RuntimeException => null }
}
