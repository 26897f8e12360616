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

  /** Reference StringFunctions.initcap (`StringFunctions.java:82-104`):
    * capitalize after ANY whitespace (Character.isWhitespace — tabs,
    * newlines, CRs), lowercase everything else. Spark's builtin initcap
    * only treats ' ' as a word boundary, so this shadows it. */
  def initcap(s: UTF8String): UTF8String = {
    if (s == null) return null
    val in = s.toString
    val out = new java.lang.StringBuilder(in.length)
    var capNext = true
    var i = 0
    while (i < in.length) {
      val ch = in.charAt(i)
      if (Character.isWhitespace(ch)) { out.append(ch); capNext = true }
      else if (capNext) { out.append(Character.toUpperCase(ch)); capNext = false }
      else out.append(Character.toLowerCase(ch))
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper

  /** Reference StringFunctions.isJson (`StringFunctions.java:920-927`):
    * strict Jackson readTree — trailing commas and truncated documents
    * are false; the empty string parses to MissingNode and is TRUE. */
  def isJson(s: UTF8String): java.lang.Boolean = {
    if (s == null) return java.lang.Boolean.FALSE
    try { jsonMapper.readTree(s.toString); java.lang.Boolean.TRUE }
    catch { case _: Exception => java.lang.Boolean.FALSE }
  }

  /** Reference StringFunctions.splitPart (`StringFunctions.java:502-674`)
    * — splitByWholeSeparator field semantics (leading separators
    * stripped, consecutive collapsed, trailing separators yield ONE
    * empty trailing field), literal "null" on an out-of-range index,
    * negative indices counted from the end, `limit <= 0` = unlimited
    * (the capped last field keeps the raw remainder, delimiters
    * included), and an empty delimiter splits on whitespace runs. */
  def splitPart(input: UTF8String, delim: UTF8String,
      limit: Int, index: Int): UTF8String = {
    if (input == null || delim == null) return null
    val in = input.toString
    val d = delim.toString
    val parts: Array[String] =
      if (d.isEmpty) {
        // commons splitByWholeSeparator(null-ish separator): whitespace
        val t = in.trim
        if (t.isEmpty) Array.empty else t.split("\\s+")
      } else if (in.isEmpty) Array.empty
      else {
        val len = in.length
        val dl = d.length
        val cap = if (limit <= 0) Int.MaxValue else limit
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        while (pos < len && in.startsWith(d, pos)) pos += dl
        if (pos >= len) out += "" // non-empty input of only delimiters
        else {
          var count = 0
          var done = false
          while (!done) {
            count += 1
            if (count == cap) { out += in.substring(pos); done = true }
            else {
              val end = in.indexOf(d, pos)
              if (end < 0) { out += in.substring(pos); done = true }
              else {
                out += in.substring(pos, end)
                pos = end + dl
                while (pos < len && in.startsWith(d, pos)) pos += dl
                if (pos >= len) { out += ""; done = true }
              }
            }
          }
        }
        out.toArray
      }
    val v =
      if (index >= 0 && index < parts.length) parts(index)
      else if (index < 0 && index >= -parts.length) parts(parts.length + index)
      else "null"
    UTF8String.fromString(v)
  }
}
