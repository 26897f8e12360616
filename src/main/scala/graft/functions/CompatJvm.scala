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

  /** Canonical dashed-lowercase UUID form — strict RFC 4122 dashed OR
    * the dash-less 32-hex fallback (`UuidUtils.toBytes(String)`'s
    * hex-bytes path, reference #18927); null when neither. One linear
    * pass where the Column composition needed two rlikes plus a
    * regexp_replace per USE SITE (the uuid scalar family re-embedded
    * that subtree up to 8×, bloating codegen and per-row work). */
  def uuidCanonical(u: UTF8String): UTF8String = {
    if (u == null) return null
    val in = u.toString
    val hex: String =
      if (in.length == 36) {
        if (in.charAt(8) != '-' || in.charAt(13) != '-' ||
            in.charAt(18) != '-' || in.charAt(23) != '-') return null
        val b = new java.lang.StringBuilder(32)
        var i = 0
        while (i < 36) {
          if (i != 8 && i != 13 && i != 18 && i != 23) b.append(in.charAt(i))
          i += 1
        }
        b.toString
      } else if (in.length == 32) in
      else return null
    var i = 0
    while (i < 32) {
      val c = hex.charAt(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
      if (!ok) return null
      i += 1
    }
    val l = hex.toLowerCase
    UTF8String.fromString(l.substring(0, 8) + "-" + l.substring(8, 12) +
      "-" + l.substring(12, 16) + "-" + l.substring(16, 20) + "-" +
      l.substring(20))
  }

  /** Epoch millis from a time-based UUID (UuidUtils.getTimestampMillis,
    * `UuidUtils.java:330-351`): v1 Gregorian 100-ns split across
    * time_low/mid/high, v6 RFC 9562 reordered Gregorian, v7 Unix millis
    * in the top 48 MSB bits; null otherwise (the reference throws). */
  def uuidTimestampMillis(u: UTF8String): java.lang.Long = {
    val c = uuidCanonical(u)
    if (c == null) return null
    val id = java.util.UUID.fromString(c.toString)
    val msb = id.getMostSignificantBits
    def greg(ts100ns: Long): java.lang.Long =
      java.lang.Long.valueOf((ts100ns - 122192928000000000L) / 10000L)
    id.version match {
      case 1 =>
        val ts = ((msb & 0x0FFFL) << 48) | (((msb >>> 16) & 0xFFFFL) << 32) |
          (msb >>> 32)
        greg(ts)
      case 6 =>
        val ts = ((msb >>> 32) << 28) | (((msb >>> 16) & 0xFFFFL) << 12) |
          (msb & 0x0FFFL)
        greg(ts)
      case 7 => java.lang.Long.valueOf(msb >>> 16)
      case _ => null
    }
  }

  /** Reference DateTimePatternHandler.parseDateTimeStringToEpochMillis
    * (`DateTimePatternHandler.java` + DateTimePatternHandlerTest): parse
    * a datetime string with an explicit zone. Contracts pinned by the
    * upstream suite: an explicit offset token in the pattern wins over
    * the zone argument (never double-adjusted); a wall-clock time
    * inside a DST spring-forward gap resolves leniently forward by the
    * gap length (java.time ZonedDateTime gap semantics match joda's
    * convertLocalToUTC(strict=false)); a date-only string lands on the
    * first valid instant of the day (atStartOfDay handles a
    * midnight-gap zone like Cairo 2010-04-30). Parse failures —
    * including out-of-range fields, where the reference throws — yield
    * null under the family-wide column null contract. */
  def fromDateTimeZoned(s: UTF8String, pat: UTF8String,
      zone: UTF8String): java.lang.Long = {
    if (s == null || pat == null) return null
    try {
      val zid = java.time.ZoneId.of(
        if (zone == null) "UTC" else zone.toString)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern(pat.toString, java.util.Locale.ENGLISH)
      val ta = fmt.parse(s.toString)
      import java.time.temporal.ChronoField._
      val millis =
        if (ta.isSupported(INSTANT_SECONDS))
          java.time.Instant.from(ta).toEpochMilli
        else if (ta.isSupported(HOUR_OF_DAY))
          java.time.LocalDateTime.from(ta).atZone(zid).toInstant.toEpochMilli
        else
          java.time.LocalDate.from(ta).atStartOfDay(zid).toInstant.toEpochMilli
      java.lang.Long.valueOf(millis)
    } catch { case _: RuntimeException => null }
  }

  /** Reference DateTimeFunctions.toDateTime(millis, pattern, zone) —
    * format epoch millis as a wall-clock string in the given zone. */
  def toDateTimeZoned(ms: java.lang.Long, pat: UTF8String,
      zone: UTF8String): UTF8String = {
    if (ms == null || pat == null || zone == null) return null
    try UTF8String.fromString(
      java.time.format.DateTimeFormatter
        .ofPattern(pat.toString, java.util.Locale.ENGLISH)
        .withZone(java.time.ZoneId.of(zone.toString))
        .format(java.time.Instant.ofEpochMilli(ms)))
    catch { case _: RuntimeException => null }
  }

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
