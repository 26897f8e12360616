package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL / IP / UUID scalar surface (reference `UrlFunctions.java`,
  * `IpAddressFunctions.java`, `scalar/uuid/`).
  *
  * URL extraction is a documented regex subset of RFC 3986 (scheme ://
  * [userinfo@] host [:port] path [?query] [#fragment]) — pure Catalyst
  * regexp expressions, codegen'd, no UDFs. Absent components are null
  * (matching the reference's null-on-invalid contract; the reference
  * returns "" for a present-but-empty component where java.net.URI
  * does — we normalize both to null and document the divergence).
  */
object NetFunctions {

  private val S = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  private def nn(c: Column): Column = nullif(c, lit(""))

  /** Scheme without "://" (reference UrlFunctions.java:42). */
  def urlProtocol(u: Column): Column =
    nn(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Host (reference :56). */
  def urlDomain(u: Column): Column =
    nn(regexp_extract(u, S + "(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Host without a leading "www." (reference :70). */
  def urlDomainWithoutWww(u: Column): Column =
    regexp_replace(urlDomain(u), "^www\\.", "")

  /** Last dot-separated label of the host (reference :88). */
  def urlTopLevelDomain(u: Column): Column =
    nn(regexp_extract(urlDomain(u), "\\.([^.]+)$", 1))

  /** Explicit port or -1 (reference :196 — URI.getPort contract). */
  def urlPort(u: Column): Column =
    coalesce(
      nn(regexp_extract(u, S + "(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)", 1))
        .cast(IntegerType),
      lit(-1))

  /** userinfo@host:port (reference urlNetloc :553). */
  def urlNetloc(u: Column): Column =
    nn(regexp_extract(u, S + "([^/?#]*)", 1))

  /** Path without query/fragment; null when scheme/host invalid
    * (reference :210). */
  def urlPath(u: Column): Column =
    when(urlDomain(u).isNull, lit(null).cast(StringType))
      .otherwise(regexp_extract(u, S + "[^/?#]*([^?#]*)", 1))

  /** Raw query without '?' (reference :247). */
  def urlQueryString(u: Column): Column =
    nn(regexp_extract(u, "\\?([^#]*)", 1))

  /** Fragment without '#' (reference :267). */
  def urlFragment(u: Column): Column =
    nn(regexp_extract(u, "#(.*)$", 1))

  /** First value of a named query parameter (reference
    * extractURLParameter :325). Parameter name must be a literal. */
  def extractUrlParameter(u: Column, name: String): Column =
    nn(regexp_extract(u,
      "[?&]" + java.util.regex.Pattern.quote(name) + "=([^&#]*)", 1))

  // ——— IPv4 numeric conversions (IpAddressFunctions.java:168-195) ———

  def ipv4ToLong(ip: Column): Column =
    aggregate(split(ip, "\\."), lit(0L), (acc, o) => acc * 256 + o.cast(LongType))

  def longToIpv4(v: Column): Column = concat_ws(".",
    (v.cast(LongType) / 16777216 % 256).cast(LongType),
    (v.cast(LongType) / 65536 % 256).cast(LongType),
    (v.cast(LongType) / 256 % 256).cast(LongType),
    (v.cast(LongType) % 256).cast(LongType))

  // ——— UUID scalars (reference scalar/uuid/) ———

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** IsUuidScalarFunction.java:50. */
  def isUuid(u: Column): Column = coalesce(u.rlike(uuidRe), lit(false))

  /** UuidVersionScalarFunction.java — version nibble; -1 if not a UUID. */
  def uuidVersion(u: Column): Column =
    when(isUuid(u), conv(substring(u, 15, 1), 16, 10).cast(IntegerType))
      .otherwise(lit(-1))

  /** UuidToBytesScalarFunction.java — 16-byte binary form. */
  def uuidToBytes(u: Column): Column =
    when(isUuid(u), unhex(regexp_replace(u, "-", "")))
      .otherwise(lit(null).cast(BinaryType))

  /** UuidConversionFunctions.bytesToUuid — canonical lowercase form. */
  def bytesToUuid(b: Column): Column = {
    val h = lower(hex(b))
    when(length(b) === 16, concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12)))
      .otherwise(lit(null).cast(StringType))
  }

  /** UuidTimestampScalarFunction.java:38 — epoch millis from a v1 UUID
    * (100-ns Gregorian intervals re-based to Unix epoch), null otherwise. */
  def uuidTimestamp(u: Column): Column = {
    val ts100ns = conv(concat(
      substring(u, 16, 3),   // time_hi (low 12 bits of group 3)
      substring(u, 10, 4),   // time_mid
      substring(u, 1, 8)),   // time_low
      16, 10).cast(LongType)
    when(uuidVersion(u) === 1,
      // integral `div` truncates toward zero (Java long division) —
      // matches the reference's long arithmetic for pre-epoch values
      call_function("div", ts100ns - lit(122192928000000000L), lit(10000L)))
      .otherwise(lit(null).cast(LongType))
  }
}

/** Pure-JVM IP parsing shared by eval and codegen — handles IPv4 and
  * IPv6 (:: compression, embedded IPv4 tail) without java.net.InetAddress
  * (whose getByName can trigger DNS lookups on malformed input).
  * A top-level Scala object compiles with static forwarders, so
  * generated Java can call `graft.functions.IpHelper.isSubnetOf(...)`
  * directly. */
object IpHelper {

  /** Parse an IP to its 4- or 16-byte form, null if invalid. */
  def parse(s: String): Array[Byte] = {
    if (s == null || s.isEmpty) return null
    if (s.indexOf(':') < 0) parseV4(s) else parseV6(s)
  }

  private def parseV4(s: String): Array[Byte] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return null
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
      val v = p.toInt
      if (v > 255) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  private def parseV6(s: String): Array[Byte] = {
    // optional embedded IPv4 tail ("::ffff:1.2.3.4")
    var body = s
    var tail: Array[Byte] = null
    val lastColon = body.lastIndexOf(':')
    if (lastColon >= 0 && body.indexOf('.', lastColon) > 0) {
      tail = parseV4(body.substring(lastColon + 1))
      if (tail == null) return null
      body = body.substring(0, lastColon + 1) // keep the colon
      if (!body.endsWith("::")) body = body.dropRight(1)
    }
    val dbl = body.indexOf("::")
    if (dbl != body.lastIndexOf("::")) return null // at most one '::'
    def groups(part: String): Array[Int] = {
      if (part.isEmpty) return Array.empty
      val gs = part.split(":", -1)
      val out = new Array[Int](gs.length)
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        if (g.isEmpty || g.length > 4 ||
          !g.forall(c => Character.digit(c, 16) >= 0)) return null
        out(i) = Integer.parseInt(g, 16)
        i += 1
      }
      out
    }
    val tailGroups = if (tail == null) 0 else 2
    val full: Array[Int] =
      if (dbl < 0) {
        val g = groups(body)
        if (g == null || g.length + tailGroups != 8) return null
        g
      } else {
        val left = groups(body.substring(0, dbl))
        val right = groups(body.substring(dbl + 2))
        if (left == null || right == null) return null
        val miss = 8 - tailGroups - left.length - right.length
        if (miss < 0) return null
        left ++ Array.fill(miss)(0) ++ right
      }
    val out = new Array[Byte](16)
    var i = 0
    while (i < full.length) {
      out(2 * i) = (full(i) >> 8).toByte
      out(2 * i + 1) = (full(i) & 0xFF).toByte
      i += 1
    }
    if (tail != null) System.arraycopy(tail, 0, out, 12, 4)
    out
  }

  /** Reference IpAddressFunctions.isSubnetOf(ipPrefix, ipAddress):
    * CIDR containment; false on any parse failure or family mismatch. */
  def isSubnetOf(cidr: UTF8String, ip: UTF8String): Boolean = {
    if (cidr == null || ip == null) return false
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return false
    val base = parse(c.substring(0, slash))
    val addr = parse(ip.toString)
    if (base == null || addr == null || base.length != addr.length) return false
    val bits =
      try c.substring(slash + 1).toInt
      catch { case _: NumberFormatException => return false }
    if (bits < 0 || bits > base.length * 8) return false
    var i = 0
    var remaining = bits
    while (remaining >= 8) {
      if (base(i) != addr(i)) return false
      i += 1; remaining -= 8
    }
    if (remaining == 0) return true
    val mask = (0xFF << (8 - remaining)) & 0xFF
    (base(i) & mask) == (addr(i) & mask)
  }

  def isIpv4(s: UTF8String): Boolean =
    s != null && s.toString.indexOf(':') < 0 && parse(s.toString) != null

  def isIpv6(s: UTF8String): Boolean =
    s != null && s.toString.indexOf(':') >= 0 && parse(s.toString) != null
}

/** isSubnetOf(cidrPrefix, address) over IPv4 + IPv6 — a native Catalyst
  * expression whose codegen calls the static [[IpHelper]] (stays inside
  * whole-stage codegen; no UDF serialization). */
case class IpIsSubnetOf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_subnet_of"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(c: Any, i: Any): Any =
    IpHelper.isSubnetOf(c.asInstanceOf[UTF8String], i.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, i) => s"graft.functions.IpHelper.isSubnetOf($c, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
