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
    // URI.getScheme semantics: everything before the first ':' —
    // scheme-only URIs (mailto:, tel:, magnet:) have no "//"
    // (UrlFunctionsTest golds)
    nn(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))

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

  /** userinfo@host:port (reference urlNetloc :553-585): null only when
    * URI PARSING fails (a scheme with an empty authority, "http://");
    * a scheme-less string parses as a relative URI with no authority
    * and yields "" — so urlNetloc('random') is "", not null. */
  def urlNetloc(u: Column): Column =
    when(u.rlike(S + "$"), lit(null).cast(StringType))
      .when(u.rlike(S), regexp_extract(u, S + "([^/?#]*)", 1))
      .when(u.isNotNull, lit(""))

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
  /** First value of a named query parameter. NEVER null: a missing
    * parameter, a bare `name` without '=', and a null url all return
    * "" (UrlFunctions.java:325-347). */
  def extractUrlParameter(u: Column, name: String): Column =
    coalesce(regexp_extract(u,
      "[?&]" + java.util.regex.Pattern.quote(name) +
        "(?:=([^&#]*))?(?=[&#]|$)", 1), lit(""))

  // ——— IPv4 numeric conversions (IpAddressFunctions.java:168-195) ———

  def ipv4ToLong(ip: Column): Column =
    aggregate(split(ip, "\\."), lit(0L), (acc, o) => acc * 256 + o.cast(LongType))

  def longToIpv4(v: Column): Column = concat_ws(".",
    (v.cast(LongType) / 16777216 % 256).cast(LongType),
    (v.cast(LongType) / 65536 % 256).cast(LongType),
    (v.cast(LongType) / 256 % 256).cast(LongType),
    (v.cast(LongType) % 256).cast(LongType))

  // ——— UUID scalars (reference scalar/uuid/) ———

  /** Canonical dashed-lowercase form of a UUID string: the strict RFC
    * 4122 dashed form OR the dash-less 32-hex fallback
    * (`UuidUtils.toBytes(String)`'s hex-bytes path, reference #18927);
    * null when neither. A single StaticInvoke node — the Column
    * composition this replaces embedded two rlikes + a regexp_replace
    * per use site and the uuid family re-embeds it heavily. */
  def uuidCanonical(u: Column): Column =
    CompatAliases.jvmCall("uuidCanonical", StringType, u)

  /** IsUuidScalarFunction.java:50 — dashed or dash-less hex form. */
  def isUuid(u: Column): Column = coalesce(uuidCanonical(u).isNotNull, lit(false))

  /** UuidVersionScalarFunction.java — version nibble; -1 if not a UUID. */
  def uuidVersion(u: Column): Column =
    when(isUuid(u),
      conv(substring(uuidCanonical(u), 15, 1), 16, 10).cast(IntegerType))
      .otherwise(lit(-1))

  /** UuidToBytesScalarFunction.java — 16-byte binary form. */
  def uuidToBytes(u: Column): Column =
    when(isUuid(u), unhex(regexp_replace(uuidCanonical(u), "-", "")))
      .otherwise(lit(null).cast(BinaryType))

  /** UuidConversionFunctions.bytesToUuid — canonical lowercase form. */
  def bytesToUuid(b: Column): Column = {
    val h = lower(hex(b))
    when(length(b) === 16, concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12)))
      .otherwise(lit(null).cast(StringType))
  }

  /** UuidTimestampScalarFunction.java → UuidUtils.getTimestampMillis
    * (`UuidUtils.java:330-351`) — epoch millis from a time-based UUID:
    * v1 (Gregorian 100-ns split across time_low/mid/high), v6 (RFC 9562
    * reordered Gregorian), v7 (upper 48 MSB bits are Unix millis);
    * null for every other version (the reference throws). */
  def uuidTimestamp(u: Column): Column =
    CompatAliases.jvmCall("uuidTimestampMillis", LongType, u)
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

  /** Canonical textual form: dotted quad for v4; RFC 5952 for v6
    * (lowercase hex, no leading zeros, longest zero-run compressed
    * to `::`, leftmost run on ties, runs of length 1 not compressed). */
  def format(b: Array[Byte]): String = {
    if (b.length == 4)
      return s"${b(0) & 0xFF}.${b(1) & 0xFF}.${b(2) & 0xFF}.${b(3) & 0xFF}"
    val g = Array.tabulate(8)(i => ((b(2 * i) & 0xFF) << 8) | (b(2 * i + 1) & 0xFF))
    // longest zero run (leftmost on tie), length >= 2
    var bestStart = -1; var bestLen = 0; var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestLen = j - i; bestStart = i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) g.map(Integer.toHexString).mkString(":")
    else {
      val pre = g.take(bestStart).map(Integer.toHexString).mkString(":")
      val post = g.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      pre + "::" + post
    }
  }

  private def maskBits(b: Array[Byte], bits: Int, setHostBits: Boolean): Array[Byte] = {
    val out = b.clone()
    var i = 0
    while (i < out.length) {
      val remaining = bits - i * 8
      if (remaining >= 8) () // network byte untouched
      else if (remaining <= 0) out(i) = if (setHostBits) 0xFF.toByte else 0
      else {
        val mask = (0xFF << (8 - remaining)) & 0xFF
        out(i) =
          if (setHostBits) ((out(i) & mask) | (~mask & 0xFF)).toByte
          else (out(i) & mask).toByte
      }
      i += 1
    }
    out
  }

  /** Reference ipPrefix(ip, bits): masked base in CIDR notation; null
    * on invalid input (null-column contract instead of throwing). */
  def ipPrefix(ip: UTF8String, bits: Int): UTF8String = {
    if (ip == null) return null
    val b = parse(ip.toString)
    if (b == null || bits < 0 || bits > b.length * 8) return null
    UTF8String.fromString(format(maskBits(b, bits, setHostBits = false)) + "/" + bits)
  }

  private def subnetEnd(cidr: UTF8String, max: Boolean): UTF8String = {
    if (cidr == null) return null
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return null
    val b = parse(c.substring(0, slash))
    val bits =
      try c.substring(slash + 1).toInt
      catch { case _: NumberFormatException => return null }
    if (b == null || bits < 0 || bits > b.length * 8) return null
    UTF8String.fromString(format(maskBits(b, bits, setHostBits = max)))
  }

  /** Reference ipNetmask/ipHostmask (`IpAddressFunctions.java:303-317`):
    * the network (or inverted host) mask of a CIDR prefix, as an IP
    * string of the same family; null on invalid input. */
  def netmask(cidr: UTF8String, invert: Boolean): UTF8String = {
    if (cidr == null) return null
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return null
    val base = parse(c.substring(0, slash))
    if (base == null) return null
    val bits =
      try c.substring(slash + 1).toInt
      catch { case _: NumberFormatException => return null }
    if (bits < 0 || bits > base.length * 8) return null
    val mask = new Array[Byte](base.length)
    var i = 0
    while (i < mask.length) {
      val remaining = bits - i * 8
      mask(i) =
        if (remaining >= 8) 0xFF.toByte
        else if (remaining <= 0) 0
        else ((0xFF << (8 - remaining)) & 0xFF).toByte
      if (invert) mask(i) = (~mask(i)).toByte
      i += 1
    }
    UTF8String.fromString(format(mask))
  }

  /** Reference ipv6ToBytes (`IpAddressFunctions.java:195`): 16-byte
    * form; null (instead of throwing) on non-IPv6 input. */
  def ipv6ToBytes(ip: UTF8String): Array[Byte] = {
    if (ip == null) return null
    val b = parse(ip.toString)
    if (b == null || b.length != 16) null else b
  }

  /** Reference bytesToIpv6 (`IpAddressFunctions.java:209`): canonical
    * RFC 5952 string from 16 bytes; null on wrong length. */
  def bytesToIpv6(b: Array[Byte]): UTF8String =
    if (b == null || b.length != 16) null else UTF8String.fromString(format(b))

  /** Reference ipv4ToIpv6 (`IpAddressFunctions.java:222`): the
    * IPv4-mapped IPv6 form in canonical notation (`::ffff:c0a8:101`). */
  def ipv4MappedV6(ip: UTF8String): UTF8String = {
    if (ip == null) return null
    val v4 = parse(ip.toString)
    if (v4 == null || v4.length != 4) return null
    val out = new Array[Byte](16)
    out(10) = 0xFF.toByte
    out(11) = 0xFF.toByte
    System.arraycopy(v4, 0, out, 12, 4)
    UTF8String.fromString(format(out))
  }

  /** Reference ipSubnetMin(cidr): first address of the subnet. */
  def ipSubnetMin(cidr: UTF8String): UTF8String = subnetEnd(cidr, max = false)

  /** Reference ipSubnetMax(cidr): last address of the subnet. */
  def ipSubnetMax(cidr: UTF8String): UTF8String = subnetEnd(cidr, max = true)
}

/** ipPrefix(ip, bits) → "masked/bits" (IPv4 + IPv6, RFC 5952 canonical);
  * null on invalid input. Codegen calls the static [[IpHelper]]. */
case class IpPrefix(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_prefix"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects (string, int), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(ip: Any, bits: Any): Any =
    IpHelper.ipPrefix(ip.asInstanceOf[UTF8String], bits.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ip, bits) =>
      s"""${ev.value} = graft.functions.IpHelper.ipPrefix($ip, $bits);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ipSubnetMin/ipSubnetMax over a CIDR string; null on invalid input. */
case class IpSubnetEnd(child: Expression, max: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (max) "ip_subnet_max" else "ip_subnet_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects a string CIDR, got ${child.dataType}")

  override def nullSafeEval(cidr: Any): Any =
    if (max) IpHelper.ipSubnetMax(cidr.asInstanceOf[UTF8String])
    else IpHelper.ipSubnetMin(cidr.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (max) "ipSubnetMax" else "ipSubnetMin"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.IpHelper.$m($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
