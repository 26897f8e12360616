package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass CLP encode/decode (semantics documented at
  * [[graft.functions.ClpFunctions]]; reference
  * `CLPEncodingEnricher.java:20-84`, `CLPDecodeTransformFunction.java:45-73`).
  *
  * The Column-HOF formulation evaluated interpreted (higher-order
  * functions have no codegen), split the message three times, regex-
  * classified every token up to three times, and `clpDecode`'s
  * aggregate-HOF rebuilt the message by concatenating a growing string
  * per token — O(len²) bytes per row. These expressions do one pass per
  * row with char-level classification (the int/dict token tests need no
  * regex) and a single StringBuilder, the same custom-Expression lesson
  * as NormalizeVector (PLANS.md profiling note). CodegenFallback: the
  * per-row work is the loop itself, which JIT compiles; nothing here
  * re-inlines subtrees per element.
  */
/** LOAD-BEARING INVARIANT: token classification (int var / dict var /
  * verbatim logtype text) is a PURE FUNCTION of the token's text —
  * nothing contextual (no schema hints, no per-column overrides, no
  * neighbor tokens) may influence it. The clpMatch EXACT-candidate
  * optimization (`ClpFunctions.logtypePrefilterExact`: logtype match
  * is equivalent to decoded-message match, so the decode re-verify is
  * dropped) and the wildcard-variable candidates
  * (`ClpFunctions.varWildcardRuns`: a digit-bearing run always lands
  * in a var array) are both DERIVED from this purity; a
  * context-dependent classifier (e.g. schema-driven forced-dictionary
  * columns) would silently break their soundness. If classification
  * ever needs context, re-gate those candidates first —
  * ClpPrefilterSpec's ground-truth assertions cover the current
  * encoder only. */
private[graft] object ClpCodec {
  final val DictPh = '\u0011'
  final val IntPh = '\u0012'

  /** Canonical `-?[0-9]{1,18}` without the regex engine. Canonical
    * means Long.toString(parse(t)) == t: no leading zeros ("0123") and
    * no negative zero ("-0") — those stay dictionary variables, since
    * the encoded form stores the PARSED long and decode must render
    * the original text back byte-for-byte (real CLP's integer encoder
    * applies the same round-trip check before encoding). */
  def isIntVar(t: String): Boolean = {
    val n = t.length
    val start = if (n > 0 && t.charAt(0) == '-') 1 else 0
    if (n - start < 1 || n - start > 18) return false
    if (t.charAt(start) == '0' && (n - start > 1 || start == 1)) return false
    var i = start
    while (i < n) {
      val c = t.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  def hasDigit(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= '0' && c <= '9') return true
      i += 1
    }
    false
  }
}

/** string message → struct(logtype, dict_vars, encoded_vars), one pass. */
case class ClpEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clpencode expects string, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("logtype", StringType),
    StructField("dict_vars", ArrayType(StringType, containsNull = false)),
    StructField("encoded_vars", ArrayType(LongType, containsNull = false))))

  // mirrors the HOF form: a null message yields struct(null, null, null)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return InternalRow(null, null, null)
    val msg = v.asInstanceOf[UTF8String].toString
    val toks = msg.split(" ", -1)
    val lt = new java.lang.StringBuilder(msg.length)
    val dict = scala.collection.mutable.ArrayBuffer.empty[Any]
    val enc = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < toks.length) {
      if (i > 0) lt.append(' ')
      val t = toks(i)
      if (ClpCodec.isIntVar(t)) {
        lt.append(ClpCodec.IntPh)
        enc += java.lang.Long.parseLong(t)
      } else if (ClpCodec.hasDigit(t) ||
          // a token that IS a bare placeholder char would be
          // misread as a variable slot on decode — store it as a
          // dictionary var so the round trip stays byte-exact (real
          // CLP likewise escapes its reserved bytes)
          (t.length == 1 && (t.charAt(0) == ClpCodec.DictPh ||
            t.charAt(0) == ClpCodec.IntPh))) {
        lt.append(ClpCodec.DictPh)
        dict += UTF8String.fromString(t)
      } else lt.append(t)
      i += 1
    }
    InternalRow(UTF8String.fromString(lt.toString),
      new GenericArrayData(dict.toArray),
      new GenericArrayData(enc.toArray))
  }

  override protected def withNewChildInternal(newChild: Expression): ClpEncode =
    copy(child = newChild)
}

/** (logtype, dict_vars, encoded_vars) → original message, one pass.
  * Null logtype → null; a placeholder with no matching variable (null
  * array, exhausted, or null element) → null, matching the HOF form's
  * null-propagating concat under non-ANSI element_at. */
case class ClpDecode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (
    first.dataType, second.dataType, third.dataType) match {
    case (StringType, ArrayType(StringType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"clpdecode expects (string, array<string>, array<long>), got $other")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val lt = first.eval(input)
    if (lt == null) return null
    val dv = second.eval(input).asInstanceOf[ArrayData]
    val ev = third.eval(input).asInstanceOf[ArrayData]
    val toks = lt.asInstanceOf[UTF8String].toString.split(" ", -1)
    val sb = new java.lang.StringBuilder
    var di = 0
    var ei = 0
    var i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(' ')
      val t = toks(i)
      if (t.length == 1 && t.charAt(0) == ClpCodec.IntPh) {
        if (ev == null || ei >= ev.numElements() || ev.isNullAt(ei)) return null
        sb.append(ev.getLong(ei))
        ei += 1
      } else if (t.length == 1 && t.charAt(0) == ClpCodec.DictPh) {
        if (dv == null || di >= dv.numElements() || dv.isNullAt(di)) return null
        sb.append(dv.getUTF8String(di).toString)
        di += 1
      } else sb.append(t)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ClpDecode =
    copy(first = f, second = s, third = t)
}
