package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CLP log-column surface — clean-room subset of the reference's CLP
  * integration (reference: `CLPEncodingEnricher.java:20-84` produces
  * `x_logtype` / `x_dictVars` / `x_encodedVars` per message column;
  * `CLPDecodeTransformFunction.java:45-73` reassembles the message;
  * `ClpEncodedVarsMatchTransformFunction.java` wildcard-matches encoded
  * variables. The reference delegates to the external clp-ffi library
  * from the public CLP work; this implementation defines its own
  * compatible-in-shape encoding, documented below).
  *
  * Encoding (self-consistent, lossless round trip):
  *  - tokens = message split on single spaces (split/join identity);
  *  - a token of 1-18 digits with optional leading '-' is an ENCODED
  *    (integer) variable, stored as a long, placeholder `\u0012`;
  *  - any other token containing a digit is a DICTIONARY variable,
  *    stored verbatim, placeholder `\u0011` (this includes float-looking
  *    tokens — the reference packs those into its custom digit-preserving
  *    float encoding; storing them as dictionary vars is lossless and
  *    keeps decode exact, a documented divergence);
  *  - all other tokens stay in the logtype unchanged.
  *
  * Encode/decode are fused single-pass native expressions
  * ([[graft.plans.ClpEncode]]/[[graft.plans.ClpDecode]] — see the
  * rationale there); the wildcard match stays a plain Catalyst
  * composition. No UDFs, scan-parallel at 100 TB.
  */
object ClpFunctions {

  /** One-shot encoder: struct(logtype, dict_vars, encoded_vars) — the
    * three columns the reference's enricher adds per message field.
    * Fused single-pass expression ([[graft.plans.ClpEncode]]): the HOF
    * formulation split the message three times and regex-classified
    * every token repeatedly, all interpreted (HOFs have no codegen). */
  def clpEncode(msg: Column): Column =
    ColumnBridge.column(graft.plans.ClpEncode(ColumnBridge.expression(msg)))

  /** logtype: variables replaced by placeholders. */
  def clpLogtype(msg: Column): Column = clpEncode(msg).getField("logtype")

  /** Dictionary variables in token order. */
  def clpDictVars(msg: Column): Column = clpEncode(msg).getField("dict_vars")

  /** Encoded (integer) variables in token order. */
  def clpEncodedVars(msg: Column): Column =
    clpEncode(msg).getField("encoded_vars")

  /** Reassemble the original message (reference clpDecode): walk the
    * logtype's tokens, substituting the next dictionary / encoded
    * variable at each placeholder. Fused one-pass expression
    * ([[graft.plans.ClpDecode]]) — the aggregate-HOF form concatenated a
    * growing string per token, O(len²) bytes per row. */
  def clpDecode(logtype: Column, dictVars: Column, encodedVars: Column): Column =
    ColumnBridge.column(graft.plans.ClpDecode(
      ColumnBridge.expression(logtype),
      ColumnBridge.expression(dictVars),
      ColumnBridge.expression(encodedVars)))

  /** Wildcard match over the encoded variables' decimal renderings
    * (reference clpEncodedVarsMatch; `*` = any run, `?` = one char).
    * The reference pre-compiles the wildcard through its subquery
    * encoder — here the wildcard is translated to a LIKE pattern at
    * plan time (subqueryIndex accepted for signature compat; this
    * encoder produces a single subquery). */
  def clpEncodedVarsMatch(encodedVars: Column, wildcard: String): Column = {
    val pat = wildcard
      .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace('*', '%').replace('?', '_')
    exists(encodedVars, v => v.cast(StringType).like(pat))
  }

  private def fn(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs => ColumnBridge.expression(f(exprs.map(ColumnBridge.column)))

  /** SQL names: CLPENCODE / CLPDECODE / CLPENCODEDVARSMATCH
    * (`TransformFunctionType` CLP_DECODE, CLP_ENCODED_VARS_MATCH). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, f: Seq[Column] => Column): Unit =
      reg.createOrReplaceTempFunction(name, fn(f), "built-in")
    put("clpencode", { case Seq(m) => clpEncode(m) })
    put("clpdecode", {
      case Seq(lt, dv, ev) => clpDecode(lt, dv, ev)
      case Seq(lt, dv, ev, dflt) =>
        // 4-arg form (CLPDecodeTransformFunction.java:55): default
        // value when the column group is null
        coalesce(clpDecode(lt, dv, ev), dflt)
    })
    put("clpencodedvarsmatch", { case args if args.size >= 3 =>
      val wildcard = ColumnBridge.expression(args(2)).eval() match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other.toString
      }
      clpEncodedVarsMatch(args(1), wildcard)
    })
    put("clpwildcardmatch", { case Seq(msg, wq) =>
      val wildcard = ColumnBridge.expression(wq).eval() match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other.toString
      }
      clpWildcardMatch(msg, wildcard)
    })
  }

  /** clpMatch's wildcard semantics (`ClpRewriter.java` + CLP's
    * EightByteClpWildcardQueryEncoder contract): the query must match
    * the ENTIRE decoded message — `*` spans any run (including
    * empty), `?` matches one character, `\` escapes the next
    * character. The reference compiles the query into logtype/var
    * subqueries and, whenever the subqueries are inexact, ANDs a
    * decompress-and-match re-verify — decode+match is the semantic
    * ground truth, evaluated here directly (the facade's clpMatch
    * rewrite pairs this with [[clpDecode]]). Null messages don't
    * match. */
  def clpWildcardMatch(msg: Column, wildcard: String): Column = {
    val sb = new StringBuilder("(?s)^")
    var i = 0
    while (i < wildcard.length) {
      wildcard.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '\\' if i + 1 < wildcard.length =>
          i += 1
          sb.append(java.util.regex.Pattern.quote(
            wildcard.charAt(i).toString))
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    sb.append("$")
    msg.rlike(sb.toString)
  }
}
