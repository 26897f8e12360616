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
  * Everything is pure Catalyst (split/transform/filter/aggregate HOFs)
  * — codegen'd, no UDFs, scan-parallel at 100 TB.
  */
object ClpFunctions {

  private val DictPh = "\u0011"
  private val IntPh = "\u0012"

  private def isIntVar(t: Column): Column =
    t.rlike("^-?[0-9]{1,18}$")

  private def isDictVar(t: Column): Column =
    !isIntVar(t) && t.rlike("[0-9]")

  private def toks(msg: Column): Column = split(msg, " ", -1)

  /** logtype: variables replaced by placeholders. */
  def clpLogtype(msg: Column): Column =
    array_join(transform(toks(msg),
      t => when(isIntVar(t), lit(IntPh))
        .when(isDictVar(t), lit(DictPh))
        .otherwise(t)), " ")

  /** Dictionary variables in token order. */
  def clpDictVars(msg: Column): Column =
    filter(toks(msg), isDictVar(_))

  /** Encoded (integer) variables in token order. */
  def clpEncodedVars(msg: Column): Column =
    transform(filter(toks(msg), isIntVar(_)), _.cast(LongType))

  /** One-shot encoder: struct(logtype, dict_vars, encoded_vars) — the
    * three columns the reference's enricher adds per message field. */
  def clpEncode(msg: Column): Column =
    struct(clpLogtype(msg).as("logtype"),
      clpDictVars(msg).as("dict_vars"),
      clpEncodedVars(msg).as("encoded_vars"))

  /** Reassemble the original message (reference clpDecode): walk the
    * logtype's tokens, substituting the next dictionary / encoded
    * variable at each placeholder. Single aggregate HOF — one pass. */
  def clpDecode(logtype: Column, dictVars: Column, encodedVars: Column): Column = {
    val zero = struct(lit("").as("s"), lit(0).as("di"), lit(0).as("ei"),
      lit(true).as("first"))
    aggregate(
      split(logtype, " ", -1),
      zero,
      (st, t) => {
        val sep = when(st.getField("first"), lit("")).otherwise(lit(" "))
        val di = st.getField("di")
        val ei = st.getField("ei")
        val s = st.getField("s")
        when(t === DictPh,
          struct(concat(s, sep, element_at(dictVars, di + 1)).as("s"),
            (di + 1).as("di"), ei.as("ei"), lit(false).as("first")))
        .when(t === IntPh,
          struct(concat(s, sep,
              element_at(encodedVars, ei + 1).cast(StringType)).as("s"),
            di.as("di"), (ei + 1).as("ei"), lit(false).as("first")))
        .otherwise(
          struct(concat(s, sep, t).as("s"),
            di.as("di"), ei.as("ei"), lit(false).as("first")))
      },
      st => st.getField("s"))
  }

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
  }
}
