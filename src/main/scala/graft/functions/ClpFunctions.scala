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
  *  - a token of 1-18 digits with optional leading '-' in CANONICAL
  *    rendering (no leading zeros, no "-0" — the stored form is the
  *    parsed long, so only round-tripping renderings encode; real CLP
  *    applies the same check) is an ENCODED (integer) variable,
  *    stored as a long, placeholder `\u0012`;
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
      ColumnBridge.expression(wq).eval() match {
        case null =>
          org.apache.spark.sql.functions.lit(null)
            .cast(org.apache.spark.sql.types.BooleanType)
        case u: org.apache.spark.unsafe.types.UTF8String =>
          clpWildcardMatch(msg, u.toString)
        case other => clpWildcardMatch(msg, other.toString)
      }
    })
    // candidate-side logtype prefilter (compiled at plan time; lit(true)
    // when the wildcard carries no logtype constraint, so the call is
    // always safe to AND with the decode+match re-verify)
    put("clplogtypematch", { case Seq(lt, wq) =>
      ColumnBridge.expression(wq).eval() match {
        case null => lit(null).cast(BooleanType)
        case w => logtypePrefilterColumn(lt, w.toString)
          .getOrElse(lit(true))
      }
    })
    // candidate-side variable-membership prefilter (dictionaryVars /
    // encodedVars exact matches, ClpRewriter.java:398-437, plus the
    // wildcard-variable candidates of :438-466)
    put("clpvarsmatch", { case Seq(dv, ev, wq) =>
      ColumnBridge.expression(wq).eval() match {
        case null => lit(null).cast(BooleanType)
        case w =>
          val s = w.toString
          val cs = varPrefilters(dv, ev, s) ++
            varWildcardPrefilters(dv, ev, s)
          if (cs.isEmpty) lit(true) else cs.reduce(_ && _)
      }
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
    // \z, not $: in Java regex $ also matches before a trailing line
    // terminator, which would let 'foo' match "foo\n" — the contract
    // is entire-message, byte-for-byte to the end.
    sb.append("\\z")
    msg.rlike(sb.toString)
  }

  /** One parsed wildcard symbol: a literal char or a `*`/`?` wildcard
    * (backslash escapes resolve to literal chars). */
  private final case class Sym(ch: Char, wild: Boolean)

  /** Split the wildcard on literal spaces into token-aligned pieces —
    * spaces in the query must match spaces in the message, which are
    * exactly the token separators the encoder preserves. */
  private def parsePieces(wildcard: String): Seq[Seq[Sym]] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[Sym]
    var i = 0
    while (i < wildcard.length) {
      wildcard.charAt(i) match {
        case c @ ('*' | '?') => syms += Sym(c, wild = true)
        case '\\' if i + 1 < wildcard.length =>
          i += 1; syms += Sym(wildcard.charAt(i), wild = false)
        case c => syms += Sym(c, wild = false)
      }
      i += 1
    }
    val pieces = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Sym])
    syms.foreach { s =>
      if (!s.wild && s.ch == ' ')
        pieces += scala.collection.mutable.ArrayBuffer.empty[Sym]
      else pieces.last += s
    }
    pieces.map(_.toSeq).toSeq
  }

  /** Fully-literal space-bounded digit-bearing query tokens — each
    * must match a WHOLE message token equal to it, whose encoding is
    * a pure function of its text: a canonical int token must appear in
    * encoded_vars as its parsed long, any other digit-bearing token in
    * dictionary_vars verbatim. Right(long) = encoded, Left(text) =
    * dictionary. */
  private[graft] def varPrefilterTokens(
      wildcard: String): Seq[Either[String, Long]] =
    parsePieces(wildcard).flatMap { p =>
      if (p.nonEmpty && p.forall(!_.wild)) {
        val t = p.map(_.ch).mkString
        if (graft.plans.ClpCodec.isIntVar(t)) Some(Right(t.toLong))
        else if (graft.plans.ClpCodec.hasDigit(t)) Some(Left(t))
        else None
      } else None
    }.distinct

  /** True when the compiled logtype prefilter is EXACT — matching the
    * logtype is equivalent to matching the decoded message, so the
    * decode+match re-verify is redundant and the facade drops it (the
    * reference does the same: `ClpRewriter.java` ANDs the
    * decompress-and-match function ONLY when the subqueries are
    * inexact). Holds when every space-separated piece is either a bare
    * `*` (any token run — any in logtype ⟺ any in message, since `*`
    * spans placeholders and their expansions alike) or a fully-literal
    * DIGIT-FREE token (its logtype image is the verbatim token itself:
    * outside placeholders, logtype text IS message text, and spaces
    * are token boundaries in both). Anything else — `?`, digit-bearing
    * tokens (placeholder images don't pin the value), or wildcards
    * embedded within a token (alternations carry a placeholder escape
    * hatch) — leaves the candidate a superset and keeps the re-verify.
    * Placeholder control chars in the query disqualify defensively. */
  def logtypePrefilterExact(wildcard: String): Boolean =
    parsePieces(wildcard).forall { p =>
      val starOnly = p.nonEmpty && p.forall(s => s.wild && s.ch == '*')
      val literalNoDigit = p.forall(s => !s.wild &&
        !(s.ch >= '0' && s.ch <= '9') &&
        s.ch != '\u0011' && s.ch != '\u0012')
      starOnly || literalNoDigit
    }

  /** Variable-membership prefilters — the analog of the reference's
    * dictionaryVars/encodedVars subquery matches
    * (`ClpRewriter.java:398-437`). Exact array membership: selective
    * by construction, no placeholder escape hatch, codegen'd
    * array_contains. AND'd ahead of the decode+match re-verify by the
    * facade's clpMatch rewrite. */
  def varPrefilters(dictVars: Column, encodedVars: Column,
      wildcard: String): Seq[Column] =
    varPrefilterTokens(wildcard).map {
      case Right(v) => array_contains(encodedVars, lit(v))
      case Left(t) => array_contains(dictVars, lit(t))
    }

  private def asciiDigit(c: Char) = c >= '0' && c <= '9'

  /** Could the run be an infix of some canonical `-?\d{1,18}` integer
    * rendering? (Digits plus an optional LEADING '-'; a '-' anywhere
    * else pins the containing token as a dictionary var.) */
  private[graft] def intInfix(r: String): Boolean =
    r.count(asciiDigit) <= 18 && r.zipWithIndex.forall { case (c, k) =>
      asciiDigit(c) || (c == '-' && k == 0)
    }

  /** Digit-bearing literal runs from WILDCARD-bearing pieces — the
    * analog of the reference's wildcard-variable subqueries
    * (`ClpRewriter.java:438-466`: dictVar wildcard queries compile to
    * `REGEXP_LIKE(dictionaryVars, wildcardQueryToRegex(...))`, encoded
    * wildcards to `clpEncodedVarsMatch(...)`). Soundness: a literal run
    * contains no space, so the message substring it matches sits within
    * ONE token; the run bears a digit, so that token bears a digit and
    * the encoder routes it to dictionaryVars (verbatim) or encodedVars
    * (parsed long whose decimal rendering is the token text) — hence
    * "some var token contains the run" is implied by any match. The
    * boolean is [[intInfix]]: false pins the token to dictionaryVars
    * (the run carries a char no canonical int rendering can),
    * true keeps both arrays as candidates. Fully-literal pieces are
    * excluded — [[varPrefilterTokens]] already serves those with the
    * stronger exact-membership form. */
  private[graft] def varWildcardRuns(wildcard: String): Seq[(String, Boolean)] =
    parsePieces(wildcard).flatMap { p =>
      if (p.exists(_.wild)) {
        val runs = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        p.foreach { s =>
          if (s.wild) { if (cur.nonEmpty) { runs += cur.toString; cur.clear() } }
          else cur.append(s.ch)
        }
        if (cur.nonEmpty) runs += cur.toString
        runs.filter(_.exists(asciiDigit)).map(r => (r, intInfix(r)))
      } else Nil
    }.distinct

  /** [[varWildcardRuns]] lowered to codegen'd predicates: the var
    * arrays are joined on a single space (var tokens are space-free by
    * construction, and so are the runs, so a contains on the joined
    * string is EXACTLY "some element contains the run" — no straddling
    * matches) and probed with a UTF8String byte scan. encodedVars casts
    * element-wise through `array<string>` (Cast is codegen'd; its
    * Long→String rendering IS the canonical token text the encoder
    * parsed). Whole-stage-codegen friendly end to end — no HOFs.
    * Measured at 100× (ClpScaleProbe, round 13): serves the
    * `*lat_ms=9*`-class infix variable queries that round 12 honestly
    * suppressed to full decode. */
  def varWildcardPrefilters(dictVars: Column, encodedVars: Column,
      wildcard: String): Seq[Column] =
    varWildcardRuns(wildcard).map { case (r, couldBeInt) =>
      val dictHit = array_join(dictVars, " ").contains(r)
      if (couldBeInt)
        dictHit || array_join(
          encodedVars.cast(ArrayType(StringType)), " ").contains(r)
      else dictHit
    }

  /** Candidate-side prefilter for clpMatch — the analog of the
    * reference's logtype subqueries (`ClpRewriter.java:293-345`
    * `rewriteClpMatchFunction` → `createLogtypeMatchFunction`: compile
    * the wildcard against the logtype column, AND the
    * decompress-and-match re-verify only when inexact). Graft keeps
    * decode+match as the unconditional ground truth and uses this as a
    * cheap AND'd prefilter over the short, repetitive `_logtype`
    * column — the same candidate/re-verify split GeoIndex / TextIndex /
    * RegexpIndex serve with.
    *
    * Soundness contract (spec-gated by ClpPrefilterSpec): wildcard
    * matches decode(msg) ⟹ this regex matches msg's logtype. Derived
    * from the encoder's invariants ([[graft.plans.ClpCodec]]):
    *   - tokens split/join on single spaces, so every space in the
    *     message survives verbatim in the logtype;
    *   - a `-?\d{1,18}` token becomes IntPh (\u0012), any other
    *     ASCII-digit-bearing token becomes DictPh (\u0011), digit-free
    *     tokens stay verbatim — token encoding is a pure function of
    *     token text, so a fully-literal space-bounded query token has
    *     an EXACT logtype image (placeholder or verbatim), and any
    *     literal run (no space ⇒ within one token) appears verbatim or
    *     collapses into that token's single placeholder.
    * Wildcard-bearing pieces enumerate the ways consecutive literal
    * runs can share one variable's placeholder (runs capped at 3;
    * extras degrade to `.*`, still sound).
    *
    * Returns None unless the compilation contains at least one
    * VERBATIM-REQUIRED token — a fully-literal, digit-free,
    * space-bounded query token whose logtype image is exact with no
    * placeholder alternative. Measured at 100× (ClpScaleProbe,
    * PLANS.md round-12): components that a placeholder can satisfy
    * (`(?:|run)` infix alternations, placeholder-exact tokens)
    * prune NOTHING on var-bearing corpora — every row carries some
    * variable token — so a prefilter made only of those is pure regex
    * overhead (0.6-0.8× regressions); verbatim-required tokens prune
    * 1.3-2.5×. Selectivity is unknowable at plan time, but
    * "placeholder-satisfiable" is decidable, and that is the entire
    * difference. */
  def logtypePrefilterRegex(wildcard: String): Option[String] = {
    import graft.plans.ClpCodec
    val pieces = parsePieces(wildcard)
    def quoteRe(s: String): String = s.flatMap { c =>
      if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) "\\" + c else c.toString
    }
    // could the run sit inside some `-?\d{1,18}` integer variable?
    def encodedInfix(r: String): Boolean = intInfix(r)
    def blockAlt(runs: Seq[String]): String =
      if (runs.size == 1) {
        val r = runs.head
        val alts = Seq("\u0011") ++
          (if (encodedInfix(r)) Seq("\u0012") else Nil) ++
          (if (!r.exists(asciiDigit)) Seq(quoteRe(r)) else Nil)
        if (alts == Seq("\u0011")) "\u0011"
        else if (alts == Seq("\u0011", "\u0012")) "[\u0011\u0012]"
        else alts.mkString("(?:", "|", ")")
      } else if (runs.forall(encodedInfix)) "[\u0011\u0012]"
      else "\u0011"
    // strong ⇔ some piece's image REQUIRES literal text (a fully
    // literal, digit-free token — exact verbatim image, no placeholder
    // escape hatch); everything else is placeholder-satisfiable
    var strong = false
    def pieceRegex(p: Seq[Sym]): String = {
      if (p.isEmpty) "" // empty token: digit-free ⇒ verbatim empty
      else if (p.forall(!_.wild)) {
        val t = p.map(_.ch).mkString
        if (ClpCodec.isIntVar(t)) "\u0012"
        else if (ClpCodec.hasDigit(t)) "\u0011"
        else { strong = true; quoteRe(t) }
      } else {
        var runs = Vector.empty[String]
        val cur = new StringBuilder
        var leadWild = false
        var trailWild = false
        p.foreach { s =>
          if (s.wild) {
            if (cur.nonEmpty) { runs :+= cur.toString; cur.clear() }
            if (runs.isEmpty) leadWild = true
            trailWild = true
          } else { cur.append(s.ch); trailWild = false }
        }
        if (cur.nonEmpty) runs :+= cur.toString
        if (runs.size > 3) { runs = runs.take(3); trailWild = true }
        if (runs.isEmpty) ".*"
        else {
          // every split of consecutive runs into shared-placeholder
          // blocks (runs never span tokens — they contain no space)
          def partitions(rs: Vector[String]): Seq[Seq[Vector[String]]] =
            if (rs.isEmpty) Seq(Seq.empty)
            else (1 to rs.size).flatMap(k =>
              partitions(rs.drop(k)).map(rest => rs.take(k) +: rest))
          val alts = partitions(runs)
            .map(_.map(blockAlt).mkString(".*")).distinct
          val core =
            if (alts.size == 1) alts.head else alts.mkString("(?:", "|", ")")
          (if (leadWild) ".*" else "") + core + (if (trailWild) ".*" else "")
        }
      }
    }
    val re = "(?s)^" + pieces.map(p => pieceRegex(p.toSeq)).mkString(" ") +
      "\\z"
    if (!strong || re == "(?s)^.*\\z") None else Some(re)
  }

  /** [[logtypePrefilterRegex]] lowered to the cheapest Catalyst
    * predicate: when the regex is a single literal span with `.*` only
    * at the edges, emit Contains/StartsWith/EndsWith/EqualTo —
    * codegen'd UTF8String byte scans, measured ~5× cheaper than
    * java.util.regex on the short logtype column (and StartsWith is a
    * parquet-pushable source filter); everything else stays RLike. */
  def logtypePrefilterColumn(lt: Column, wildcard: String): Option[Column] =
    logtypePrefilterRegex(wildcard).map { re =>
      val core = re.stripPrefix("(?s)^").stripSuffix("\\z")
      val lead = core.startsWith(".*")
      val trail = core.length > (if (lead) 2 else 0) && core.endsWith(".*")
      val mid = core.substring(if (lead) 2 else 0,
        core.length - (if (trail) 2 else 0))
      // literal span iff every regex metachar in it is backslash-escaped
      def unescape(s: String): Option[String] = {
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
          else if ("^$.|?*+()[]{}".indexOf(c) >= 0) return None
          else { sb.append(c); i += 1 }
        }
        Some(sb.toString)
      }
      unescape(mid) match {
        case Some(span) if lead && trail => lt.contains(span)
        case Some(span) if lead => lt.endsWith(span)
        case Some(span) if trail => lt.startsWith(span)
        case Some(span) => lt === span
        case None => lt.rlike(re)
      }
    }
}
