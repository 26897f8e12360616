package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `TEXT_MATCH(col, query)` — the reference's Lucene text-index
  * predicate (`TextMatchFilterOperator.java:38`,
  * `pinot-segment-local/.../index/text/lucene`), mapped to native
  * string predicates per SURVEY §2.2 (no Lucene in the engine; at scale
  * this is a full scan unless paired with a precomputed token layout).
  *
  * Supported query subset: terms (whole-token match), `"quoted
  * phrases"` (substring), wildcard terms `pre*`, `mi*dle`, `te?t`
  * (`*` = any run, `?` = one char, within a token — WildcardQuery),
  * wildcards INSIDE phrases (`"big da*"` — ordered adjacent tokens,
  * each matched by its pattern, the MultiPhrase/prefix-phrase shape),
  * fuzzy terms `term~N` (Levenshtein distance ≤ N against any token;
  * bare `term~` uses Lucene's default 2), phrase proximity `"a b"~N`
  * (ordered terms with at most N intervening tokens between
  * consecutive terms — a subset of Lucene's move-based slop, exact
  * for 2-term phrases), grouping parentheses, and AND / OR
  * combinators (AND binds tighter than OR; adjacency means AND, as
  * in the reference's text-match default).
  */
object TextMatch {

  // per-term matcher inside phrase/proximity shapes (raw term kept so
  // each execution strategy can build its own regex form)
  private sealed trait TermPat
  private final case class ExactT(t: String) extends TermPat
  private final case class WildT(term: String) extends TermPat

  private sealed trait Node
  private final case class Term(t: String) extends Node
  private final case class Phrase(p: String) extends Node
  private final case class Prefix(p: String) extends Node
  private final case class Wild(term: String) extends Node
  private final case class Fuzzy(t: String, maxEdits: Int) extends Node
  private final case class Proximity(terms: Seq[TermPat], slop: Int) extends Node
  private final case class AndN(xs: Seq[Node]) extends Node
  private final case class OrN(xs: Seq[Node]) extends Node

  private def tokenize(q: String): Vector[String] =
    """"[^"]*"(~\d+)?|\(|\)|[^\s()]+""".r.findAllIn(q.trim).toVector

  /** Recursive descent: or := and (OR and)*; and := unary ((AND)? unary)*;
    * unary := '(' or ')' | atom. Adjacency = AND. */
  private def parse(q: String): Node = {
    val tokens = tokenize(q)
    var i = 0
    def peek: Option[String] = if (i < tokens.length) Some(tokens(i)) else None
    def parseOr(): Node = {
      val parts = ArrayBuffer(parseAnd())
      while (peek.exists(_.equalsIgnoreCase("OR"))) {
        i += 1
        parts += parseAnd()
      }
      if (parts.size == 1) parts.head else OrN(parts.toSeq)
    }
    def parseAnd(): Node = {
      val parts = ArrayBuffer(parseUnary())
      var more = true
      while (more) peek match {
        case Some(t) if t.equalsIgnoreCase("AND") =>
          i += 1
          parts += parseUnary()
        case Some(t) if !t.equalsIgnoreCase("OR") && t != ")" =>
          parts += parseUnary()
        case _ => more = false
      }
      if (parts.size == 1) parts.head else AndN(parts.toSeq)
    }
    def parseUnary(): Node = peek match {
      case Some("(") =>
        i += 1
        val n = parseOr()
        require(peek.contains(")"), s"TEXT_MATCH: unbalanced parens in '$q'")
        i += 1
        n
      case Some(t) =>
        i += 1
        atom(t)
      case None =>
        throw new IllegalArgumentException(s"TEXT_MATCH: empty group in '$q'")
    }
    val n = parseOr()
    require(i == tokens.length, s"TEXT_MATCH: trailing tokens in '$q'")
    n
  }

  private val PhraseSlop = """"([^"]*)"~(\d+)""".r
  private val FuzzyTerm = """([^"\s~]+)~(\d*)""".r

  private def hasWildcard(t: String): Boolean =
    t.contains('*') || t.contains('?')

  /** Lucene wildcard → anchored token regex (`*` any run, `?` one char). */
  private def wildRegex(t: String): String =
    t.toLowerCase.map {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()<>+-=!$^|".contains(c) => "\\" + c
      case c => c.toString
    }.mkString

  // Tokens are split(lower(c), "\\W+") runs, so token chars are exactly
  // [a-z0-9_]. These regexes match ONE WHOLE STRING instead of per
  // token: wildcard runs are confined to token chars (`.*` would leak
  // across separators) and anchored by non-token-char boundaries — one
  // regex pass per row instead of one per token, which is what lets
  // wildcard/proximity predicates keep up with the exact-term ones.
  private val NotTok = "[^a-z0-9_]"
  private def wildInlineRegex(t: String): String =
    t.toLowerCase.map {
      case '*' => "[a-z0-9_]*"
      case '?' => "[a-z0-9_]"
      case c if "\\.[]{}()<>+-=!$^|".contains(c) => "\\" + c
      case c => c.toString
    }.mkString
  private def inlinePat(p: TermPat): String = p match {
    case ExactT(t) => wildInlineRegex(t) // no wildcards → just escaping
    case WildT(t) => wildInlineRegex(t)
  }

  private def patFor(term: String): TermPat =
    if (hasWildcard(term)) WildT(term) else ExactT(term.toLowerCase)

  private def phraseNode(p: String, slop: Int): Node = {
    val terms = p.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (terms.size < 2) {
      if (terms.nonEmpty && hasWildcard(terms.head)) Wild(terms.head)
      else Phrase(p)
    } else if (slop == 0 && terms.forall(!hasWildcard(_))) Phrase(p)
    else Proximity(terms.map(patFor), slop)
  }

  private def atom(tok: String): Node = tok match {
    case PhraseSlop(p, slop) => phraseNode(p, slop.toInt)
    case t if t.startsWith("\"") =>
      phraseNode(t.stripPrefix("\"").stripSuffix("\""), 0)
    case FuzzyTerm(t, n) =>
      Fuzzy(t, if (n.isEmpty) 2 else n.toInt) // Lucene default maxEdits = 2
    case t if t.endsWith("*") && !hasWildcard(t.dropRight(1)) =>
      Prefix(t.stripSuffix("*")) // pure prefix — cheaper than the regex
    case t if hasWildcard(t) => Wild(t)
    case t => Term(t)
  }

  private def toks(c: Column): Column = split(lower(c), "\\W+")

  private def tokenMatches(tok: Column, p: TermPat): Column = p match {
    case ExactT(t) => tok === lit(t)
    case WildT(t) => tok.rlike("^" + wildRegex(t) + "$")
  }

  private def compile(n: Node, c: Column): Column = n match {
    case Term(t) =>
      // whole-token match, case-insensitive (Lucene standard analyzer)
      array_contains(toks(c), t.toLowerCase)
    case Phrase(p) => lower(c).contains(p.toLowerCase)
    case Prefix(p) => lower(c).rlike("(^|\\W)" + java.util.regex.Pattern.quote(p.toLowerCase))
    case Wild(t) =>
      // one whole-string regex, wildcards confined to token chars
      lower(c).rlike("(^|" + NotTok + ")" + wildInlineRegex(t) +
        "(" + NotTok + "|$)")
    case Fuzzy(t, n) =>
      // any token within Levenshtein distance n (FuzzyQuery)
      exists(toks(c), tok => levenshtein(tok, lit(t.toLowerCase)) <= n)
    case Proximity(terms, slop) if terms.size == 2 =>
      // 2-term fast path: ∃ p1∈pos(a), p2∈pos(b): p1 < p2 ≤ p1+slop+1
      // is EXACTLY "a, then ≤ slop whole tokens, then b" as one
      // whole-string regex — one pass per row instead of building
      // per-token position arrays
      val between =
        if (slop == 0) NotTok + "+"
        else "(" + NotTok + "+[a-z0-9_]+){0," + slop + "}" + NotTok + "+"
      lower(c).rlike("(^|" + NotTok + ")" + inlinePat(terms.head) +
        between + inlinePat(terms(1)) + "(" + NotTok + "|$)")
    case Proximity(terms, slop) =>
      // ≥3 terms: consecutive term pairs in order, ≤ slop intervening
      // tokens PER PAIR with independently chosen positions — not a
      // single consistent chain, so the regex shape above does not
      // apply; keep the token-position evaluation
      val tk = toks(c)
      def positions(p: TermPat): Column =
        filter(
          transform(tk, (t, i) => when(tokenMatches(t, p), i)
            .otherwise(lit(-1))),
          x => x >= 0)
      terms.sliding(2).map { pair =>
        val (a, b) = (pair.head, pair(1))
        exists(positions(a), p1 =>
          exists(positions(b), p2 => p2 > p1 && p2 <= p1 + slop + 1))
      }.reduce(_ && _)
    // AND/OR children keep the user's written order (as Lucene does):
    // an A/B of static cheapest-first reordering LOST on matching-heavy
    // data — exists()-based arms short-circuit positives early, and
    // static cost can't see selectivity
    case AndN(xs) => xs.map(compile(_, c)).reduce(_ && _)
    case OrN(xs) => xs.map(compile(_, c)).reduce(_ || _)
  }

  /** Boolean Column: does `col` match the Lucene-ish `query`. */
  def textMatch(c: Column, query: String): Column = compile(parse(query), c)

  /** Candidate doc ids from a token-posting index
    * ([[graft.sources.TextIndex]]): resolves the query AST against the
    * token DICTIONARY (vocabulary-sized — Lucene's term-dictionary
    * role) and the `(token, doc_id)` POSTING frame. The returned set is
    * always a SUPERSET of the true matches — callers re-verify with
    * [[textMatch]] on the pruned rows, so over-approximation never
    * changes results. Returns None when the query can't be bounded by
    * the index: a token-free phrase, or a leaf whose dictionary match
    * count exceeds `maxTokensPerLeaf` (the leaf would enumerate too
    * much of the vocabulary — scan is the better plan).
    *
    * Leaf shapes → dictionary predicates:
    *   term        exact posting lookup (no dictionary scan)
    *   prefix*     startsWith (range-prunable on the sorted dictionary)
    *   wild/`?`    anchored regex over the dictionary
    *   fuzzy ~N    levenshtein over the dictionary (FuzzyQuery's
    *               automaton walk, materialized)
    *   "phrase"    interior words exact; FIRST word is a token SUFFIX
    *               and LAST a token PREFIX (substring semantics can
    *               start/end mid-token), single word → contains
    *   proximity   per-term lookups intersected (order/slop ignored —
    *               the re-verify applies them)
    * AND intersects whichever children are indexable (dropping an
    * unindexable conjunct keeps the superset); OR must union ALL
    * children, so one unindexable branch makes the whole OR unindexable. */
  private[graft] def candidateIds(
      query: String,
      dict: org.apache.spark.sql.DataFrame,
      postings: org.apache.spark.sql.DataFrame,
      maxTokensPerLeaf: Int = 1024): Option[org.apache.spark.sql.DataFrame] = {
    type DF = org.apache.spark.sql.DataFrame
    def tokensWhere(pred: Column): Option[Seq[String]] = {
      val ts = dict.filter(pred).limit(maxTokensPerLeaf + 1)
        .collect().map(_.getString(0)).toSeq
      if (ts.length > maxTokensPerLeaf) None else Some(ts)
    }
    def docs(tokens: Seq[String]): DF =
      if (tokens.isEmpty) postings.filter(lit(false)).select("doc_id")
      else postings.filter(col("token").isin(tokens: _*))
        .select("doc_id").distinct()
    def exact(t: String): DF = docs(Seq(t.toLowerCase))
    def inter(a: DF, b: DF): DF = a.join(b, "doc_id").select("doc_id")
    def reduceOpt(parts: Seq[Option[DF]], requireAll: Boolean)
        (combine: (DF, DF) => DF): Option[DF] =
      if (requireAll) {
        if (parts.exists(_.isEmpty)) None
        else Some(parts.flatten.reduce(combine))
      } else {
        val some = parts.flatten
        if (some.isEmpty) None else Some(some.reduce(combine))
      }
    def phraseCands(p: String): Option[DF] = {
      val ws = p.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
      if (ws.isEmpty) None
      else if (ws.size == 1) tokensWhere(col("token").contains(ws.head)).map(docs)
      else {
        val parts =
          tokensWhere(col("token").endsWith(ws.head)).map(docs) +:
            ws.slice(1, ws.size - 1).map(w => Some(exact(w))) :+
            tokensWhere(col("token").startsWith(ws.last)).map(docs)
        // every word is a required conjunct of the substring match —
        // but an unbounded edge leaf may be dropped (superset holds)
        reduceOpt(parts, requireAll = false)(inter)
      }
    }
    def patDocs(p: TermPat): Option[DF] = p match {
      case ExactT(t) => Some(exact(t))
      case WildT(t) =>
        tokensWhere(col("token").rlike("^" + wildRegex(t) + "$")).map(docs)
    }
    def go(n: Node): Option[DF] = n match {
      case Term(t) => Some(exact(t))
      case Phrase(p) => phraseCands(p)
      case Prefix(p) => tokensWhere(col("token").startsWith(p.toLowerCase)).map(docs)
      case Wild(t) =>
        tokensWhere(col("token").rlike("^" + wildRegex(t) + "$")).map(docs)
      case Fuzzy(t, n2) =>
        tokensWhere(levenshtein(col("token"), lit(t.toLowerCase)) <= n2).map(docs)
      case Proximity(terms, _) => reduceOpt(terms.map(patDocs),
        requireAll = false)(inter)
      case AndN(xs) => reduceOpt(xs.map(go), requireAll = false)(inter)
      case OrN(xs) => reduceOpt(xs.map(go), requireAll = true)(
        (a, b) => a.unionByName(b).distinct())
    }
    go(parse(query))
  }
}
