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
  * The DEFAULT analyzer mirrors the reference's: every unconfigured
  * column applies the 35-word English stop set at index AND query time
  * (`TextIndexUtils.getAnalyzer` → `getStandardAnalyzerWithCustomized
  * StopWords`, `TextIndexUtils.java:154-167`; set seeded from
  * `LuceneTextIndexCreator.getDefaultEnglishStopWordsSet`). A stopped
  * term has no postings (matches nothing); phrases drop edge stop
  * words and step over interior ones with one-token position gaps.
  * `useDefaultStopWords=false` in the options argument keeps every
  * token (graft's opt-out); `stopWordInclude`/`stopWordExclude`
  * compose per the reference.
  *
  * Supported query subset: terms (whole-token match), `"quoted
  * phrases"` (token-exact adjacency), wildcard terms `pre*`, `mi*dle`, `te?t`
  * (`*` = any run, `?` = one char, within a token — WildcardQuery),
  * `NOT <clause>` complements (tightest binding, as Lucene's),
  * wildcards INSIDE phrases (`"big da*"` — ordered adjacent tokens,
  * each matched by its pattern, the MultiPhrase/prefix-phrase shape),
  * fuzzy terms `term~N` (Levenshtein distance ≤ N against any token;
  * bare `term~` uses Lucene's default 2), phrase proximity `"a b"~N`
  * (ordered terms with at most N intervening tokens between
  * consecutive terms — a subset of Lucene's move-based slop, exact
  * for 2-term phrases), grouping parentheses, and AND / OR
  * combinators (AND binds tighter than OR). Adjacency of unquoted
  * terms means OR — Lucene's classic-parser default and the
  * reference's (`LuceneTextIndexReader._useANDForMultiTermQueries =
  * false`); the per-column/per-query opt-in
  * `useANDForMultiTermTextIndexQueries` / `defaultOperator=AND` makes
  * adjacency bind as AND instead. A third TEXT_MATCH argument carries
  * Lucene-style options (`LuceneTextIndexUtils.OptionKey`):
  * `defaultOperator=AND|OR` and — mirroring the column property —
  * `enablePrefixSuffixMatchingInPhraseQueries=true`, which converts a
  * flat multi-term query containing wildcard/prefix terms into an
  * ordered ADJACENT span (`convertToMultiTermSpanQuery`'s
  * SpanNearQuery(0, ordered)), so `'*ealtime streaming system*'`
  * matches token runs [.*ealtime][streaming][system.*].
  *
  * Mixed adjacency and explicit operators follow Lucene's classic
  * parser EXACTLY (flat clause list + occur rules, see [[parse]]):
  * `a b AND c` requires b AND c with a optional, `a OR NOT b` is
  * a AND NOT b, and an all-MUST_NOT query matches nothing — r9
  * closed the formerly-documented precedence-grammar divergence.
  */
object TextMatch {

  // per-term matcher inside phrase/proximity shapes (raw term kept so
  // each execution strategy can build its own regex form)
  private sealed trait TermPat
  private final case class ExactT(t: String) extends TermPat
  private final case class WildT(term: String) extends TermPat

  private[graft] sealed trait Node
  private final case class Term(t: String) extends Node
  private final case class Prefix(p: String) extends Node
  private final case class Wild(term: String) extends Node
  private final case class Fuzzy(t: String, maxEdits: Int) extends Node
  /** Lucene RegexpQuery: `/re/` matched against WHOLE tokens. */
  private final case class RegexT(re: String) extends Node
  private final case class Proximity(terms: Seq[TermPat], slop: Int) extends Node
  /** Constant non-match (a term that is a stop word has no postings). */
  private case object FalseN extends Node
  private final case class AndN(xs: Seq[Node]) extends Node
  private final case class OrN(xs: Seq[Node]) extends Node
  private final case class NotN(x: Node) extends Node
  /** One parenthesized level EXACTLY as Lucene's classic parser holds
    * it: the flat clause list with occurs (0 SHOULD / 1 MUST /
    * 2 MUST_NOT), BEFORE BooleanQuery match semantics lower it to
    * And/Or/Not shapes — span conversion must see this form, because
    * `convertToMultiTermSpanQuery` replaces the WHOLE clause list (in
    * written order, occurs discarded) with one ordered span. */
  private final case class LevelN(clauses: Seq[(Node, Int)]) extends Node

  private def tokenize(q: String): Vector[String] =
    """"[^"]*"(~\d+)?|\(|\)|[^\s()]+""".r.findAllIn(q.trim).toVector

  /** Lucene's CLASSIC-PARSER clause model, not a precedence grammar:
    * each parenthesized level is ONE flat BooleanQuery whose clauses
    * get occurs from the conj/mods algorithm
    * (`QueryParserBase.addClause`) —
    *   - `AND` promotes the PREVIOUS clause to MUST (unless
    *     prohibited) and makes the next clause MUST;
    *   - `OR` leaves clauses SHOULD (under defaultOperator=AND it
    *     demotes the previous clause to SHOULD);
    *   - `NOT` marks the next clause MUST_NOT;
    *   - bare adjacency takes the default operator's occur.
    * Matching then follows BooleanQuery (minimumShouldMatch=0): every
    * MUST holds, no MUST_NOT holds, and — only when no MUST exists —
    * at least one SHOULD holds. So `a b AND c` requires b AND c with
    * a optional (NOT `a OR (b AND c)`), `a OR NOT b` is a AND NOT b,
    * and an all-MUST_NOT query (`NOT a`) matches NOTHING. */
  private def parse(q: String, defaultAnd: Boolean = false): Node = {
    val tokens = tokenize(q)
    var i = 0
    def peek: Option[String] = if (i < tokens.length) Some(tokens(i)) else None
    def parseLevel(): Node = {
      val SHOULD = 0; val MUST = 1; val MUST_NOT = 2
      final case class Cl(node: Node, var occur: Int)
      val cls = ArrayBuffer[Cl]()
      var conj = 0 // 0 none, 1 AND, 2 OR
      var not = false
      def addClause(n: Node): Unit = {
        if (cls.nonEmpty && conj == 1 && cls.last.occur != MUST_NOT)
          cls.last.occur = MUST
        if (cls.nonEmpty && defaultAnd && conj == 2 &&
            cls.last.occur != MUST_NOT)
          cls.last.occur = SHOULD
        val occ =
          if (not) MUST_NOT
          else if (defaultAnd) { if (conj == 2) SHOULD else MUST }
          else { if (conj == 1) MUST else SHOULD }
        cls += Cl(n, occ)
        conj = 0
        not = false
      }
      var more = true
      while (more) peek match {
        case Some(t) if t.equalsIgnoreCase("AND") => i += 1; conj = 1
        case Some(t) if t.equalsIgnoreCase("OR") => i += 1; conj = 2
        case Some(t) if t.equalsIgnoreCase("NOT") => i += 1; not = true
        case Some("(") =>
          i += 1
          val n = parseLevel()
          require(peek.contains(")"),
            s"TEXT_MATCH: unbalanced parens in '$q'")
          i += 1
          addClause(n)
        case Some(")") => more = false
        case Some(t) => i += 1; addClause(atom(t))
        case None => more = false
      }
      if (cls.isEmpty)
        throw new IllegalArgumentException(s"TEXT_MATCH: empty group in '$q'")
      LevelN(cls.map(c => (c.node, c.occur)).toSeq)
    }
    val n = parseLevel()
    require(i == tokens.length, s"TEXT_MATCH: trailing tokens in '$q'")
    n
  }

  /** BooleanQuery match semantics over a parsed level
    * (minimumShouldMatch=0): every MUST holds, no MUST_NOT holds,
    * and — only when no MUST exists — at least one SHOULD holds. */
  private def lowerLevels(n: Node): Node = n match {
    case LevelN(cls) =>
      val musts = cls.collect { case (c, 1) => lowerLevels(c) }
      val shoulds = cls.collect { case (c, 0) => lowerLevels(c) }
      val nots = cls.collect { case (c, 2) => lowerLevels(c) }
      val pos =
        if (musts.nonEmpty)
          // with a MUST present, SHOULD clauses are score-only
          Some(if (musts.size == 1) musts.head else AndN(musts))
        else if (shoulds.nonEmpty)
          Some(if (shoulds.size == 1) shoulds.head else OrN(shoulds))
        else None
      pos match {
        case None => FalseN // pure-negative BooleanQuery matches nothing
        case Some(p) if nots.isEmpty => p
        case Some(p) => AndN(p +: nots.map(NotN(_)))
      }
    case other => other
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

  /** Quoted phrases are Lucene PhraseQuery semantics: the ANALYZED
    * token sequence must appear adjacently (in order, slop
    * intervening tokens allowed) — token-EXACT, so '"IT support"'
    * does not match "IT supporting" (TextSearchQueriesTest gold: 8
    * under the 4x serving). Terms carrying wildcards keep their
    * wildcard patterns (MultiPhrase). */
  private def phraseNode(p: String, slop: Int): Node = {
    val terms = p.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      .flatMap { t =>
        if (hasWildcard(t)) Seq(t)
        else analyzeTerm(t) // "publish-subscribe" -> two positions
      }
    if (terms.isEmpty) FalseN
    else if (terms.size == 1) {
      if (hasWildcard(terms.head)) Wild(terms.head)
      else Term(terms.head)
    } else Proximity(terms.map(patFor), slop)
  }

  private def atom(tok: String): Node = tok match {
    case PhraseSlop(p, slop) => phraseNode(p, slop.toInt)
    case t if t.startsWith("\"") =>
      phraseNode(t.stripPrefix("\"").stripSuffix("\""), 0)
    case t if t.length >= 2 && t.startsWith("/") && t.endsWith("/") =>
      // Lucene regex term `/.*exception/` — full-token automaton match
      // (regexes containing spaces or parens are outside the tokenizer)
      RegexT(t.substring(1, t.length - 1).toLowerCase)
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

  /** The ANALYZED form of a query term — the same \\W+ split the corpus
    * gets, so `C++` queries the token `c` exactly as Lucene's analyzer
    * turns the term into its indexed form. Multi-token terms (e.g.
    * `publish-subscribe`) become an OR of their tokens (the classic
    * parser's autoGeneratePhraseQueries=false default). */
  private def analyzeTerm(t: String): Seq[String] =
    t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  private def compile(n: Node, c: Column): Column = n match {
    case Term(t) =>
      // whole-token match, case-insensitive (Lucene standard analyzer)
      analyzeTerm(t) match {
        case Seq() => lit(false)
        case Seq(one) => array_contains(toks(c), one)
        case many => many.map(w => array_contains(toks(c), w))
          .reduce(_ || _)
      }
    case RegexT(re) =>
      exists(toks(c), tok => tok.rlike("^" + re + "$"))
    case Prefix(p) => lower(c).rlike("(^|\\W)" + java.util.regex.Pattern.quote(p.toLowerCase))
    case Wild(t) =>
      // one whole-string regex, wildcards confined to token chars
      lower(c).rlike("(^|" + NotTok + ")" + wildInlineRegex(t) +
        "(" + NotTok + "|$)")
    case Fuzzy(t, n) =>
      // any token within Levenshtein distance n (FuzzyQuery)
      exists(toks(c), tok => levenshtein(tok, lit(t.toLowerCase)) <= n)
    case Proximity(terms, slop) if terms.size == 2 || slop == 0 =>
      // adjacent (slop 0, any arity) and 2-term sloppy phrases are ONE
      // consistent token run — expressible as a single whole-string
      // regex: one pass per row instead of per-token position arrays.
      // For slop 0 this IS Lucene PhraseQuery semantics (a consistent
      // chain), which the ≥3-term pairwise path below is not.
      val between =
        if (slop == 0) NotTok + "+"
        else "(" + NotTok + "+[a-z0-9_]+){0," + slop + "}" + NotTok + "+"
      val re = lower(c).rlike("(^|" + NotTok + ")" +
        terms.map(inlinePat).mkString(between) + "(" + NotTok + "|$)")
      // cheap NECESSARY pre-filter: a plain substring probe on the
      // longest exact term short-circuits the regex for non-matching
      // rows (codegen And evaluates left-to-right). Solo A/B at sf0.1
      // is overhead-dominated (0.64 vs 0.65 s) — the guard is kept
      // because it only ever removes regex evaluations and the regex
      // cost grows with document LENGTH, which sf0.1 understates
      terms.collect { case ExactT(t) => t }.sortBy(-_.length)
        .headOption match {
        case Some(t) if t.length >= 3 => lower(c).contains(t) && re
        case _ => re
      }
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
    case NotN(x) => !compile(x, c)
    case FalseN => lit(false)
  }

  /** The reference's default English stop set —
    * `LuceneTextIndexCreator.getDefaultEnglishStopWordsSet()`
    * (`LuceneTextIndexCreator.java:73-80`): Lucene's 33-word
    * ENGLISH_STOP_WORDS_SET plus "than" and "those". EVERY text column
    * without a custom analyzer runs it, index-time and query-time
    * (`TextIndexUtils.getAnalyzer` routes the no-config path through
    * `getStandardAnalyzerWithCustomizedStopWords`,
    * `segment/store/TextIndexUtils.java:154-167,336-346`);
    * `stopWordInclude`/`stopWordExclude` modify it per column
    * (FieldConfig.TEXT_INDEX_STOP_WORD_*). */
  private[graft] val LuceneDefaultStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "than", "there", "these",
    "they", "this", "to", "was", "will", "with", "those")

  /** Apply stop-word analysis to the parsed query the way Lucene's
    * analyzer does: a stopped TERM has no postings (constant false);
    * a phrase drops leading/trailing stop words and keeps POSITION
    * GAPS for interior ones (enablePositionIncrements) — the gap
    * matches any one token, so '"learned a lot"' still requires
    * learned-X-lot adjacency. Wildcard/fuzzy terms bypass the
    * analyzer, as in Lucene. */
  private def stopFilter(n: Node, stop: Set[String]): Node = n match {
    case Term(t) =>
      // rebuilt from the SURVIVORS: a partially-stopped multi-token
      // term ('the-stream' → [the, stream]) queries only the
      // remaining tokens, as Lucene's analyzer drops the stopped one
      val all = analyzeTerm(t)
      val ts = all.filterNot(stop)
      if (ts.isEmpty) FalseN
      else if (ts == all) n
      else if (ts.size == 1) Term(ts.head)
      else OrN(ts.map(Term(_)))
    case Proximity(pats0, slop) =>
      def stopped(p: TermPat): Boolean = p match {
        case ExactT(w) => stop(w)
        case _ => false // wildcard terms bypass the analyzer
      }
      if (!pats0.exists(stopped)) n
      else {
        // interior stops become ONE-token gaps (enablePositionIncrements
        // leaves a position hole the phrase must step over — the gap
        // consumes exactly one real token, so `?*` = one-or-more token
        // chars, never the empty run between two separators); edges
        // drop (Lucene drops the dangling positions)
        val pats: Seq[TermPat] = pats0
          .dropWhile(stopped).reverse.dropWhile(stopped).reverse
          .map(p => if (stopped(p)) WildT("?*") else p)
        if (pats.isEmpty) FalseN
        else if (pats.size == 1) pats.head match {
          case ExactT(w) => Term(w)
          case WildT(w) => Wild(w)
        }
        else Proximity(pats, slop)
      }
    case AndN(xs) => AndN(xs.map(stopFilter(_, stop)))
    case OrN(xs) => OrN(xs.map(stopFilter(_, stop)))
    case NotN(x) => NotN(stopFilter(x, stop))
    case other => other
  }

  /** Parsed TEXT_MATCH options (third argument /
    * LuceneTextIndexUtils.LuceneTextIndexOptions): "k1=v1,k2=v2". */
  private[graft] final case class Options(defaultAnd: Boolean,
      prefixSuffixPhrase: Boolean,
      stopWords: Option[Set[String]] = None)
  private[graft] def parseOptions(options: String): Options = {
    val kv = options.split(",").iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { p => p.split("=", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
        case _ => None
      }}.toMap
    // stop-word analysis is ON BY DEFAULT, as the reference's: every
    // unconfigured text column runs the English stop set at index and
    // query time (TextIndexUtils.getAnalyzer →
    // getStandardAnalyzerWithCustomizedStopWords). The set composes as
    // default ∪ include ∖ exclude (TextIndexUtils.java:336-346);
    // include/exclude lists are ';'-separated (',' is the options
    // separator). `useDefaultStopWords=false` is graft's documented
    // opt-out (keep every token — the reference can only empty the set
    // via exclude).
    def words(k: String): Seq[String] = kv.get(k).toSeq
      .flatMap(_.split(";")).map(_.trim.toLowerCase).filter(_.nonEmpty)
    val base =
      if (kv.get("usedefaultstopwords").exists(_.equalsIgnoreCase("false")))
        Set.empty[String]
      else LuceneDefaultStopWords
    val stopSet = base ++ words("stopwordinclude") -- words("stopwordexclude")
    val stop = if (stopSet.isEmpty) None else Some(stopSet)
    Options(
      defaultAnd = kv.get("defaultoperator").exists(_.equalsIgnoreCase("AND")),
      prefixSuffixPhrase = kv.get(
        "enableprefixsuffixmatchinginphrasequeries")
        .exists(_.equalsIgnoreCase("true")),
      stopWords = stop)
  }

  /** `convertToMultiTermSpanQuery` analog
    * (LuceneTextIndexUtils.java:100-125): a FLAT multi-term query whose
    * clauses are all plain/wildcard/prefix terms, at least one of them
    * wildcarded, becomes an ordered ADJACENT span — the
    * prefix-suffix-in-phrase feature that makes '*ealtime streaming
    * system*' a token-run match instead of a bag of terms. */
  private def spanConvert(n: Node): Node = {
    def termPat(x: Node): Option[TermPat] = x match {
      case Term(t) => Some(ExactT(t.toLowerCase))
      case Wild(t) => Some(WildT(t))
      case Prefix(p) => Some(WildT(p + "*"))
      case _ => None
    }
    // the conversion sees the TOP level's flat clause list in written
    // order with occurs DISCARDED (`convertToMultiTermSpanQuery`
    // replaces the whole BooleanQuery); any non-term clause — a
    // nested group, phrase, fuzzy — makes it non-convertible
    n match {
      case LevelN(cls) if cls.size >= 2 =>
        val pats = cls.map(c => termPat(c._1))
        if (pats.forall(_.isDefined) &&
            pats.flatten.exists(_.isInstanceOf[WildT]))
          Proximity(pats.flatten, 0)
        else n
      case _ => n
    }
  }

  private[graft] def parseWith(query: String, opts: Options): Node = {
    val n0 = parse(query, opts.defaultAnd)
    val n = lowerLevels(if (opts.prefixSuffixPhrase) spanConvert(n0) else n0)
    opts.stopWords.map(stopFilter(n, _)).getOrElse(n)
  }

  /** The no-options analyzer: the reference's default (English stop
    * set on, OR adjacency, no span conversion). */
  private[graft] val DefaultOptions: Options = parseOptions("")

  /** Per-COLUMN analyzer config from fieldConfig/multi-column
    * properties (`TextIndexUtils.getAnalyzer(config, override)`,
    * `TextIndexUtils.java:181-203`): the same knobs the options
    * argument carries, spelled with the FieldConfig property keys —
    * `stopWordInclude`/`stopWordExclude` (the reference's separator is
    * ','; ';' accepted too), `useANDForMultiTermTextIndexQueries`,
    * `enablePrefixSuffixMatchingInPhraseQueries`. */
  private[graft] def optionsFromProps(props: Map[String, String]): Options = {
    val kv = props.map { case (k, v) => k.trim.toLowerCase -> v }
    def words(k: String): Seq[String] = kv.get(k).toSeq
      .flatMap(_.split("[,;]")).map(_.trim.toLowerCase).filter(_.nonEmpty)
    val base =
      if (kv.get("usedefaultstopwords").exists(_.equalsIgnoreCase("false")))
        Set.empty[String]
      else LuceneDefaultStopWords
    val stopSet = base ++ words("stopwordinclude") -- words("stopwordexclude")
    Options(
      defaultAnd = kv.get("useandformultitermtextindexqueries")
        .exists(_.equalsIgnoreCase("true")) ||
        kv.get("defaultoperator").exists(_.equalsIgnoreCase("AND")),
      prefixSuffixPhrase =
        kv.get("enableprefixsuffixmatchinginphrasequeries")
          .exists(_.equalsIgnoreCase("true")),
      stopWords = if (stopSet.isEmpty) None else Some(stopSet))
  }

  /** The 3-arg options literal equivalent to per-column `props` — what
    * the facade splices as a re-verify's third argument so the scan
    * re-check runs the COLUMN's analyzer. Empty when `props` is the
    * default analyzer. */
  private[graft] def optionsArgFromProps(props: Map[String, String]): String = {
    val o = optionsFromProps(props)
    if (o == DefaultOptions) return ""
    val parts = Seq.newBuilder[String]
    if (o.defaultAnd) parts += "defaultOperator=AND"
    if (o.prefixSuffixPhrase)
      parts += "enablePrefixSuffixMatchingInPhraseQueries=true"
    val defaults = DefaultOptions.stopWords.getOrElse(Set.empty)
    val eff = o.stopWords.getOrElse(Set.empty)
    if (eff != defaults) {
      val inc = (eff -- defaults).toSeq.sorted
      val exc = (defaults -- eff).toSeq.sorted
      if (eff.isEmpty) parts += "useDefaultStopWords=false"
      else {
        if (inc.nonEmpty) parts += s"stopWordInclude=${inc.mkString(";")}"
        if (exc.nonEmpty) parts += s"stopWordExclude=${exc.mkString(";")}"
      }
    }
    parts.result().mkString(",")
  }

  /** Boolean Column: does `col` match the Lucene-ish `query` under the
    * DEFAULT analyzer (English stop words applied, as the reference's
    * unconfigured columns do). */
  def textMatch(c: Column, query: String): Column =
    compile(parseWith(query, DefaultOptions), c)

  /** TEXT_MATCH with the reference's options argument. */
  def textMatch(c: Column, query: String, options: String): Column =
    compile(parseWith(query, parseOptions(options)), c)

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
    *   term        exact posting lookup (no dictionary scan) — EXACT
    *   prefix*     startsWith (range-prunable dictionary walk) — EXACT
    *   wild/`?`    anchored regex over the dictionary — EXACT
    *   fuzzy ~N    levenshtein over the dictionary (FuzzyQuery's
    *               automaton walk, materialized) — EXACT
    *   "phrase"    token-exact adjacency → POSITIONAL bigram-shingle
    *               chain (Lucene PhraseQuery over stored positions):
    *               each step's doc frequency is the PAIR's — tight
    *               superset (positions original/gapped, re-verified)
    *   proximity   per-term lookups intersected (order/slop/stop-gaps
    *               ignored — the re-verify applies them) — superset
    * AND intersects whichever children are indexable (dropping an
    * unindexable conjunct keeps the superset); OR must union ALL
    * children, so one unindexable branch makes the whole OR unindexable.
    *
    * Returns (candidates, exact, bound):
    *   - `exact = true` means the set provably EQUALS the match set
    *     (every leaf exact, no conjunct dropped), so callers may skip
    *     the re-verify and serve the ids alone.
    *   - `bound` is an UPPER bound on the candidate count, computed
    *     from dictionary doc frequencies BEFORE any posting is read
    *     (AND → min of children, OR → sum, leaf → Σ df of its tokens) —
    *     the planner's cost input: a caller can fall back to the scan
    *     without paying for a doomed evaluation. */
  private[graft] def candidateIds(
      query: String,
      dict: org.apache.spark.sql.DataFrame,
      postings: org.apache.spark.sql.DataFrame,
      maxTokensPerLeaf: Int = 1024,
      opts: Options = DefaultOptions)
      : Option[(org.apache.spark.sql.DataFrame, Boolean, Long)] = {
    type DF = org.apache.spark.sql.DataFrame
    // (candidates, exact, count upper bound)
    type Cand = (DF, Boolean, Long)
    val ast = parseWith(query, opts)

    // ---- BATCHED dictionary resolution ----
    // Per-leaf dictionary scans each pay a whole-stage codegen compile
    // on a cold JVM (~300 ms apiece — the dominant cold-serving cost,
    // ColdStartProbe round-9). Instead: enumerate every dictionary
    // predicate ANY branch of the AST might need, size them all in ONE
    // aggregate pass (per-leaf match count + df sum — also the bigram
    // dfs), then fetch tokens for the bounded leaves in ONE filter
    // pass. tokensWhere/bigramLeaf below consult the resolved map;
    // the direct per-leaf query remains as a safety fallback.
    val leafPreds = scala.collection.mutable.LinkedHashMap[String, Column]()
    val bigramToks = scala.collection.mutable.LinkedHashSet[String]()
    def record(pred: Column): Unit = {
      leafPreds.getOrElseUpdate(pred.toString, pred); ()
    }
    def enumerate(n: Node): Unit = n match {
      case Term(t) => analyzeTerm(t).foreach(w =>
        record(col("token") === w))
      case RegexT(re) => record(col("token").rlike("^" + re + "$"))
      case Prefix(p) => record(col("token").startsWith(p.toLowerCase))
      case Wild(t) => record(col("token").rlike("^" + wildRegex(t) + "$"))
      case Fuzzy(t, n2) =>
        record(levenshtein(col("token"), lit(t.toLowerCase)) <= n2)
      case Proximity(terms, slop) =>
        if (slop == 0 && terms.forall(_.isInstanceOf[ExactT]) &&
            terms.size >= 2)
          terms.collect { case ExactT(w) => w }.sliding(2)
            .foreach(p => bigramToks += s"${p(0)} ${p(1)}")
        else terms.foreach {
          case ExactT(t) => record(col("token") === t.toLowerCase)
          case WildT(t) =>
            record(col("token").rlike("^" + wildRegex(t) + "$"))
        }
      case AndN(xs) => xs.foreach(enumerate)
      case OrN(xs) => xs.foreach(enumerate)
      case NotN(_) => () // complements never consult the dictionary
      case FalseN => ()
    }
    enumerate(ast)
    var bigramDfs: Map[String, Long] = Map.empty
    val resolved: Map[String, Option[(Seq[String], Long)]] = {
      val keys = leafPreds.keys.toSeq
      val preds = keys.map(leafPreds)
      val guard = !col("token").contains(" ")
      if (keys.isEmpty && bigramToks.isEmpty) Map.empty
      else {
        // OPTIMISTIC single pass: fetch (token, df, per-leaf flags) for
        // every matching dictionary row under a GLOBAL limit of
        // Σ per-leaf caps — when the limit is not hit, every leaf's
        // token set is complete and counts/df-sums fall out
        // driver-side. One unbounded leaf (a near-vocabulary wildcard)
        // trips the limit; only then pay the two-pass path (size in
        // one aggregate, fetch the bounded leaves). The common case is
        // ONE Spark job per query — on a cold JVM each distinct job
        // shape costs a whole-stage codegen compile, which dominated
        // cold text serving (ColdStartProbe round-9).
        val bigrams = bigramToks.toSeq
        val anyPred = (preds.map(_ && guard) ++
          bigrams.map(t => col("token") === t)).reduce(_ || _)
        val flags = array((preds.map(p => (p && guard).cast("int")) ++
          bigrams.map(t => (col("token") === t).cast("int"))): _*)
        val globalLimit = keys.size * (maxTokensPerLeaf + 1) +
          bigrams.size
        val rows = dict.filter(anyPred)
          .select(col("token"), col("df"), flags.as("m"))
          .limit(globalLimit + 1).collect()
        if (rows.length <= globalLimit) {
          val perLeaf = Array.fill(keys.size)(
            List.newBuilder[(String, Long)])
          val bdf = scala.collection.mutable.Map[String, Long]()
          rows.foreach { r =>
            val tok = r.getString(0)
            val df = r.getLong(1)
            val m = r.getSeq[Int](2)
            var i = 0
            while (i < keys.size) {
              if (m(i) == 1) perLeaf(i) += ((tok, df)); i += 1
            }
            bigrams.indices.foreach { j =>
              if (m(keys.size + j) == 1) bdf(bigrams(j)) = df
            }
          }
          bigramDfs = bigrams.map(t => t -> bdf.getOrElse(t, 0L)).toMap
          keys.indices.map { i =>
            val ts = perLeaf(i).result()
            keys(i) -> (
              if (ts.length > maxTokensPerLeaf) None
              else Some((ts.map(_._1), ts.map(_._2).sum)))
          }.toMap
        } else {
          // fallback: size every leaf first, then fetch the bounded
          val aggs =
            preds.zipWithIndex.flatMap { case (p, i) => Seq(
              sum(when(p && guard, 1L).otherwise(0L)).as(s"c$i"),
              sum(when(p && guard, col("df")).otherwise(0L)).as(s"d$i"))
            } ++ bigrams.zipWithIndex.map { case (t, j) =>
              sum(when(col("token") === t, col("df")).otherwise(0L))
                .as(s"b$j")
            }
          val row = dict.agg(aggs.head, aggs.tail: _*).head()
          val counts = keys.indices.map(i =>
            Option(row.getAs[java.lang.Long](s"c$i")).map(_.toLong)
              .getOrElse(0L))
          val dfSums = keys.indices.map(i =>
            Option(row.getAs[java.lang.Long](s"d$i")).map(_.toLong)
              .getOrElse(0L))
          bigramDfs = bigrams.zipWithIndex.map { case (t, j) =>
            t -> Option(row.getAs[java.lang.Long](s"b$j")).map(_.toLong)
              .getOrElse(0L)
          }.toMap
          val wanted = keys.indices.filter(i =>
            counts(i) > 0 && counts(i) <= maxTokensPerLeaf)
          val fetched: Map[Int, Seq[String]] =
            if (wanted.isEmpty) Map.empty
            else {
              val wFlags = array(wanted.map(i =>
                (leafPreds(keys(i)) && guard).cast("int")): _*)
              dict.filter(wanted.map(i => leafPreds(keys(i)))
                  .reduce(_ || _) && guard)
                .select(col("token"), wFlags.as("m"))
                .collect()
                .flatMap { r =>
                  val tok = r.getString(0)
                  val m = r.getSeq[Int](1)
                  wanted.indices.collect { case k if m(k) == 1 =>
                    wanted(k) -> tok }
                }.groupBy(_._1).map { case (i, ts) =>
                  i -> ts.map(_._2).toSeq }
            }
          keys.indices.map { i =>
            keys(i) -> (
              if (counts(i) > maxTokensPerLeaf) None
              else Some((fetched.getOrElse(i, Nil), dfSums(i))))
          }.toMap
        }
      }
    }

    def tokensWhere(pred: Column): Option[(Seq[String], Long)] =
      resolved.getOrElse(pred.toString, {
        // fallback: an un-enumerated leaf shape scans the dictionary
        // directly (word-level leaves see the UNIGRAM rows only —
        // bigram shingles must not satisfy a word pattern)
        val ts = dict.filter(pred && !col("token").contains(" "))
          .select(col("token"), col("df"))
          .limit(maxTokensPerLeaf + 1)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        if (ts.length > maxTokensPerLeaf) None
        else Some((ts.map(_._1), ts.map(_._2).sum))
      })
    def bigramLeaf(a: String, b: String): (Seq[String], Long) = {
      val tok = s"$a $b"
      val df = bigramDfs.getOrElse(tok,
        dict.filter(col("token") === tok).select(col("df"))
          .collect().headOption.map(_.getLong(0)).getOrElse(0L))
      (Seq(tok), df)
    }
    def docs(tokens: Seq[String]): DF =
      if (tokens.isEmpty) postings.filter(lit(false)).select("doc_id")
      else postings.filter(col("token").isin(tokens: _*))
        .select("doc_id").distinct()
    def leaf(ts: (Seq[String], Long), exact: Boolean): Cand =
      (docs(ts._1), exact, ts._2)
    def termLeaf(t: String): Cand =
      leaf(tokensWhere(col("token") === t.toLowerCase)
        .getOrElse((Seq(t.toLowerCase), 0L)), exact = true)
    def inter(a: DF, b: DF): DF = a.join(b, "doc_id").select("doc_id")
    def union(a: DF, b: DF): DF = a.unionByName(b).distinct()
    /** Per-doc merged position array for a set of matching tokens. */
    def posFrame(tokens: Seq[String]): DF =
      postings.filter(col("token").isin(tokens: _*))
        .groupBy(col("doc_id"))
        .agg(flatten(collect_list(col("positions"))).as("cpos"))
    /** One adjacency step of a positional chain: keep, per doc, the
      * positions of `f` immediately following a surviving position. */
    def chainStep(cur: DF, f: DF): DF =
      cur.withColumnRenamed("cpos", "prev")
        .join(f, "doc_id")
        .select(col("doc_id"),
          filter(col("cpos"), q =>
            exists(col("prev"), p2 => p2 === q - lit(1))).as("cpos"))
        .filter(size(col("cpos")) > 0)
    def chain(frames: Seq[DF]): DF =
      frames.tail.foldLeft(frames.head)(chainStep)
        .select("doc_id").distinct()
    /** Positional chain over bigram steps; a SINGLE step needs no
      * position merging at all — its doc ids are the answer (skips
      * the per-doc collect_list aggregation, one less shuffle). */
    def bigramChain(steps: Seq[(Seq[String], Long)]): DF =
      if (steps.size == 1) docs(steps.head._1)
      else chain(steps.map(st => posFrame(st._1)))
    def combineAnd(parts: Seq[Option[Cand]]): Option[Cand] = {
      val some = parts.flatten
      if (some.isEmpty) None
      else if (parts.forall(_.isDefined) && some.forall(_._2))
        // fully exact: intersect — the result provably EQUALS the
        // match set and can serve without the re-verify
        Some((some.map(_._1).reduce(inter), true, some.map(_._3).min))
      else {
        // approximate (some conjunct dropped or inexact): the
        // re-verify runs regardless, so serve the single TIGHTEST
        // child (min df bound) — still a superset, and the plan drops
        // the intersection joins entirely (Lucene's conjunction
        // likewise leads with the rarest term)
        val best = some.minBy(_._3)
        Some((best._1, false, best._3))
      }
    }
    def combineOr(parts: Seq[Option[Cand]]): Option[Cand] =
      if (parts.exists(_.isEmpty)) None
      else Some((parts.flatten.map(_._1).reduce(union),
        parts.flatten.forall(_._2),
        parts.flatten.map(_._3).sum))
    def patDocs(p: TermPat): Option[Cand] = p match {
      case ExactT(t) => Some(termLeaf(t))
      case WildT(t) =>
        tokensWhere(col("token").rlike("^" + wildRegex(t) + "$"))
          .map(ts => leaf(ts, exact = true))
    }
    def go(n: Node): Option[Cand] = n match {
      case Term(t) => analyzeTerm(t) match {
        case Seq() => Some(leaf((Nil, 0L), exact = true))
        case Seq(one) => Some(termLeaf(one))
        case many => combineOr(many.map(w => Some(termLeaf(w))))
      }
      case RegexT(re) =>
        tokensWhere(col("token").rlike("^" + re + "$"))
          .map(ts => leaf(ts, exact = true))
      case Prefix(p) =>
        tokensWhere(col("token").startsWith(p.toLowerCase))
          .map(ts => leaf(ts, exact = true))
      case Wild(t) =>
        tokensWhere(col("token").rlike("^" + wildRegex(t) + "$"))
          .map(ts => leaf(ts, exact = true))
      case Fuzzy(t, n2) =>
        tokensWhere(levenshtein(col("token"), lit(t.toLowerCase)) <= n2)
          .map(ts => leaf(ts, exact = true))
      // token-exact adjacent phrases keep the POSITIONAL bigram-shingle
      // chain (each step's doc frequency is the PAIR's, far below
      // either word's — the selectivity that makes phrase serving pay)
      case Proximity(terms, 0)
          if terms.forall(_.isInstanceOf[ExactT]) && terms.size >= 2 =>
        val ws = terms.collect { case ExactT(w) => w }
        val steps = ws.sliding(2).map(p => bigramLeaf(p(0), p(1))).toSeq
        Some((bigramChain(steps), false, steps.map(_._2).min))
      case Proximity(terms, _) =>
        combineAnd(terms.map(patDocs)).map { case (df, _, b) => (df, false, b) }
      case FalseN =>
        Some((postings.filter(lit(false)).select("doc_id"), true, 0L))
      case AndN(xs) => combineAnd(xs.map(go))
      case OrN(xs) => combineOr(xs.map(go))
      // a complement can't be bounded by postings (it's everything the
      // index does NOT list); an enclosing AND drops the conjunct
      // (superset holds), a lone/OR-side NOT keeps the exact scan
      case NotN(_) => None
    }
    // the SAME analyzer on both sides: the index was built with the
    // column's stop set (TextIndex drops stop tokens at ingest, as the
    // reference's Lucene index does), so the query must be analyzed
    // identically — `opts` carries the column's configured analyzer
    // (default: the English stop set). A stopped term has no postings,
    // a phrase queries its surviving tokens. Option-carrying (3-arg)
    // TEXT_MATCH calls never reach this path: a per-QUERY analyzer can
    // diverge from the index-time one, so the facade only serves the
    // 2-arg form against the column's own config.
    go(ast)
  }
}
