package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `TEXT_MATCH(col, query)` — the reference's Lucene text-index
  * predicate (`TextMatchFilterOperator.java:38`,
  * `pinot-segment-local/.../index/text/lucene`), mapped to native
  * string predicates per SURVEY §2.2 (no Lucene in the engine; at scale
  * this is a full scan unless paired with a precomputed token layout).
  *
  * Supported query subset: terms (whole-token match), `"quoted
  * phrases"` (substring), `prefix*` wildcards, fuzzy terms `term~N`
  * (Levenshtein distance ≤ N against any token; bare `term~` uses
  * Lucene's default 2), phrase proximity `"a b"~N` (ordered terms
  * with at most N intervening tokens between consecutive terms — a
  * subset of Lucene's move-based slop, exact for 2-term phrases), and
  * top-level AND / OR combinators (AND binds tighter than OR, as in
  * Lucene's default parser).
  */
object TextMatch {

  private sealed trait Node
  private final case class Term(t: String) extends Node
  private final case class Phrase(p: String) extends Node
  private final case class Prefix(p: String) extends Node
  private final case class Fuzzy(t: String, maxEdits: Int) extends Node
  private final case class Proximity(terms: Seq[String], slop: Int) extends Node
  private final case class AndN(xs: Seq[Node]) extends Node
  private final case class OrN(xs: Seq[Node]) extends Node

  private def parse(q: String): Node = {
    // tokenize: quoted phrases (with optional ~slop), parens-free
    // AND/OR grammar
    val tokens = """"[^"]*"(~\d+)?|\S+""".r.findAllIn(q.trim).toList
    val orParts = splitOn(tokens, "OR").map { part =>
      val andParts = splitOn(part, "AND").map(atomSeq)
      if (andParts.size == 1) andParts.head else AndN(andParts)
    }
    if (orParts.size == 1) orParts.head else OrN(orParts)
  }

  private def splitOn(tokens: List[String], sep: String): List[List[String]] = {
    val out = scala.collection.mutable.ListBuffer[List[String]]()
    var cur = List.newBuilder[String]
    tokens.foreach { t =>
      if (t.equalsIgnoreCase(sep)) { out += cur.result(); cur = List.newBuilder }
      else cur += t
    }
    out += cur.result()
    out.toList
  }

  private val PhraseSlop = """"([^"]*)"~(\d+)""".r
  private val FuzzyTerm = """([^"\s~]+)~(\d*)""".r

  private def atomSeq(ts: List[String]): Node = {
    val atoms = ts.filter(_.nonEmpty).map {
      case PhraseSlop(p, slop) =>
        val terms = p.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.size < 2) Phrase(p) else Proximity(terms, slop.toInt)
      case t if t.startsWith("\"") => Phrase(t.stripPrefix("\"").stripSuffix("\""))
      case FuzzyTerm(t, n) =>
        Fuzzy(t, if (n.isEmpty) 2 else n.toInt) // Lucene default maxEdits = 2
      case t if t.endsWith("*") => Prefix(t.stripSuffix("*"))
      case t => Term(t)
    }
    if (atoms.size == 1) atoms.head else AndN(atoms)
  }

  private def toks(c: Column): Column = split(lower(c), "\\W+")

  private def compile(n: Node, c: Column): Column = n match {
    case Term(t) =>
      // whole-token match, case-insensitive (Lucene standard analyzer)
      array_contains(toks(c), t.toLowerCase)
    case Phrase(p) => lower(c).contains(p.toLowerCase)
    case Prefix(p) => lower(c).rlike("(^|\\W)" + java.util.regex.Pattern.quote(p.toLowerCase))
    case Fuzzy(t, n) =>
      // any token within Levenshtein distance n (FuzzyQuery)
      exists(toks(c), tok => levenshtein(tok, lit(t.toLowerCase)) <= n)
    case Proximity(terms, slop) =>
      // consecutive term pairs in order, ≤ slop intervening tokens:
      // per pair, ∃ p1∈pos(a), p2∈pos(b): p1 < p2 ≤ p1 + slop + 1
      val tk = toks(c)
      def positions(term: String): Column =
        filter(
          transform(tk, (t, i) => when(t === lit(term.toLowerCase), i)
            .otherwise(lit(-1))),
          p => p >= 0)
      terms.sliding(2).map { pair =>
        val (a, b) = (pair.head, pair(1))
        exists(positions(a), p1 =>
          exists(positions(b), p2 => p2 > p1 && p2 <= p1 + slop + 1))
      }.reduce(_ && _)
    case AndN(xs) => xs.map(compile(_, c)).reduce(_ && _)
    case OrN(xs) => xs.map(compile(_, c)).reduce(_ || _)
  }

  /** Boolean Column: does `col` match the Lucene-ish `query`. */
  def textMatch(c: Column, query: String): Column = compile(parse(query), c)
}
