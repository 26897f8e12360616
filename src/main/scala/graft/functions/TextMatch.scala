package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `TEXT_MATCH(col, query)` — the reference's Lucene text-index
  * predicate (`TextMatchFilterOperator.java:38`,
  * `pinot-segment-local/.../index/text/lucene`), mapped to native
  * string predicates per SURVEY §2.2 (no Lucene in the engine; at scale
  * this is a full scan unless paired with a precomputed token layout).
  *
  * Supported query subset: terms (token contains), `"quoted phrases"`
  * (substring), `prefix*` wildcards, and top-level AND / OR combinators
  * (AND binds tighter than OR, as in Lucene's default parser).
  */
object TextMatch {

  private sealed trait Node
  private final case class Term(t: String) extends Node
  private final case class Phrase(p: String) extends Node
  private final case class Prefix(p: String) extends Node
  private final case class AndN(xs: Seq[Node]) extends Node
  private final case class OrN(xs: Seq[Node]) extends Node

  private def parse(q: String): Node = {
    // tokenize: quoted phrases, parens-free AND/OR grammar
    val tokens = """"[^"]*"|\S+""".r.findAllIn(q.trim).toList
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

  private def atomSeq(ts: List[String]): Node = {
    val atoms = ts.filter(_.nonEmpty).map {
      case t if t.startsWith("\"") => Phrase(t.stripPrefix("\"").stripSuffix("\""))
      case t if t.endsWith("*") => Prefix(t.stripSuffix("*"))
      case t => Term(t)
    }
    if (atoms.size == 1) atoms.head else AndN(atoms)
  }

  private def compile(n: Node, c: Column): Column = n match {
    case Term(t) =>
      // whole-token match, case-insensitive (Lucene standard analyzer)
      array_contains(split(lower(c), "\\W+"), t.toLowerCase)
    case Phrase(p) => lower(c).contains(p.toLowerCase)
    case Prefix(p) => lower(c).rlike("(^|\\W)" + java.util.regex.Pattern.quote(p.toLowerCase))
    case AndN(xs) => xs.map(compile(_, c)).reduce(_ && _)
    case OrN(xs) => xs.map(compile(_, c)).reduce(_ || _)
  }

  /** Boolean Column: does `col` match the Lucene-ish `query`. */
  def textMatch(c: Column, query: String): Column = compile(parse(query), c)
}
