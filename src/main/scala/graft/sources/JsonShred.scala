package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shredded-JSON ingest layout + JSON_MATCH — the Spark analog of the
  * reference's json index (`JsonMatchFilterOperator.java:37`,
  * `pinot-segment-local/.../index/json`): the reference builds an
  * inverted index over flattened JSON paths at ingest so a JSON_MATCH
  * predicate resolves to a bitmap without parsing documents at query
  * time.
  *
  * Spark-first shape: at ingest, frequent JSON paths are MATERIALIZED
  * as typed top-level columns next to the raw JSON string
  * (`<jsonCol>__<path>` naming); a registry remembers which paths are
  * shredded for which parquet location. [[JsonShred.jsonMatch]]
  * compiles the reference's JSON_MATCH predicate grammar (path
  * comparisons + AND/OR/parens + IS [NOT] NULL) against a DataFrame —
  * targeting the shredded column when the scan is registered (the
  * predicate then PUSHES DOWN into the parquet scan: a min/max +
  * dictionary-pruned read, the index analog), and falling back to
  * `get_json_object` string parsing otherwise (functionally identical,
  * no pushdown — the reduced-pushdown mode documented since round 1).
  */
object JsonShred {

  /** Shredded-column name for a JSON path: `$.a.b[0]` → `a_b_0`. */
  def colNameFor(jsonCol: String, path: String): String = {
    val p = path.stripPrefix("$").replaceAll("""[.\[\]'"]+""", "_")
      .stripPrefix("_").stripSuffix("_")
    s"${jsonCol}__$p"
  }

  final case class Spec(jsonCol: String, paths: Map[String, DataType])

  private val specs =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  /** Materialize `paths` of `jsonCol` as typed columns and write the
    * shredded layout; registers the location so [[jsonMatch]] targets
    * the columns. Returns the shredded frame re-read from `outPath`. */
  def ingestShredded(
      spark: SparkSession,
      input: DataFrame,
      outPath: String,
      jsonCol: String,
      paths: Seq[(String, DataType)],
      partitionBy: Seq[String] = Nil): DataFrame = {
    val shredded = paths.foldLeft(input) { case (df, (p, dt)) =>
      df.withColumn(colNameFor(jsonCol, p),
        get_json_object(col(jsonCol), p).cast(dt))
    }
    val writer = shredded.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(outPath)
    val out = spark.read.parquet(outPath)
    graft.plans.RollupRewrite.pathOf(out).foreach { canonical =>
      specs.put(canonical, Spec(jsonCol, paths.toMap))
    }
    out
  }

  def clear(): Unit = { specs.clear(); tableSpecs.clear() }

  private def specFor(df: DataFrame): Option[Spec] =
    graft.plans.RollupRewrite.pathOf(df).flatMap(p => Option(specs.get(p)))

  // ---- JSON_MATCH predicate grammar ----
  // subset of the reference's filter syntax over flattened paths:
  //   "$.a.b" = 'x' | <> | > | >= | < | <=     (number or 'string')
  //   "$.a" IS NULL / IS NOT NULL
  //   <pred> AND <pred> | <pred> OR <pred> | ( ... )
  private sealed trait Tok
  private case class PathTok(p: String) extends Tok
  private case class StrTok(s: String) extends Tok
  private case class NumTok(v: Double) extends Tok
  private case class OpTok(op: String) extends Tok
  private case class WordTok(w: String) extends Tok
  private case object LPar extends Tok
  private case object RPar extends Tok
  private case object CommaTok extends Tok

  private val TokRe =
    ("""\s*(?:"([^"]*)"|'([^']*)'|(-?\d+(?:\.\d+)?)|(<>|>=|<=|!=|=|>|<)""" +
      """|(\(|\)|,)|([A-Za-z_]+))""").r

  private def tokenize(s: String): Vector[Tok] = {
    var i = 0
    val out = Vector.newBuilder[Tok]
    while (i < s.length) {
      TokRe.findPrefixMatchOf(s.substring(i)) match {
        case Some(m) =>
          if (m.group(1) != null) out += PathTok(m.group(1))
          else if (m.group(2) != null) out += StrTok(m.group(2))
          else if (m.group(3) != null) out += NumTok(m.group(3).toDouble)
          else if (m.group(4) != null) out += OpTok(m.group(4))
          else if (m.group(5) == "(") out += LPar
          else if (m.group(5) == ")") out += RPar
          else if (m.group(5) == ",") out += CommaTok
          else out += WordTok(m.group(6).toUpperCase)
          i += m.end
        case None =>
          if (s.charAt(i).isWhitespace) i += 1
          else throw new IllegalArgumentException(
            s"JSON_MATCH: cannot tokenize at '${s.substring(i).take(20)}'")
      }
    }
    out.result()
  }

  // predicate AST (shared by the Column and SQL-text emitters)
  private sealed trait PNode
  private final case class Cmp(path: String, op: String,
      lit: Either[Double, String]) extends PNode
  private final case class NullChk(path: String, not: Boolean) extends PNode
  private final case class InP(path: String, vals: Seq[Either[Double, String]],
      not: Boolean) extends PNode
  private final case class AndP(l: PNode, r: PNode) extends PNode
  private final case class OrP(l: PNode, r: PNode) extends PNode

  private def parsePredicate(predicate: String): PNode = {
    val toks = tokenize(predicate)
    var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def parseOr(): PNode = {
      var acc = parseAnd()
      while (peek.contains(WordTok("OR"))) { i += 1; acc = OrP(acc, parseAnd()) }
      acc
    }
    def parseAnd(): PNode = {
      var acc = parseUnary()
      while (peek.contains(WordTok("AND"))) { i += 1; acc = AndP(acc, parseUnary()) }
      acc
    }
    def parseUnary(): PNode = peek match {
      case Some(LPar) =>
        i += 1
        val n = parseOr()
        require(peek.contains(RPar),
          s"JSON_MATCH: unbalanced parens in '$predicate'")
        i += 1
        n
      case Some(PathTok(p)) =>
        i += 1
        peek match {
          case Some(OpTok(op)) =>
            i += 1
            val rhs = peek match {
              case Some(NumTok(v)) => i += 1; Left(v)
              case Some(StrTok(s)) => i += 1; Right(s)
              case other => throw new IllegalArgumentException(
                s"JSON_MATCH: expected literal after $op, got $other")
            }
            Cmp(p, op, rhs)
          case Some(WordTok("IN")) | Some(WordTok("NOT"))
              if peek.contains(WordTok("IN")) ||
                (i + 1 < toks.length && toks(i + 1) == WordTok("IN")) =>
            val not = peek.contains(WordTok("NOT"))
            i += (if (not) 2 else 1)
            require(peek.contains(LPar),
              s"JSON_MATCH: expected ( after IN in '$predicate'")
            i += 1
            val vals = Seq.newBuilder[Either[Double, String]]
            var done = false
            while (!done) {
              peek match {
                case Some(NumTok(v)) => i += 1; vals += Left(v)
                case Some(StrTok(v)) => i += 1; vals += Right(v)
                case other => throw new IllegalArgumentException(
                  s"JSON_MATCH: expected literal in IN list, got $other")
              }
              peek match {
                case Some(CommaTok) => i += 1
                case Some(RPar) => i += 1; done = true
                case other => throw new IllegalArgumentException(
                  s"JSON_MATCH: expected , or ) in IN list, got $other")
              }
            }
            InP(p, vals.result(), not)
          case Some(WordTok("IS")) =>
            i += 1
            val not = peek.contains(WordTok("NOT"))
            if (not) i += 1
            require(peek.contains(WordTok("NULL")),
              s"JSON_MATCH: expected NULL in '$predicate'")
            i += 1
            NullChk(p, not)
          case other => throw new IllegalArgumentException(
            s"JSON_MATCH: expected operator after \"$p\", got $other")
        }
      case other => throw new IllegalArgumentException(
        s"JSON_MATCH: unexpected token $other in '$predicate'")
    }
    val n = parseOr()
    require(i == toks.length, s"JSON_MATCH: trailing tokens in '$predicate'")
    n
  }

  /** Compile a JSON_MATCH predicate against `df`. When the frame's
    * scan location was shredded with the referenced path, the typed
    * shredded column is used (pushdown-eligible); otherwise the raw
    * JSON string is parsed per row. */
  def jsonMatch(df: DataFrame, jsonCol: String, predicate: String): Column = {
    val spec = specFor(df).filter(_.jsonCol == jsonCol)
    def pathCol(path: String, wantNum: Boolean): Column =
      spec.flatMap(s => s.paths.get(path).map(_ =>
        col(colNameFor(jsonCol, path)))) match {
        case Some(c) => if (wantNum) c.cast(DoubleType) else c.cast(StringType)
        case None =>
          val raw = get_json_object(col(jsonCol), path)
          if (wantNum) raw.cast(DoubleType) else raw
      }
    def emit(n: PNode): Column = n match {
      case Cmp(p, op, rhs) =>
        val (r, wantNum) = rhs match {
          case Left(v) => (lit(v), true)
          case Right(s) => (lit(s), false)
        }
        val lhs = pathCol(p, wantNum)
        op match {
          case "=" => lhs === r
          case "<>" | "!=" => lhs =!= r
          case ">" => lhs > r
          case ">=" => lhs >= r
          case "<" => lhs < r
          case "<=" => lhs <= r
        }
      case InP(p, vals, not) =>
        // numeric when EVERY member is numeric, else string compare
        val wantNum = vals.forall(_.isLeft)
        val lhs = pathCol(p, wantNum)
        val lits = vals.map {
          case Left(v) => if (wantNum) lit(v) else lit(v.toString)
          case Right(s) => lit(s)
        }
        if (not) !lhs.isin(lits: _*) else lhs.isin(lits: _*)
      case NullChk(p, not) =>
        if (not) pathCol(p, wantNum = false).isNotNull
        else pathCol(p, wantNum = false).isNull
      case AndP(l, r) => emit(l) && emit(r)
      case OrP(l, r) => emit(l) || emit(r)
    }
    emit(parsePredicate(predicate))
  }

  // table-name registrations for the SQL-surface rewrite (the broker
  // resolves JSON_MATCH against the TABLE's json index; the facade
  // resolves against the table name in the statement)
  private val tableSpecs =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  /** Register `table`'s shred spec for the facade's SQL JSON_MATCH
    * rewrite (typically after re-registering the shredded frame as
    * the table's view). */
  def registerTable(table: String, spec: Spec): Unit =
    tableSpecs.put(table.toLowerCase, spec)

  def registerTable(table: String, jsonCol: String,
      paths: Seq[(String, DataType)]): Unit =
    registerTable(table, Spec(jsonCol, paths.toMap))

  private[graft] def tableSpec(table: String): Option[Spec] =
    Option(tableSpecs.get(table.toLowerCase))

  /** Compile a JSON_MATCH predicate to a SQL boolean expression over
    * `jsonCol`, using `spec`'s shredded columns when the path is
    * materialized — the facade's text-level rewrite backend. */
  private[graft] def compileToSql(jsonCol: String, predicate: String,
      spec: Option[Spec]): String = {
    def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
    // a qualified reference (t.col) must keep its dot outside quotes
    def ident(c: String): String =
      if (c.contains('.')) c.split('.').map(p => s"`$p`").mkString(".")
      else s"`$c`"
    def pathSql(path: String, wantNum: Boolean): String =
      spec.filter(_.jsonCol == jsonCol)
        .flatMap(s => s.paths.get(path).map(_ =>
          "`" + colNameFor(jsonCol, path) + "`")) match {
        case Some(c) =>
          if (wantNum) s"cast($c as double)" else s"cast($c as string)"
        case None =>
          val raw = s"get_json_object(${ident(jsonCol)}, ${sqlLit(path)})"
          if (wantNum) s"cast($raw as double)" else raw
      }
    def emit(n: PNode): String = n match {
      case Cmp(p, op, rhs) =>
        val (r, wantNum) = rhs match {
          case Left(v) => (v.toString, true)
          case Right(s) => (sqlLit(s), false)
        }
        val o = if (op == "!=") "<>" else op
        s"(${pathSql(p, wantNum)} $o $r)"
      case InP(p, vals, not) =>
        val wantNum = vals.forall(_.isLeft)
        val lits = vals.map {
          case Left(v) => if (wantNum) v.toString else sqlLit(v.toString)
          case Right(v) => sqlLit(v)
        }
        val neg = if (not) "NOT " else ""
        s"(${pathSql(p, wantNum)} ${neg}IN (${lits.mkString(", ")}))"
      case NullChk(p, not) =>
        s"(${pathSql(p, wantNum = false)} IS ${if (not) "NOT " else ""}NULL)"
      case AndP(l, r) => s"(${emit(l)} AND ${emit(r)})"
      case OrP(l, r) => s"(${emit(l)} OR ${emit(r)})"
    }
    emit(parsePredicate(predicate))
  }
}
