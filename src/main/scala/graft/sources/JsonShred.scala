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
          else out += WordTok(m.group(6)) // original case kept: bare keys are case-sensitive paths
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
    def isKw(t: Option[Tok], kw: String): Boolean = t match {
      case Some(WordTok(w)) => w.equalsIgnoreCase(kw)
      case _ => false
    }
    def parseOr(): PNode = {
      var acc = parseAnd()
      while (isKw(peek, "OR")) { i += 1; acc = OrP(acc, parseAnd()) }
      acc
    }
    def parseAnd(): PNode = {
      var acc = parseUnary()
      while (isKw(peek, "AND")) { i += 1; acc = AndP(acc, parseUnary()) }
      acc
    }
    def afterPath(p: String): PNode =
      peek match {
        case Some(OpTok(op)) =>
          i += 1
          val rhs = peek match {
            case Some(NumTok(v)) => i += 1; Left(v)
            case Some(StrTok(s)) => i += 1; Right(s)
            // boolean literals compare against the json scalar's
            // "true"/"false" rendering
            case t if isKw(t, "TRUE") => i += 1; Right("true")
            case t if isKw(t, "FALSE") => i += 1; Right("false")
            case other => throw new IllegalArgumentException(
              s"JSON_MATCH: expected literal after $op, got $other")
          }
          Cmp(p, op, rhs)
        case t if isKw(t, "IN") ||
            (isKw(t, "NOT") && i + 1 < toks.length &&
              isKw(Some(toks(i + 1)), "IN")) =>
          val not = isKw(t, "NOT")
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
              case tk if isKw(tk, "TRUE") => i += 1; vals += Right("true")
              case tk if isKw(tk, "FALSE") => i += 1; vals += Right("false")
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
        case t if isKw(t, "IS") =>
          i += 1
          val not = isKw(peek, "NOT")
          if (not) i += 1
          require(isKw(peek, "NULL"),
            s"JSON_MATCH: expected NULL in '$predicate'")
          i += 1
          NullChk(p, not)
        case other => throw new IllegalArgumentException(
          s"JSON_MATCH: expected operator after \"$p\", got $other")
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
        afterPath(p)
      case Some(WordTok(w)) if !Seq("AND", "OR", "NOT", "IN", "IS", "NULL",
          "TRUE", "FALSE").exists(w.equalsIgnoreCase) =>
        // bare-key form (`key = 1` ≡ `"$.key" = 1`), case preserved
        i += 1
        afterPath(w)
      case other => throw new IllegalArgumentException(
        s"JSON_MATCH: unexpected token $other in '$predicate'")
    }
    val n = parseOr()
    require(i == toks.length, s"JSON_MATCH: trailing tokens in '$predicate'")
    n
  }

  // ---- flattened scalar evaluation (the reference's json-index
  // model: predicates match the SCALAR values reachable at a path —
  // [*] fans out over array elements, object/array nodes never match,
  // and a comparison holds when ANY reached scalar satisfies it; see
  // JsonMatchQueriesTest's != / NOT IN exists-semantics golds) ----
  private sealed trait PathSeg
  private final case class FieldSeg(name: String) extends PathSeg
  private final case class IndexSeg(n: Int) extends PathSeg
  private case object WildSeg extends PathSeg

  private def pathSegs(path0: String): Seq[PathSeg] = {
    val path = if (path0.startsWith("$")) path0 else "$." + path0
    val segs = Seq.newBuilder[PathSeg]
    var i = 1
    while (i < path.length) path.charAt(i) match {
      case '.' =>
        val start = i + 1
        var j = start
        while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[') j += 1
        segs += FieldSeg(path.substring(start, j)); i = j
      case '[' =>
        val close = path.indexOf(']', i)
        require(close > i, s"JSON_MATCH: unclosed [ in path '$path0'")
        val inner = path.substring(i + 1, close).trim.replaceAll("['\"]", "")
        segs += (if (inner == "*") WildSeg else IndexSeg(inner.toInt))
        i = close + 1
      case c => throw new IllegalArgumentException(
        s"JSON_MATCH: bad path '$path0' at '$c'")
    }
    segs.result()
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** All non-null SCALAR values reachable at `path` ([*] fans out),
    * rendered canonically (numbers/booleans via their JSON text).
    * Null/malformed documents and object/array terminals yield none. */
  def scalarsAt(json: String, path: String): Array[String] = {
    if (json == null) return Array.empty
    val root = try mapper.readTree(json) catch { case _: Exception => return Array.empty }
    if (root == null) return Array.empty
    val out = Array.newBuilder[String]
    def walk(node: com.fasterxml.jackson.databind.JsonNode, segs: List[PathSeg]): Unit =
      segs match {
        case Nil => if (node.isValueNode && !node.isNull) out += node.asText()
        case FieldSeg(f) :: rest =>
          if (node.isObject && node.has(f)) walk(node.get(f), rest)
        case IndexSeg(k) :: rest =>
          if (node.isArray && k < node.size()) walk(node.get(k), rest)
        case WildSeg :: rest =>
          if (node.isArray) (0 until node.size()).foreach(k => walk(node.get(k), rest))
      }
    walk(root, pathSegs(path).toList)
    out.result()
  }

  private val scalarsUdf = udf(scalarsAt _)
  /** Column form for the SQL-surface registration (PinotFunctions
    * `jsonmatchscalars`, emitted by compileToSql). */
  def scalarsColumn(json: Column, path: Column): Column = scalarsUdf(json, path)
  /** strict numeric shape so the guarded cast can never throw under ANSI */
  private val NumShape = "^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"

  /** Compile a JSON_MATCH predicate against `df`. When the frame's
    * scan location was shredded with the referenced path, the typed
    * shredded column is used (pushdown-eligible); otherwise the raw
    * JSON parses per row into its flattened scalars (the json-index
    * semantics — no pushdown, the documented reduced mode). */
  def jsonMatch(df: DataFrame, jsonCol: String, predicate: String): Column = {
    val spec = specFor(df).filter(_.jsonCol == jsonCol)
    def shredCol(path: String): Option[Column] =
      spec.flatMap(s => s.paths.get(path).map(_ => col(colNameFor(jsonCol, path))))
    def scalars(path: String): Column = scalarsUdf(col(jsonCol), lit(path))
    def tryNum(v: Column): Column =
      when(v.rlike(NumShape), v.cast(DoubleType))
    def cmpOne(v: Column, op: String, rhs: Either[Double, String]): Column = {
      val (l, r) = rhs match {
        case Left(num) => (tryNum(v), lit(num))
        case Right(s) => (v, lit(s))
      }
      op match {
        case "=" => l === r
        case "<>" | "!=" => l =!= r
        case ">" => l > r
        case ">=" => l >= r
        case "<" => l < r
        case "<=" => l <= r
      }
    }
    def emit(n: PNode): Column = n match {
      case Cmp(p, op, rhs) => shredCol(p) match {
        case Some(c) =>
          val (l, r) = rhs match {
            case Left(v) => (c.cast(DoubleType), lit(v))
            case Right(s) => (c.cast(StringType), lit(s))
          }
          op match {
            case "=" => l === r
            case "<>" | "!=" => l =!= r
            case ">" => l > r
            case ">=" => l >= r
            case "<" => l < r
            case "<=" => l <= r
          }
        case None => exists(scalars(p), v => cmpOne(v, op, rhs))
      }
      case InP(p, vals, not) => shredCol(p) match {
        case Some(c) =>
          val wantNum = vals.forall(_.isLeft)
          val l = if (wantNum) c.cast(DoubleType) else c.cast(StringType)
          val lits = vals.map {
            case Left(v) => if (wantNum) lit(v) else lit(v.toString)
            case Right(s) => lit(s)
          }
          if (not) !l.isin(lits: _*) else l.isin(lits: _*)
        case None =>
          // [NOT] IN over flattened scalars is EXISTS per element: a
          // doc matches NOT IN when ANY reached value is outside the
          // list (JsonMatchQueriesTest:244-268)
          exists(scalars(p), v => {
            val one = vals.map(rv => cmpOne(v, "=", rv))
              .reduce[Column](_ || _)
            if (not) coalesce(!one, lit(true)) else one
          })
      }
      case NullChk(p, not) =>
        // the reference's IS_NULL is EXCLUSIVE: the IS_NOT_NULL posting
        // (docs with a non-null SCALAR at the path) flipped over all
        // docs (ImmutableJsonIndexReader.java:140-161,389-397) — so a
        // missing key, an explicit null, and a non-scalar node are all
        // IS NULL
        if (not) size(scalars(p)) > 0
        else size(scalars(p)) === 0
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
    def shred(path: String): Option[String] =
      spec.filter(_.jsonCol == jsonCol)
        .flatMap(s => s.paths.get(path).map(_ =>
          "`" + colNameFor(jsonCol, path) + "`"))
    def scalars(path: String): String =
      s"jsonmatchscalars(${ident(jsonCol)}, ${sqlLit(path)})"
    def cmpOne(v: String, op: String, rhs: Either[Double, String]): String = {
      val o = if (op == "!=") "<>" else op
      rhs match {
        case Left(num) => s"TRY_CAST($v AS DOUBLE) $o $num"
        case Right(s) => s"$v $o ${sqlLit(s)}"
      }
    }
    def emit(n: PNode): String = n match {
      case Cmp(p, op, rhs) => shred(p) match {
        case Some(c) =>
          val o = if (op == "!=") "<>" else op
          rhs match {
            case Left(v) => s"(cast($c as double) $o $v)"
            case Right(s) => s"(cast($c as string) $o ${sqlLit(s)})"
          }
        case None => s"exists(${scalars(p)}, v -> ${cmpOne("v", op, rhs)})"
      }
      case InP(p, vals, not) => shred(p) match {
        case Some(c) =>
          val wantNum = vals.forall(_.isLeft)
          val lits = vals.map {
            case Left(v) => if (wantNum) v.toString else sqlLit(v.toString)
            case Right(v) => sqlLit(v)
          }
          val lhs = if (wantNum) s"cast($c as double)" else s"cast($c as string)"
          s"($lhs ${if (not) "NOT " else ""}IN (${lits.mkString(", ")}))"
        case None =>
          // EXISTS per flattened element, incl. the NOT IN form
          val one = vals.map(rv => s"(${cmpOne("v", "=", rv)})").mkString(" OR ")
          val body = if (not) s"COALESCE(NOT ($one), true)" else s"($one)"
          s"exists(${scalars(p)}, v -> $body)"
      }
      case NullChk(p, not) =>
        // exclusive IS_NULL: flip of the non-null-scalar posting
        if (not) s"(size(${scalars(p)}) > 0)"
        else s"(size(${scalars(p)}) = 0)"
      case AndP(l, r) => s"(${emit(l)} AND ${emit(r)})"
      case OrP(l, r) => s"(${emit(l)} OR ${emit(r)})"
    }
    emit(parsePredicate(predicate))
  }
}
