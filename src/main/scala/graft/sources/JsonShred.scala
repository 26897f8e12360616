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

  def clear(): Unit = specs.clear()

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

  private val TokRe =
    ("""\s*(?:"([^"]*)"|'([^']*)'|(-?\d+(?:\.\d+)?)|(<>|>=|<=|!=|=|>|<)""" +
      """|(\(|\))|([A-Za-z_]+))""").r

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

  /** Compile a JSON_MATCH predicate against `df`. When the frame's
    * scan location was shredded with the referenced path, the typed
    * shredded column is used (pushdown-eligible); otherwise the raw
    * JSON string is parsed per row. */
  def jsonMatch(df: DataFrame, jsonCol: String, predicate: String): Column = {
    val spec = specFor(df).filter(_.jsonCol == jsonCol)
    val toks = tokenize(predicate)
    var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def pathCol(path: String, wantNum: Boolean): Column =
      spec.flatMap(s => s.paths.get(path).map(_ =>
        col(colNameFor(jsonCol, path)))) match {
        case Some(c) => if (wantNum) c.cast(DoubleType) else c.cast(StringType)
        case None =>
          val raw = get_json_object(col(jsonCol), path)
          if (wantNum) raw.cast(DoubleType) else raw
      }
    def parseOr(): Column = {
      var acc = parseAnd()
      while (peek.contains(WordTok("OR"))) { i += 1; acc = acc || parseAnd() }
      acc
    }
    def parseAnd(): Column = {
      var acc = parseUnary()
      while (peek.contains(WordTok("AND"))) { i += 1; acc = acc && parseUnary() }
      acc
    }
    def parseUnary(): Column = peek match {
      case Some(LPar) =>
        i += 1
        val c = parseOr()
        require(peek.contains(RPar), s"JSON_MATCH: unbalanced parens in '$predicate'")
        i += 1
        c
      case Some(PathTok(p)) =>
        i += 1
        peek match {
          case Some(OpTok(op)) =>
            i += 1
            val (rhs, wantNum) = peek match {
              case Some(NumTok(v)) => i += 1; (lit(v), true)
              case Some(StrTok(s)) => i += 1; (lit(s), false)
              case other => throw new IllegalArgumentException(
                s"JSON_MATCH: expected literal after $op, got $other")
            }
            val lhs = pathCol(p, wantNum)
            op match {
              case "=" => lhs === rhs
              case "<>" | "!=" => lhs =!= rhs
              case ">" => lhs > rhs
              case ">=" => lhs >= rhs
              case "<" => lhs < rhs
              case "<=" => lhs <= rhs
            }
          case Some(WordTok("IS")) =>
            i += 1
            val not = peek.contains(WordTok("NOT"))
            if (not) i += 1
            require(peek.contains(WordTok("NULL")),
              s"JSON_MATCH: expected NULL in '$predicate'")
            i += 1
            if (not) pathCol(p, wantNum = false).isNotNull
            else pathCol(p, wantNum = false).isNull
          case other => throw new IllegalArgumentException(
            s"JSON_MATCH: expected operator after \"$p\", got $other")
        }
      case other => throw new IllegalArgumentException(
        s"JSON_MATCH: unexpected token $other in '$predicate'")
    }
    val c = parseOr()
    require(i == toks.length, s"JSON_MATCH: trailing tokens in '$predicate'")
    c
  }
}
