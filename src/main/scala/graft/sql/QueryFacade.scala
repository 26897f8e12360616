package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import graft.Tables
import graft.functions.PinotFunctions

/** Pinot-compatible SQL front door.
  *
  * Mirrors the reference's broker entry semantics
  * (`BaseSingleStageBrokerRequestHandler.java:349`,
  * `CalciteSqlParser.compileToSqlNodeAndOptions` — leading
  * `SET key=value;` option statements, and the implicit `LIMIT 10`
  * default from `pinot-common/src/thrift/query.thrift:29`) on top of
  * `spark.sql`. Everything after option parsing is stock Catalyst —
  * parse/analyze/optimize/AQE replace the broker/server scatter-gather.
  */
object QueryFacade {

  /** Pinot's default result limit (query.thrift:29). */
  val DefaultLimit = 10

  final case class Parsed(options: Map[String, String], sql: String)

  private val SetPattern = """(?is)^\s*SET\s+(\w+)\s*=\s*('[^']*'|"[^"]*"|\S+?)\s*;""".r

  private val OptionSuffix = """(?is)\s+OPTION\s*\(([^)]*)\)\s*$""".r

  /** Strip leading `SET k = v;` statements and a trailing
    * `OPTION(k=v, ...)` clause (both Pinot query-option syntaxes). */
  def parseOptions(query: String): Parsed = {
    var rest = query
    var opts = Map.empty[String, String]
    var matched = true
    while (matched) {
      SetPattern.findFirstMatchIn(rest) match {
        case Some(m) =>
          opts += (m.group(1).toLowerCase -> m.group(2).stripPrefix("'")
            .stripSuffix("'").stripPrefix("\"").stripSuffix("\""))
          rest = rest.substring(m.end)
        case None => matched = false
      }
    }
    OptionSuffix.findFirstMatchIn(rest).foreach { m =>
      m.group(1).split(',').foreach { kv =>
        kv.split('=') match {
          case Array(k, v) => opts += (k.trim.toLowerCase -> v.trim)
          case _ =>
        }
      }
      rest = rest.substring(0, m.start)
    }
    Parsed(opts, rest.trim)
  }

  /** Does the plan already bound its result set at the top level?
    * (Walks the unary spine — Sort/Project/CTE wrappers — like the
    * reference checks its PinotQuery.limit field.) */
  private def hasTopLevelLimit(plan: LogicalPlan): Boolean = plan match {
    case _: GlobalLimit | _: LocalLimit => true
    case p: Project => hasTopLevelLimit(p.child)
    case s: Sort => hasTopLevelLimit(s.child)
    case d: Distinct => hasTopLevelLimit(d.child)
    case w: WithCTE => hasTopLevelLimit(w.plan)
    case u: UnresolvedWith => hasTopLevelLimit(u.child)
    case s: SubqueryAlias => hasTopLevelLimit(s.child)
    case _ => false
  }

  /** Register the Pinot function surface + the testdata tables. */
  def init(spark: SparkSession, dir: String): Unit = {
    PinotFunctions.registerAll(spark)
    Tables(spark, dir).registerAll()
  }

  /** Pinot spells dateAdd/timestampAdd with a QUOTED unit
    * (`DateTimeFunctions.java:1126` — `timestampAdd('days', 10, x)`
    * over epoch millis); Spark's parser grabs those names at the
    * grammar level and rejects string-literal units. Rewrite to the
    * registered epoch variants so the Pinot spelling works unchanged. */
  private val ReservedDateFn =
    """(?i)\b(dateadd|datediff|timestampadd|timestampdiff)\s*\(\s*'""".r

  /** MODE collides with a Spark builtin of different semantics (long
    * out, arbitrary tie) — route to the reference-compliant aggregate
    * (double out, MultiModeReducerType tie handling). */
  private val ModeFn = """(?i)\bmode\s*\(""".r

  private[graft] def rewriteReserved(stmt: String): String =
    ModeFn.replaceAllIn(
      ReservedDateFn.replaceAllIn(stmt, m =>
        (if (m.group(1).toLowerCase.endsWith("diff")) "dateDiffEpoch('"
         else "dateAddEpoch('")),
      "pinotmode(")

  /** Run a Pinot-flavored SQL query: leading SET options are parsed off
    * (recognized: explicitLimit=true disables the implicit limit; all
    * others are accepted as no-op compat flags, e.g. enableNullHandling,
    * timeoutMs, numGroupsLimit — Spark is always SQL-null-compliant and
    * exact, per SURVEY §2.4), then the implicit LIMIT 10 is applied
    * unless the query bounds itself. */
  private val ExplainPrefix = """(?is)^\s*EXPLAIN\s+PLAN\s+FOR\s+""".r

  def sql(spark: SparkSession, query: String): DataFrame = {
    PinotFunctions.registerAll(spark)
    val Parsed(opts, stmt0) = parseOptions(query)
    val stmt = rewriteReserved(stmt0)
    if (Ddl.isDdl(stmt)) return Ddl.execute(spark, stmt)
    // Pinot EXPLAIN PLAN FOR <query> (PinotQueryResource explain
    // support): one row per plan-tree line, mirroring the reference's
    // (operator, id, parent) tabular shape with Spark's formatted plan
    ExplainPrefix.findFirstMatchIn(stmt).foreach { m =>
      import spark.implicits._
      val inner = spark.sql(stmt.substring(m.end))
      val lines = inner.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).split("\n")
      return lines.toSeq.toDF("plan")
    }
    val df = spark.sql(stmt)
    val explicit = opts.get("explicitlimit").exists(_.toBoolean)
    val isSelect = stmt.trim.toLowerCase.startsWith("select") ||
      stmt.trim.toLowerCase.startsWith("with")
    if (!explicit && isSelect && !hasTopLevelLimit(df.queryExecution.logical))
      df.limit(DefaultLimit)
    else df
  }
}
