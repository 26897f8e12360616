package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Logical tables spanning N physical tables — the reference's
  * `pinot-spi/.../data/LogicalTableConfig.java` /
  * `PhysicalTableConfig.java` surface: one queryable name backed by a
  * map of physical tables (any mix of offline and realtime), with a
  * `TimeBoundaryConfig` strategy deciding where offline data stops
  * answering and realtime takes over. This generalizes the 1+1 hybrid
  * view ([[graft.operators.Upsert.hybridView]]) to N+M composition.
  *
  * Semantics (reference `LogicalTableRouteProvider` / time-boundary
  * docs): the boundary under the `"min"` strategy is the MINIMUM over
  * the offline tables of (max(timeColumn) − 1 granularity unit) — the
  * latest instant every offline table has fully ingested; offline
  * tables answer rows at or before the boundary, realtime tables
  * strictly after. The per-table max is a distributed aggregate; only
  * the N scalar boundary values reach the driver.
  *
  * Spark-native: the view is a `unionByName` of filtered scans —
  * Catalyst pushes the boundary predicate into every physical scan
  * (partition pruning + row-group skipping per table), so a query on
  * the logical table reads only the slices that can answer.
  */
object LogicalTable {

  /** A physical table entry: the frame plus an optional extra
    * predicate (the reference routes by table partitioning; an
    * explicit predicate expresses the same slice membership). */
  final case class Physical(
      name: String,
      df: DataFrame,
      tableType: String, // OFFLINE | REALTIME
      predicate: Option[Column] = None)

  final case class Config(
      tableName: String,
      physical: Seq[Physical],
      timeColumn: String,
      boundaryGranularity: String = "1 day",
      boundaryStrategy: String = "min")

  /** The time boundary for a set of offline tables: strategy `min` =
    * min over tables of (max(time) − granularity); strategy `max` =
    * max over tables (the laxest member governs). */
  /** None = at least one offline member has ingested NOTHING under
    * the min strategy (its horizon is −∞), or every member is empty
    * under max — offline then answers nothing and realtime answers
    * everything. */
  def timeBoundary(offline: Seq[DataFrame], timeCol: String,
      granularity: String, strategy: String): Option[Column] = {
    require(offline.nonEmpty, "logical table needs >= 1 offline table")
    val perTable = offline.map { df =>
      Option(df.agg(max(col(timeCol))
        .minus(expr(s"INTERVAL $granularity"))).head.get(0))
    }
    strategy.toLowerCase match {
      case "min" =>
        // an empty member's horizon is −∞: it has fully ingested
        // nothing, so nothing is safely answerable offline
        if (perTable.exists(_.isEmpty)) None
        else Some(lit(perTable.flatten.sortWith((a, b) =>
          a.asInstanceOf[Comparable[Any]].compareTo(b) < 0).head))
      case "max" =>
        val nonEmpty = perTable.flatten
        if (nonEmpty.isEmpty) None
        else Some(lit(nonEmpty.sortWith((a, b) =>
          a.asInstanceOf[Comparable[Any]].compareTo(b) < 0).last))
      case other =>
        throw new IllegalArgumentException(s"unknown boundary strategy: $other")
    }
  }

  /** Compose the logical view: offline members answer up to the
    * boundary, realtime members strictly after; each member's own
    * routing predicate applies first. */
  def view(config: Config): DataFrame = {
    val (offline, realtime) =
      config.physical.partition(_.tableType.equalsIgnoreCase("OFFLINE"))
    require(offline.nonEmpty,
      s"logical table ${config.tableName} has no OFFLINE member")
    def sliced(p: Physical): DataFrame =
      p.predicate.map(p.df.filter).getOrElse(p.df)
    val boundary = timeBoundary(offline.map(sliced), config.timeColumn,
      config.boundaryGranularity, config.boundaryStrategy)
    def offPred = boundary
      .map(b => col(config.timeColumn) <= b).getOrElse(lit(false))
    def rtPred = boundary
      .map(b => col(config.timeColumn) > b).getOrElse(lit(true))
    val offView = offline.map(p => sliced(p).filter(offPred))
      .reduce(_.unionByName(_))
    if (realtime.isEmpty) offView
    else {
      val rtView = realtime.map(p => sliced(p).filter(rtPred))
        .reduce(_.unionByName(_))
      offView.unionByName(rtView)
    }
  }

  /** Parse the reference's LogicalTableConfig JSON subset
    * (LOGICAL_TABLE_NAME_KEY, PHYSICAL_TABLE_CONFIG_KEY names with
    * _OFFLINE/_REALTIME suffixes, TIME_BOUNDARY_CONFIG_KEY), resolving
    * physical names through `resolve`. Regex-based like
    * TableConfig.fromJson — no external JSON dependency. */
  def fromJson(json: String, timeColumn: String,
      resolve: String => DataFrame): Config = {
    def str(key: String): Option[String] =
      ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
        .findFirstMatchIn(json).map(_.group(1))
    val name = str("tableName").getOrElse("logical")
    // physicalTableConfigMap: { "t1_OFFLINE": {...}, "t2_REALTIME": {...} }
    val mapStart = json.indexOf("\"physicalTableConfigMap\"")
    val members: Seq[String] =
      if (mapStart < 0) Nil
      else {
        val open = json.indexOf('{', mapStart + 24)
        var depth = 0
        var end = open
        var i = open
        while (i < json.length && end == open) {
          json.charAt(i) match {
            case '{' => depth += 1
            case '}' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        "\"([^\"]+_(?:OFFLINE|REALTIME))\"\\s*:".r
          .findAllMatchIn(json.substring(open, end + 1))
          .map(_.group(1)).toSeq
      }
    val strategy = str("boundaryStrategy").getOrElse("min")
    val physical = members.map { m =>
      val typ = if (m.endsWith("_REALTIME")) "REALTIME" else "OFFLINE"
      Physical(m, resolve(m), typ)
    }
    Config(name, physical, timeColumn, boundaryStrategy = strategy)
  }
}
