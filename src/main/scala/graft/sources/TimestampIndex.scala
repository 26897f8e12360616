package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** TIMESTAMP index — the reference's derived-granularity columns
  * (`TimestampIndexUtils.java:66-73,112-118`: a configured granularity
  * materializes `$<col>$<GRANULARITY>` via an ingestion transform and
  * range-indexes it; `RequestUtils.java:703-711` then overrides a
  * query's `dateTrunc('<granularity>', col)` expression — the 2-arg
  * form, or 3-arg with MILLISECONDS output — to that identifier, so
  * the predicate hits the indexed column instead of evaluating the
  * function per row).
  *
  * Spark-first shape: the derived column is computed at ingest with
  * the SAME truncation the SQL function uses
  * (`DateTimeAlgos.dateTruncEpoch`, epoch-millis out), so the override
  * is value-identical; a comparison against the materialized LONG
  * column pushes into the parquet scan (row-group min/max — the range
  * index analog), where the function form cannot. The facade rewrite
  * consults [[TimestampIndex.registerTable]] registrations keyed by
  * the statement's FROM table. */
object TimestampIndex {

  val ValidGranularities: Set[String] = Set("MILLISECOND", "SECOND",
    "MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "QUARTER", "YEAR")

  /** `TimestampIndexUtils.getColumnWithGranularity`: `$ts$DAY`. */
  def columnWithGranularity(timeCol: String, granularity: String): String =
    "$" + timeCol + "$" + granularity.toUpperCase

  /** Materialize the derived columns for `granularities` of `timeCol`
    * — computed by the SAME registered `datetrunc` SQL function the
    * query surface uses, so the override is value-identical. */
  def apply(df: DataFrame, timeCol: String,
      granularities: Seq[String]): DataFrame = {
    graft.functions.PinotFunctions.registerAll(df.sparkSession)
    granularities.foldLeft(df) { (d, g) =>
      val gu = g.toUpperCase
      require(ValidGranularities(gu), s"timestamp granularity: $g")
      d.withColumn(columnWithGranularity(timeCol, gu),
        expr(s"datetrunc('${gu.toLowerCase}', `$timeCol`)").cast(LongType))
    }
  }

  // table registrations for the facade rewrite: table -> timeCol ->
  // configured granularities
  private val reg = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Set[String]]]()

  def registerTable(table: String, timeCol: String,
      granularities: Seq[String]): Unit =
    reg.compute(table.toLowerCase, (_, cur) => {
      val m = Option(cur).getOrElse(Map.empty)
      m + (timeCol.toLowerCase ->
        (m.getOrElse(timeCol.toLowerCase, Set.empty) ++
          granularities.map(_.toUpperCase)))
    })

  def clear(): Unit = reg.clear()

  private[graft] def hasGranularity(table: String, timeCol: String,
      granularity: String): Boolean =
    Option(reg.get(table.toLowerCase))
      .flatMap(_.get(timeCol.toLowerCase))
      .exists(_.contains(granularity.toUpperCase))
}
