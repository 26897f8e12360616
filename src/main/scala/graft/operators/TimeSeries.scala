package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series range-query planner: the PromQL-style surface mapped to
  * tumbling-window aggregation.
  *
  * Reference: apache/pinot time-series engine SPI —
  * `pinot-timeseries/pinot-timeseries-spi/.../RangeTimeSeriesRequest.java`
  * (query, start/end seconds, step seconds) and the builders in
  * `series/builders/{Summing,Min,Max}TimeSeriesBuilder.java`; entry at
  * `TimeSeriesRequestHandler.java:226-248`.
  *
  * A range query = filter to [start, end] + bucket ts by step + group by
  * tag columns + one aggregation per bucket — exactly
  * `groupBy(window(ts, step), tags)`, which also runs unchanged under
  * Structured Streaming for the realtime half of a hybrid table.
  */
object TimeSeries {

  sealed trait Agg
  case object SumSeries extends Agg
  case object MinSeries extends Agg
  case object MaxSeries extends Agg
  case object AvgSeries extends Agg
  case object CountSeries extends Agg

  final case class RangeRequest(
      timeCol: String,
      valueCol: String,
      agg: Agg,
      tagCols: Seq[String],
      startSeconds: Long,
      endSeconds: Long,
      stepSeconds: Long,
      filter: Option[Column] = None)

  /** Plan + run a range query: rows (bucket_start, tags…, value), one
    * row per (step bucket × tag combination) present in the data. */
  def rangeQuery(df: DataFrame, req: RangeRequest): DataFrame = {
    val ts = col(req.timeCol)
    val inRange = ts >= timestamp_seconds(lit(req.startSeconds)) &&
      ts < timestamp_seconds(lit(req.endSeconds))
    val base = req.filter.map(df.filter).getOrElse(df).filter(inRange)
    val v = col(req.valueCol)
    val aggCol = req.agg match {
      case SumSeries => sum(v)
      case MinSeries => min(v)
      case MaxSeries => max(v)
      case AvgSeries => avg(v)
      case CountSeries => count(lit(1))
    }
    base
      .groupBy(window(ts, s"${req.stepSeconds} seconds").as("w") +:
        req.tagCols.map(col): _*)
      .agg(aggCol.as("value"))
      .select(col("w.start").as("bucket") +: req.tagCols.map(col) :+ col("value"): _*)
  }
}
