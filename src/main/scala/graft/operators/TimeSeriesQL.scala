package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String front-end for the time-series engine: the reference's M3QL
  * pipeline language
  * (`pinot-plugins/pinot-timeseries-lang/pinot-timeseries-m3ql` —
  * `M3qlParser`, `M3TimeSeriesPlanner.planQuery`), driven by a
  * `RangeTimeSeriesRequest`-shaped (query, start, end, step) tuple
  * (`RangeTimeSeriesRequest.java`, entry
  * `TimeSeriesRequestHandler.java:226-248`).
  *
  * Surface: `fetch{table="m", ts_column="t", ts_unit="SECONDS",
  * value="v", filter="host='web1'"} | sum{tag1,tag2}` with optional
  * post-stages — the plugin's command set plus min/max/avg/count
  * aggregations and the series-function surface:
  * `keepLastValue{}` (forward fill along the bucket spine),
  * `transformNull{0}` (constant fill), `increase{}` (delta vs the
  * previous bucket), `rate{}` (increase per second), `offset{sec}`
  * (time shift), `topk{n}` / `bottomk{n}` (keep the n series with the
  * largest/smallest range-total). Stages apply in pipe order; the
  * series-relative ones densify against the bucket spine first.
  *
  * Planning maps onto [[TimeSeries.rangeQuery]] semantics: range
  * filter ([start, end] inclusive per the SPI) → step buckets → group
  * by tags. Fill stages densify against the bucket spine per observed
  * series, exactly the plugin's TimeBuckets contract. Everything is
  * declarative DataFrame code — one shuffle for the aggregation, a
  * broadcastable spine join for the fill.
  */
object TimeSeriesQL {

  final case class Command(name: String, kv: Map[String, String], args: Seq[String])

  private val CmdPattern = """(?s)\s*(\w+)\s*\{(.*)\}\s*""".r

  /** Split on top-level `|`, then each command `name{body}`; body items
    * are `key="value"` / `key='value'` pairs or bare positional args
    * (comma-split outside quotes). */
  def parse(query: String): Seq[Command] = {
    def splitTop(s: String, sep: Char): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var quote: Char = 0
      s.foreach { ch =>
        if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') { quote = ch; cur += ch }
        else if (ch == sep) { out += cur.toString; cur.clear() }
        else cur += ch
      }
      out += cur.toString
      out.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    splitTop(query, '|').map {
      case CmdPattern(name, body) =>
        val items = splitTop(body, ',')
        val kv = scala.collection.mutable.Map.empty[String, String]
        val args = scala.collection.mutable.ArrayBuffer.empty[String]
        items.foreach { it =>
          val eq = it.indexOf('=')
          if (eq > 0 && !it.take(eq).trim.contains(' ')) {
            val v = it.substring(eq + 1).trim
            kv(it.take(eq).trim) = v.stripPrefix("\"").stripSuffix("\"")
              .stripPrefix("'").stripSuffix("'")
          } else args += it.trim
        }
        Command(name, kv.toMap, args.toSeq)
      case other =>
        throw new IllegalArgumentException(s"M3QL: cannot parse command '$other'")
    }
  }

  private def unitSeconds(u: String): Double = u.toUpperCase match {
    case "SECONDS" => 1.0
    case "MILLISECONDS" => 1e-3
    case "MICROSECONDS" => 1e-6
    case "NANOSECONDS" => 1e-9
    case "MINUTES" => 60.0
    case "HOURS" => 3600.0
    case other => throw new IllegalArgumentException(s"ts_unit: $other")
  }

  /** Plan + run an M3QL range query. `resolve` maps a table name to its
    * DataFrame (e.g. `Tables(spark, dir).table`). */
  def query(resolve: String => DataFrame, q: String,
      startSeconds: Long, endSeconds: Long, stepSeconds: Long): DataFrame = {
    val cmds = parse(q)
    require(cmds.nonEmpty && cmds.head.name == "fetch",
      "M3QL: query must start with fetch{...}")
    val fetch = cmds.head
    val table = fetch.kv.getOrElse("table",
      throw new IllegalArgumentException("fetch: table is required"))
    val tsCol = fetch.kv.getOrElse("ts_column", "ts")
    val valueCol = fetch.kv.get("value")
    val filter = fetch.kv.get("filter")

    val aggCmd = cmds.find(c => Set("sum", "min", "max", "avg", "count")(c.name))
      .getOrElse(throw new IllegalArgumentException(
        "M3QL: an aggregation command (sum/min/max/avg/count) is required"))
    val tags = aggCmd.args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

    val df0 = resolve(table)
    // epoch seconds view of the time column: native timestamps
    // directly, numerics via ts_unit
    val tsSec: Column = df0.schema(tsCol).dataType match {
      case TimestampType | TimestampNTZType =>
        (unix_millis(col(tsCol).cast(TimestampType)) / 1000.0)
      case _ =>
        col(tsCol).cast(DoubleType) * lit(unitSeconds(
          fetch.kv.getOrElse("ts_unit", "SECONDS")))
    }
    val base = filter.map(df0.filter).getOrElse(df0)
      .withColumn("__ts_sec", tsSec)
      // [start, end] inclusive (RangeTimeSeriesRequest contract)
      .filter(col("__ts_sec") >= startSeconds && col("__ts_sec") <= endSeconds)
      .withColumn("__bucket",
        floor((col("__ts_sec") - startSeconds) / stepSeconds).cast(LongType))

    val v = valueCol.map(c => col(c).cast(DoubleType)).getOrElse(lit(1.0))
    val aggExpr = aggCmd.name match {
      case "sum" => sum(v)
      case "min" => min(v)
      case "max" => max(v)
      case "avg" => avg(v)
      case "count" => count(lit(1)).cast(DoubleType)
    }
    val agg = base.groupBy(col("__bucket") +: tags.map(col): _*)
      .agg(aggExpr.as("value"))

    val PostStages = Set("keepLastValue", "transformNull", "rate",
      "increase", "offset", "topk", "bottomk")
    val post = cmds.filter(c => PostStages(c.name))
    // series-relative stages (fill, rate, offset) need the dense bucket
    // spine (the plugin's TimeBuckets: every step bucket exists, empty
    // ones null); pure series selection (topk/bottomk) does not
    val needsSpine = post.exists(c => c.name != "topk" && c.name != "bottomk")
    val seriesW = org.apache.spark.sql.expressions.Window
      .partitionBy(tags.map(col): _*).orderBy(col("__bucket"))
    val result = {
      val start =
        if (!needsSpine) agg
        else {
          val n = (endSeconds - startSeconds) / stepSeconds + 1
          val spark = df0.sparkSession
          val spine = broadcast(spark.range(n).select(col("id").as("__bucket")))
          if (tags.isEmpty) spine.join(agg, Seq("__bucket"), "left")
          else {
            val series = agg.select(tags.map(col): _*).distinct()
            spine.crossJoin(broadcast(series))
              .join(agg, "__bucket" +: tags, "left")
          }
        }
      post.foldLeft(start) { (d, f) =>
        f.name match {
          case "keepLastValue" =>
            d.withColumn("value", last(col("value"), ignoreNulls = true)
              .over(seriesW.rowsBetween(Long.MinValue, 0)))
          case "transformNull" =>
            val dflt = f.args.headOption.map(_.toDouble).getOrElse(0.0)
            d.withColumn("value", coalesce(col("value"), lit(dflt)))
          // delta vs the previous bucket of the same series (the first
          // bucket has no predecessor → null, Prom/M3 convention)
          case "increase" =>
            d.withColumn("value", col("value") - lag(col("value"), 1).over(seriesW))
          // per-second rate: increase / step
          case "rate" =>
            d.withColumn("value",
              (col("value") - lag(col("value"), 1).over(seriesW)) / stepSeconds)
          // time shift: value(t) = value(t - offsetSeconds); the
          // argument is seconds, converted to whole buckets
          case "offset" =>
            val offSec = f.args.headOption.map(_.toLong).getOrElse(
              throw new IllegalArgumentException("offset: seconds argument required"))
            // reject silently-lossy offsets rather than truncating
            require(offSec > 0 && offSec % stepSeconds == 0,
              s"offset{$offSec}: must be a positive multiple of the " +
                s"step ($stepSeconds s)")
            val shift = (offSec / stepSeconds).toInt
            d.withColumn("value", lag(col("value"), shift).over(seriesW))
          // keep the n series with the largest (smallest) range-total
          // value; all buckets of a kept series survive
          case "topk" | "bottomk" =>
            require(tags.nonEmpty, s"${f.name}: requires grouping tags")
            val n = f.args.headOption.map(_.toInt).getOrElse(
              throw new IllegalArgumentException(s"${f.name}: k argument required"))
            val totals = d.groupBy(tags.map(col): _*)
              .agg(sum(col("value")).as("__total"))
            val rankW = org.apache.spark.sql.expressions.Window
              .orderBy((if (f.name == "topk") col("__total").desc
                else col("__total").asc) +: tags.map(c => col(c).asc): _*)
            val kept = totals
              .withColumn("__rk", row_number().over(rankW))
              .filter(col("__rk") <= n)
              .select(tags.map(col): _*)
            d.join(broadcast(kept), tags)
        }
      }
    }
    result
      .withColumn("bucket_seconds",
        lit(startSeconds) + col("__bucket") * lit(stepSeconds))
      .select(col("bucket_seconds") +: tags.map(col) :+ col("value"): _*)
  }
}
