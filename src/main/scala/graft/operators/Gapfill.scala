package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gapfill: densify a time-bucketed aggregate so every (bucket, group)
  * combination exists, filling missing measures with a constant
  * (FILL_DEFAULT) or the previous bucket's value (FILL_PREVIOUS).
  *
  * Reference semantics: apache/pinot
  * `pinot-core/.../query/reduce/GapfillProcessor.java:48`,
  * `util/GapfillUtils.java:40` (fill types DEFAULT / PREVIOUS).
  *
  * Scale design: the time spine is `sequence()` + `explode` — generated
  * distributed, never collected to the driver. The spine × groups grid is
  * built by a broadcast-able cross join (spine and distinct-groups are both
  * tiny relative to the fact table), then one left join against the
  * already-aggregated buckets (shuffle on (bucket, group)) and one window
  * pass per group for FILL_PREVIOUS. No step touches the raw fact rows more
  * than the single aggregation pass.
  */
object Gapfill {

  /** Fill spec for one measure column of the aggregated input. */
  sealed trait Fill { def column: String }
  final case class FillDefault(column: String, default: Column) extends Fill
  final case class FillPrevious(column: String) extends Fill

  /** @param aggregated  DataFrame with columns: bucketCol (timestamp),
    *                    groupCols, measure columns.
    * @param step        bucket width, e.g. "1 hour" (SQL interval string).
    */
  def gapfill(
      spark: SparkSession,
      aggregated: DataFrame,
      bucketCol: String,
      groupCols: Seq[String],
      step: String,
      fills: Seq[Fill]): DataFrame = {

    val bounds = aggregated.agg(
      min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr(s"INTERVAL $step"))).as(bucketCol))
    val groups = aggregated.select(groupCols.map(col): _*).distinct()
    val grid = spine.crossJoin(broadcast(groups))

    val joined = grid.join(aggregated, Seq(bucketCol) ++ groupCols, "left")

    fills.foldLeft(joined) {
      case (df, FillDefault(c, d)) => df.withColumn(c, coalesce(col(c), d))
      case (df, FillPrevious(c)) =>
        val w = Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Post-fill aggregation (reference `BaseGapfillProcessor.java` /
    * `GapfillUtils.java:40` aggregate-gapfill-aggregate): re-aggregate
    * the DENSIFIED series into coarser buckets — e.g. a daily average
    * of a gap-filled hourly series, where missing hours contribute
    * their filled value instead of silently shrinking the denominator.
    *
    * @param coarseBucket expression over the fill-grain bucket column
    *                     (e.g. `date_trunc("day", col("bucket"))`)
    * @param aggs         aggregate columns over the filled measures
    */
  def gapfillAggregate(
      spark: SparkSession,
      aggregated: DataFrame,
      bucketCol: String,
      groupCols: Seq[String],
      step: String,
      fills: Seq[Fill],
      coarseBucket: Column,
      coarseBucketName: String,
      aggs: Seq[Column]): DataFrame = {
    val filled = gapfill(spark, aggregated, bucketCol, groupCols, step, fills)
    filled
      .withColumn(coarseBucketName, coarseBucket)
      .groupBy((col(coarseBucketName) +: groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The reference's RAW-SELECTION gapfill
    * (`GapfillProcessor.java:173-238` `gapfill`): for every time bucket
    * in [startMs, endMs) emit every raw row whose bucket equals it —
    * ORIGINAL MULTIPLICITY, no aggregation — plus ONE synthesized row
    * per TIMESERIESON series key with no raw row in that bucket.
    * FILL_PREVIOUS carries the series' most recent raw value (rows
    * before the window seed it, `putRawRowsIntoTimeBucket:352`);
    * FILL_DEFAULT / no previous value falls back to the type default
    * (`GapfillUtils.getDefaultValue`). The series-key universe is all
    * keys observed ANYWHERE in the raw result before endMs — a key
    * first seen in bucket 7 is back-filled from bucket 0 on, exactly as
    * the processor's upfront `_groupByKeys` collection behaves.
    *
    * Scale design: raw rows pass through untouched; the synthesized
    * side is (spine × series) anti-joined against the observed
    * (bucket, series) pairs — buckets and series are both tiny relative
    * to the fact table — and FILL_PREVIOUS is ONE window pass over
    * carriers ∪ markers partitioned by series, never a driver loop.
    *
    * @param raw       rows carrying `bucketCol` (LONG epoch millis,
    *                  already bucketed), the series columns, and the
    *                  fill columns. Rows with bucket < startMs seed
    *                  FILL_PREVIOUS; rows ≥ endMs are ignored.
    * @param orderCol  optional intra-bucket tiebreaker for which raw
    *                  row is "the previous value" when a series has
    *                  several rows in one bucket (the processor keeps
    *                  the last one in merged order).
    */
  def gapfillSelect(
      raw: DataFrame,
      bucketCol: String,
      seriesCols: Seq[String],
      startMs: Long,
      endMs: Long,
      stepMs: Long,
      fills: Seq[Fill],
      orderCol: Option[String] = None): DataFrame = {
    require(stepMs > 0 && endMs > startMs, "empty gapfill window")
    val outCols = raw.columns.filterNot(orderCol.contains).toSeq
    val spark = raw.sparkSession
    val considered = raw.filter(col(bucketCol) < endMs)
    val inWindow = considered.filter(col(bucketCol) >= startMs)

    val spine = spark.range(startMs, endMs, stepMs)
      .select(col("id").as(bucketCol))
    val series = considered.select(seriesCols.map(col): _*).distinct()
    val grid = spine.crossJoin(broadcast(series))
    // buckets where a series has raw rows need no synthesized row
    val missing = grid.join(inWindow.select((col(bucketCol) +:
        seriesCols.map(col)): _*).distinct(),
      bucketCol +: seriesCols, "left_anti")

    val fillCols = fills.map(_.column)
    val passthrough = outCols.filterNot(c =>
      c == bucketCol || seriesCols.contains(c) || fillCols.contains(c))

    // carriers (raw values, seeds included) ∪ markers (missing cells):
    // the last raw value at or before each marker's bucket is the
    // processor's _previousByGroupKey state when it synthesizes the row
    val order = orderCol.map(col).getOrElse(lit(0))
    val carriers = considered.select((col(bucketCol) +:
      seriesCols.map(col)) ++ fillCols.map(col) ++
      Seq(order.as("__ord"), lit(1).as("__raw")): _*)
    val markers = missing.select((col(bucketCol) +:
      seriesCols.map(col)) ++ fillCols.map(c =>
        lit(null).cast(considered.schema(c).dataType).as(c)) ++
      Seq(lit(null).cast("long").as("__ord"), lit(0).as("__raw")): _*)
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(bucketCol), col("__raw"), col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledMarkers = fills.foldLeft(carriers.unionByName(markers)) {
      case (df, FillPrevious(c)) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      case (df, FillDefault(c, d)) => df.withColumn(c, coalesce(col(c), d))
    }.filter(col("__raw") === 0 && col(bucketCol) >= startMs)
      // a series with no previous value falls back to the default
      .select((col(bucketCol) +: seriesCols.map(col)) ++ fills.map {
        case FillPrevious(c) => coalesce(col(c),
          lit(typeDefault(considered.schema(c).dataType))
            .cast(considered.schema(c).dataType)).as(c)
        case FillDefault(c, _) => col(c).as(c)
      }: _*)
    // synthesized rows carry defaults for the untouched columns
    val synthesized = passthrough.foldLeft(filledMarkers) { (df, c) =>
      df.withColumn(c, lit(typeDefault(raw.schema(c).dataType))
        .cast(raw.schema(c).dataType))
    }.select(outCols.map(col): _*)

    inWindow.select(outCols.map(col): _*).unionByName(synthesized)
  }

  /** `GapfillUtils.getDefaultValue` — the zero the processor
    * synthesizes when no fill expression / no previous value applies. */
  private def typeDefault(dt: org.apache.spark.sql.types.DataType): Any =
    dt match {
      case org.apache.spark.sql.types.StringType => ""
      case _: org.apache.spark.sql.types.DecimalType => BigDecimal(0)
      case org.apache.spark.sql.types.BooleanType => false
      case _ => 0
    }
}
