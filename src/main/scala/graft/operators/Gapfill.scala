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
}
