package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) table layout: the Spark analog of the
  * reference's partitioned segment assignment + partition-aware routing
  * (`pinot-broker/.../MultiPartitionColumnsSegmentPruner.java`,
  * `PinotRelDistributionTraitRule` — shuffle elimination when both
  * sides are partitioned on the join key).
  *
  * Writing both fact tables bucketed by the join key lets every later
  * equi-join/aggregation on that key run with ZERO exchanges — at
  * 100 TB this converts the nightly join's full-network shuffle into a
  * local merge per bucket. Requires the session catalog (bucket
  * metadata lives in the table definition, not the files).
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — planner elides
    * both exchanges (verify via .explain: no Exchange below the join). */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
