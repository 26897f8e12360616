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

  /** Write `df` as a bucketed+sorted managed table. `bloomNdv` turns on
    * a parquet bloom filter per column (value = expected NDV) — see
    * [[bloomOptions]]. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      bloomNdv: Map[String, Long] = Map.empty): Unit = {
    val w = df.write.mode("overwrite")
      .options(bloomOptions(bloomNdv))
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Parquet writer options enabling a bloom filter on each column —
    * the `BloomFilterSegmentPruner` analog
    * (`pinot-core/.../query/pruner/BloomFilterSegmentPruner.java:66-83`
    * prunes whole segments on EQ / small-IN predicates over
    * high-cardinality columns; `segment-local/.../index/bloom/
    * BloomIndexType.java` is the per-segment filter). Parquet stores
    * the filter per ROW GROUP and the scan's row-group filter
    * (statistics → dictionary → bloom) skips groups whose filter
    * definitely excludes every EQ/IN value — row-group min/max can't
    * help on an UNSORTED high-cardinality column, which is exactly the
    * case the reference targets. The written filter sizes itself from
    * the expected per-group NDV (fpp 1%). */
  def bloomOptions(bloomNdv: Map[String, Long]): Map[String, String] =
    bloomNdv.flatMap { case (c, ndv) => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString)
    }

  /** Plain path-based parquet layout with bloom-filtered columns. */
  def writeParquetWithBloom(df: DataFrame, path: String,
      bloomNdv: Map[String, Long]): Unit =
    df.write.mode("overwrite").options(bloomOptions(bloomNdv))
      .parquet(path)

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
