package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registered query: a Spark build function and (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (driver hashes values): every query ends with an
  * explicit ORDER BY on exact-typed columns in BOTH engines, and every
  * floating aggregate is either computed exactly (decimal-cast sums) or
  * rounded coarsely enough that cross-engine double noise (≤ ~1e-12
  * relative) cannot flip the rounded value.
  */
final case class GQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QH {
  /** Exact money/quantity arithmetic: cast to decimal before summing so
    * Spark and DuckDB produce bit-identical doubles regardless of
    * accumulation order. */
  def dec(c: Column): Column = c.cast(DecimalType(20, 4))
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Shared exact-verification slice bound for the approximate-operator
    * property oracles (q_dedup_* / embedding queries): the SAME
    * constant is rendered into both the Spark query and the DuckDB
    * oracle SQL, so the two sides cannot silently drift. */
  val PropSlice = 200
}
