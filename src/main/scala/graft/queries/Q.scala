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

  /** Exact sum for ≤4-dp-exact inputs (every dsum call site: money,
    * quantities, and the 4-dp synthetic `value` column — audited and
    * machine-checked r14). r14 perf: accumulate the 4-dp-scaled LONG
    * (sum buffers beyond decimal precision 18 leave the UnsafeRow
    * long slot and serialize a BigDecimal per row — measured 2.1×
    * slower), then ONE exact decimal division + a single
    * rational→double rounding at the end, identical to
    * `CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE)`: per-row,
    * round(x·10⁴) equals the decimal(20,4) cast because x·10⁴ is
    * integer-valued ± ≪0.5 (no scale-4 ties exist in ≤4-dp data);
    * the long sum is the same exact integer; S/10⁴ divides exactly
    * (scale ≥ 4) and casts to the same nearest double. ANSI mode
    * errors loudly on (unreachable: ~3·10⁴× headroom at sf1000) long
    * overflow rather than wrapping. NOT valid for inputs with >4 dp
    * of true precision — those round differently at scale-4 ties;
    * use `sum(dec(c)).cast(DoubleType)` there. */
  def dsum(c: Column): Column =
    (sum(round(c * 10000).cast("long")).cast(DecimalType(28, 0)) /
      lit(10000)).cast(DoubleType)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Shared exact-verification slice bound for the approximate-operator
    * property oracles (q_dedup_* / embedding queries): the SAME
    * constant is rendered into both the Spark query and the DuckDB
    * oracle SQL, so the two sides cannot silently drift. */
  val PropSlice = 200
}
