package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. the skew is in a broadcast-ineligible
  * aggregation, or a deterministic layout is required).
  *
  * Left rows get a random-but-deterministic salt in [0, salts); right
  * rows are replicated once per salt value. The join key becomes
  * (key, salt), spreading one hot key over `salts` reducers. Replication
  * cost is salts × |right|, so use it with a small-to-medium right side
  * and let AQE handle the rest.
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    // deterministic pseudo-random salt: hash of the whole left row's key
    // + a per-row tiebreaker column would also work; monotonically
    // increasing id keeps it cheap and uniform
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
