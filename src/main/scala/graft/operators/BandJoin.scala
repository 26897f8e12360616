package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) non-equi joins — the scalable plan for range
  * predicates that would otherwise be a nested-loop cross product.
  *
  * Reference surface: apache/pinot's generic non-equi join
  * (`NonEquiJoinOperator.java:35`) is a nested loop; at 100 TB a
  * `|a − b| <= w` or `a BETWEEN lo AND hi` join must instead shuffle
  * both sides on a derived BUCKET key so candidates are co-located:
  * any pair within `w` lies in the same or an adjacent bucket of
  * width `w`, so 3 equi-probes replace the cross product. Candidate
  * count is bounded by band density, not |L|·|R|.
  */
object BandJoin {

  /** Join rows where |leftVal − rightVal| <= width.
    *
    * Left side carries its bucket; the right side is expanded 3× to
    * (b−1, b, b+1), the join is a plain equi-join on the bucket (hash
    * shuffle both sides, broadcast if one is small — Catalyst/AQE
    * decide), and the exact predicate filters the candidates.
    * floor monotonicity guarantees completeness:
    * |va − vb| <= w ⟹ |floor(va/w) − floor(vb/w)| <= 1. */
  def absDiffJoin(
      left: DataFrame,
      right: DataFrame,
      leftVal: Column,
      rightVal: Column,
      width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val l = left.withColumn("__band", floor(leftVal / width).cast("long"))
    val r = right
      .withColumn("__b0", floor(rightVal / width).cast("long"))
      .withColumn("__band", explode(array(col("__b0") - 1, col("__b0"),
        col("__b0") + 1)))
      .drop("__b0")
    l.join(r, Seq("__band"))
      .filter(abs(leftVal - rightVal) <= width)
      .drop("__band")
  }

  /** Join rows where `pointVal` falls in [loVal, hiVal] (interval join).
    * Intervals are exploded to every bucket they overlap (intervals
    * spanning many buckets expand accordingly — width should be chosen
    * near the typical interval length), points carry one bucket. */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointVal: Column,
      loVal: Column,
      hiVal: Column,
      width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val p = points.withColumn("__band", floor(pointVal / width).cast("long"))
    val iv = intervals
      .withColumn("__band",
        explode(sequence(floor(loVal / width).cast("long"),
          floor(hiVal / width).cast("long"))))
    p.join(iv, Seq("__band"))
      .filter(pointVal >= loVal && pointVal <= hiVal)
      .drop("__band")
  }
}
