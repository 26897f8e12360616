package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join — the scale path for point-in-region
  * joins the reference serves through its geospatial filter surface
  * (`ScalarFunctions`/H3 index; a point-in-polygon WHERE against a
  * literal region is `q_geo_polygon`, this operator is the JOIN form
  * against a region TABLE).
  *
  * Candidate generation: every point hashes to exactly ONE grid cell
  * (two floor divisions, map-only); every region explodes to the cells
  * its bounding box covers (O(area / cellSize²) rows — regions are the
  * small side). The equi-join on the cell id replaces the quadratic
  * cross product, then the exact geometric predicate filters the
  * superset. With a broadcastable region table the plan is shuffle-free
  * on the point side at any scale; otherwise it is one hash shuffle on
  * the cell id. No point ever duplicates (one cell per point), so no
  * dedup pass is needed.
  */
object SpatialJoin {

  /** Inner-join points to axis-aligned boxes (half-open: xmin ≤ x <
    * xmax, ymin ≤ y < ymax — the same boundary rule as the engine's
    * ray-cast stContains on rectangles). For general polygons, join on
    * the polygon's bbox and apply stContains as a further filter. */
  def pointInBox(
      points: DataFrame, x: String, y: String,
      boxes: DataFrame, xmin: String, ymin: String,
      xmax: String, ymax: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0)
    val pc = points
      .withColumn("__cx", floor(col(x) / cellSize))
      .withColumn("__cy", floor(col(y) / cellSize))
    val bc = boxes
      .withColumn("__cx",
        explode(sequence(floor(col(xmin) / cellSize),
          floor(col(xmax) / cellSize))))
      .withColumn("__cy",
        explode(sequence(floor(col(ymin) / cellSize),
          floor(col(ymax) / cellSize))))
    pc.join(bc, Seq("__cx", "__cy"))
      .filter(col(x) >= col(xmin) && col(x) < col(xmax) &&
        col(y) >= col(ymin) && col(y) < col(ymax))
      .drop("__cx", "__cy")
  }

  /** Radius join: all (left, right) pairs within Euclidean `radius`.
    * Grid cell size = radius, so a match can only lie in the right
    * point's own cell or one of its 8 neighbors: the LEFT side
    * explodes to that fixed 9-cell neighborhood (constant ×9, no data
    * dependence), the right side maps to its single cell, and the
    * equi-join on the cell bounds candidates — each true pair meets
    * exactly once, so no dedup pass. Exact predicate compares SQUARED
    * distance (no sqrt in the hot path, and products of exact doubles
    * compare identically across engines). */
  def pointsWithinRadius(
      left: DataFrame, lx: String, ly: String,
      right: DataFrame, rx: String, ry: String,
      radius: Double): DataFrame = {
    require(radius > 0)
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val lc = left
      .withColumn("__o", explode(typedLit(offsets)))
      .withColumn("__cx", floor(col(lx) / radius) + col("__o._1"))
      .withColumn("__cy", floor(col(ly) / radius) + col("__o._2"))
      .drop("__o")
    val rc = right
      .withColumn("__cx", floor(col(rx) / radius))
      .withColumn("__cy", floor(col(ry) / radius))
    val d2 = (col(lx) - col(rx)) * (col(lx) - col(rx)) +
      (col(ly) - col(ry)) * (col(ly) - col(ry))
    lc.join(rc, Seq("__cx", "__cy"))
      .filter(d2 <= radius * radius)
      .drop("__cx", "__cy")
  }
}
