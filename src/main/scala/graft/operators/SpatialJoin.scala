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
}
