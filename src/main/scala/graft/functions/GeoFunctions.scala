package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial subset (reference `TransformFunctionType.java:195-229`,
  * `ScalarFunctions` geo family): points as struct(x, y), polygons as
  * array<struct(x, y)> (closed implicitly). ST_Distance (haversine) and
  * ST_Point live in [[PinotFunctions]]; here the polygon operators —
  * all pure higher-order expressions, codegen'd, so a point-in-polygon
  * filter runs at scan speed (the reference needs an H3 index for this;
  * Spark's columnar scan + these expressions replace it, with
  * partition-level pruning coming from a geohash/grid partition column
  * at write time).
  */
object GeoFunctions {

  def stPoint(x: Column, y: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"))

  /** Edge list of a polygon: (vertex i, vertex i+1 cyclically). */
  private def edges(poly: Column): Column = {
    val n = size(poly)
    transform(sequence(lit(1), n), i =>
      struct(element_at(poly, i).as("a"),
        element_at(poly, when(i === n, 1).otherwise(i + 1)).as("b")))
  }

  /** Ray-casting point-in-polygon: odd number of edge crossings of the
    * rightward ray from the point. Boundary behavior follows the strict
    * crossing rule (points exactly on an edge are implementation-
    * defined, as in the reference's JTS-backed ST_Contains). */
  def stContains(poly: Column, point: Column): Column = {
    val px = point.getField("x"); val py = point.getField("y")
    val crossings = aggregate(edges(poly), lit(0), (acc, e) => {
      val ax = e.getField("a").getField("x"); val ay = e.getField("a").getField("y")
      val bx = e.getField("b").getField("x"); val by = e.getField("b").getField("y")
      val straddles = (ay > py) =!= (by > py)
      val xAtY = (bx - ax) * (py - ay) / (by - ay) + ax
      when(straddles && px < xAtY, acc + 1).otherwise(acc)
    })
    crossings % 2 === 1
  }

  /** ST_Within(point, poly) = ST_Contains(poly, point). */
  def stWithin(point: Column, poly: Column): Column = stContains(poly, point)

  /** Planar polygon area via the shoelace formula (absolute value). */
  def stArea(poly: Column): Column =
    abs(aggregate(edges(poly), lit(0.0), (acc, e) =>
      acc + (e.getField("a").getField("x") * e.getField("b").getField("y") -
        e.getField("b").getField("x") * e.getField("a").getField("y")))) / 2.0
}
