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
    // NULL coordinates must answer NULL, not "not inside": the
    // accumulator's otherwise() arm swallows a NULL comparison, so
    // without this guard a NULL point reports false and its NEGATED
    // forms (= 0, NOT) wrongly match — the exact null-leak the
    // reference fixed in its H3 filter (H3IndexQueriesTest
    // testH3IndexWithNullHandling). A NULL polygon already propagates
    // through aggregate(NULL, ...).
    when(px.isNull || py.isNull,
      lit(null).cast("boolean")).otherwise(crossings % 2 === 1)
  }

  /** ST_Within(point, poly) = ST_Contains(poly, point). */
  def stWithin(point: Column, poly: Column): Column = stContains(poly, point)

  /** Planar polygon area via the shoelace formula (absolute value). */
  def stArea(poly: Column): Column =
    abs(aggregate(edges(poly), lit(0.0), (acc, e) =>
      acc + (e.getField("a").getField("x") * e.getField("b").getField("y") -
        e.getField("b").getField("x") * e.getField("a").getField("y")))) / 2.0

  /** WKT 'POLYGON ((x y, x y, ...))' → array<struct<x,y>> (outer ring
    * only; the closing repeat vertex, if present, is harmless to the
    * cyclic edge walk). Feeds [[stContains]]/[[stArea]]. */
  def wktPolygon(wkt: Column): Column = {
    val ring = regexp_extract(wkt, "POLYGON\\s*\\(\\(([^)]*)\\)\\)", 1)
    transform(split(ring, ","), p => struct(
      split(trim(p), "\\s+").getItem(0).cast("double").as("x"),
      split(trim(p), "\\s+").getItem(1).cast("double").as("y")))
  }

  // ——— H3 grid subset (geoToH3 / gridDistance / gridDisk — reference
  // `TransformFunctionType.java:195-229`, `H3IndexFilterOperator.java`).
  //
  // DOCUMENTED APPROXIMATION: a flat axial hex grid on the
  // equirectangular projection, NOT Uber's icosahedral H3. Cell edge
  // at resolution r is 20°/√7^r — the same √7 area-per-resolution
  // scaling as H3 — and the cell id packs (res, q, r) into a long:
  // res·2^50 + (q+2^24)·2^25 + (r+2^24). Valid for res 0..14 (q,r fit
  // 25 bits). The hex-grid identities users rely on hold exactly:
  // gridDistance is the axial hex metric and gridDisk(c, k) has
  // 3k(k+1)+1 cells. Not interoperable with external H3 ids. ———

  private val Sqrt3 = math.sqrt(3.0)

  private def hexSize(res: Column): Column =
    lit(20.0) / pow(lit(math.sqrt(7.0)), res.cast("double"))

  /** Encoded hex cell of (lng, lat) at `res` (geoToH3(lng, lat, res)). */
  def geoToH3(lng: Column, lat: Column, res: Column): Column = {
    val s = hexSize(res)
    // fractional axial coords (pointy-top): q = (√3/3·x − y/3)/s, r = 2y/3s
    val qf = (lng.cast("double") * (Sqrt3 / 3.0) - lat.cast("double") / 3.0) / s
    val rf = lat.cast("double") * (2.0 / 3.0) / s
    // cube rounding: round each of (x=q, z=r, y=−q−r), then repair the
    // coordinate with the largest rounding error
    val rx = round(qf); val rz = round(rf); val ry = round(-qf - rf)
    val dx = abs(rx - qf); val dz = abs(rz - rf); val dy = abs(ry + qf + rf)
    val q = when(dx > dy && dx > dz, -ry - rz).otherwise(rx).cast("long")
    val r = when(!(dx > dy && dx > dz) && !(dy > dz), -rx - ry)
      .otherwise(rz).cast("long")
    res.cast("long") * lit(1125899906842624L) + // 2^50
      (q + 16777216L) * 33554432L +             // (q+2^24)·2^25
      (r + 16777216L)
  }

  def h3CellQ(cell: Column): Column =
    ((cell % lit(1125899906842624L)) / lit(33554432L)).cast("long") - 16777216L
  def h3CellR(cell: Column): Column =
    (cell % lit(33554432L)).cast("long") - 16777216L
  def h3CellRes(cell: Column): Column =
    (cell / lit(1125899906842624L)).cast("long")

  /** Cell center back to struct(x=lng, y=lat) (h3ToGeo). */
  def h3ToGeo(cell: Column): Column = {
    val s = hexSize(h3CellRes(cell))
    val q = h3CellQ(cell).cast("double"); val r = h3CellR(cell).cast("double")
    struct((s * (q * Sqrt3 + r * (Sqrt3 / 2.0))).as("x"),
      (s * (r * 1.5)).as("y"))
  }

  /** Hex-grid distance between two cells of the same resolution
    * (gridDistance): (|dq| + |dr| + |dq+dr|) / 2. */
  def gridDistance(a: Column, b: Column): Column = {
    val dq = h3CellQ(a) - h3CellQ(b)
    val dr = h3CellR(a) - h3CellR(b)
    // the sum is always even; integral div keeps the LongType
    call_function("div", abs(dq) + abs(dr) + abs(dq + dr), lit(2L))
  }

  /** All cells within grid distance k of `cell` (gridDisk / kRing):
    * 3k(k+1)+1 ids, row-major order (H3 orders the disk as a spiral —
    * set-equal, order-divergent). k must be a literal. */
  def gridDisk(cell: Column, k: Int): Column =
    flatten(transform(sequence(lit(-k), lit(k)), dq =>
      transform(
        sequence(greatest(lit(-k), -dq - k), least(lit(k), -dq + k)),
        dr => cell + dq.cast("long") * 33554432L + dr.cast("long"))))
}
