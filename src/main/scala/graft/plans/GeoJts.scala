package graft.plans

import java.nio.ByteBuffer

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reference-WIRE-FORMAT geometry engine over JTS (the same library the
  * reference builds on — `jts-core` ships on Spark's classpath).
  *
  * The blob layout is a line-by-line port of the reference's
  * `GeometrySerializer.java` (pinot-segment-local/.../utils/): a type
  * byte (`GeometryType.java:23-29` — POINT 0, MULTI_POINT 1,
  * LINE_STRING 2, MULTI_LINE_STRING 3, POLYGON 4, MULTI_POLYGON 5,
  * GEOMETRY_COLLECTION 6; high bit 0x80 = geography, i.e. SRID 4326 —
  * `GeometryUtils.java:39-41`), then big-endian doubles/ints:
  * point = 2 doubles (NaN,NaN if empty); multipoint = count + coords;
  * polyline/polygon = numParts, numPoints, part start indexes, coords
  * — polygon rings canonicalized shell-clockwise / hole-counter-
  * clockwise so the reader reconstructs ring roles from orientation.
  * Blobs written here deserialize in a reference deployment and vice
  * versa; geometry BYTES columns migrate unchanged.
  *
  * Function semantics mirror the reference's geospatial
  * `ScalarFunctions.java`: ST_Contains/ST_Within/ST_Equals return INT
  * 0/1, ST_Distance is planar for geometry and the reference's
  * Vincenty great-circle (R = 6371.01 km) for geography, mixing
  * geometry and geography throws. The legacy struct-based point/
  * polygon subset (`functions/GeoFunctions`) stays registered for the
  * existing query surface; this blob engine carries every other
  * geometry type.
  */
object GeoJts {

  val GeographySrid = 4326
  val EarthRadiusM: Double = 6371.01 * 1000.0

  private val geomFactory = new GeometryFactory()
  private val geogFactory =
    new GeometryFactory(new PrecisionModel(), GeographySrid)

  def isGeography(g: Geometry): Boolean = g.getSRID == GeographySrid

  // ——— serde (GeometrySerializer.java port) ———

  private def typeId(g: Geometry): Int = g.getGeometryType match {
    case "Point" => 0
    case "MultiPoint" => 1
    case "LineString" | "LinearRing" => 2
    case "MultiLineString" => 3
    case "Polygon" => 4
    case "MultiPolygon" => 5
    case "GeometryCollection" => 6
    case t => throw new IllegalArgumentException(s"Unsupported geometry: $t")
  }

  private def byteSize(g: Geometry): Int = 1 + (g.getGeometryType match {
    case "Point" => 16
    case "MultiPoint" => 4 + g.getNumPoints * 16
    case "LineString" | "LinearRing" | "MultiLineString" =>
      val numParts = if (g.getGeometryType == "MultiLineString")
        g.getNumGeometries else if (g.getNumPoints > 0) 1 else 0
      8 + numParts * 4 + g.getNumPoints * 16
    case "Polygon" | "MultiPolygon" =>
      var numParts = 0
      for (i <- 0 until g.getNumGeometries) {
        val p = g.getGeometryN(i).asInstanceOf[Polygon]
        if (p.getNumPoints > 0) numParts += p.getNumInteriorRing + 1
      }
      if (numParts == 0) 8 else 8 + numParts * 4 + g.getNumPoints * 16
    case "GeometryCollection" =>
      (0 until g.getNumGeometries).map(i => byteSize(g.getGeometryN(i))).sum
    case t => throw new IllegalArgumentException(s"Unsupported geometry: $t")
  })

  def serialize(g: Geometry): Array[Byte] = {
    val bb = ByteBuffer.allocate(byteSize(g))
    write(bb, g)
    bb.array()
  }

  private def writeType(bb: ByteBuffer, id: Int, srid: Int): Unit = {
    var t = id.toByte
    if (srid == GeographySrid) t = (t | 0x80).toByte
    bb.put(t)
  }

  private def write(bb: ByteBuffer, g: Geometry): Unit = g.getGeometryType match {
    case "Point" =>
      writeType(bb, 0, g.getSRID)
      if (g.isEmpty) { bb.putDouble(Double.NaN); bb.putDouble(Double.NaN) }
      else { val c = g.getCoordinate; bb.putDouble(c.x); bb.putDouble(c.y) }
    case "MultiPoint" =>
      writeType(bb, 1, g.getSRID)
      bb.putInt(g.getNumPoints)
      g.getCoordinates.foreach { c => bb.putDouble(c.x); bb.putDouble(c.y) }
    case "LineString" | "LinearRing" | "MultiLineString" =>
      val multi = g.getGeometryType == "MultiLineString"
      writeType(bb, if (multi) 3 else 2, g.getSRID)
      val numPoints = g.getNumPoints
      val numParts = if (multi) g.getNumGeometries
        else if (numPoints > 0) 1 else 0
      bb.putInt(numParts); bb.putInt(numPoints)
      var idx = 0
      for (i <- 0 until numParts) {
        bb.putInt(idx); idx += g.getGeometryN(i).getNumPoints
      }
      g.getCoordinates.foreach { c => bb.putDouble(c.x); bb.putDouble(c.y) }
    case "Polygon" | "MultiPolygon" =>
      val multi = g.getGeometryType == "MultiPolygon"
      writeType(bb, if (multi) 5 else 4, g.getSRID)
      var numParts = 0
      for (i <- 0 until g.getNumGeometries) {
        val p = g.getGeometryN(i).asInstanceOf[Polygon]
        if (p.getNumPoints > 0) numParts += p.getNumInteriorRing + 1
      }
      bb.putInt(numParts); bb.putInt(g.getNumPoints)
      if (numParts > 0) {
        val partIndexes = new Array[Int](numParts)
        val shellPart = new Array[Boolean](numParts)
        var part = 0; var point = 0
        for (i <- 0 until g.getNumGeometries) {
          val p = g.getGeometryN(i).asInstanceOf[Polygon]
          partIndexes(part) = point; shellPart(part) = true; part += 1
          point += p.getExteriorRing.getNumPoints
          for (h <- 0 until p.getNumInteriorRing) {
            partIndexes(part) = point; shellPart(part) = false; part += 1
            point += p.getInteriorRingN(h).getNumPoints
          }
        }
        partIndexes.foreach(bb.putInt)
        val coords = g.getCoordinates.map(_.copy())
        for (part <- 0 until numParts) {
          val start = partIndexes(part)
          val end = if (part < numParts - 1) partIndexes(part + 1)
            else coords.length
          val cw = isClockwise(coords, start, end)
          // canonical: shells clockwise, holes counter-clockwise
          if ((shellPart(part) && !cw) || (!shellPart(part) && cw))
            reverse(coords, start, end)
        }
        coords.foreach { c => bb.putDouble(c.x); bb.putDouble(c.y) }
      }
    case "GeometryCollection" =>
      writeType(bb, 6, g.getSRID)
      for (i <- 0 until g.getNumGeometries) write(bb, g.getGeometryN(i))
    case t => throw new IllegalArgumentException(s"Unsupported geometry: $t")
  }

  private def isClockwise(cs: Array[Coordinate], start: Int, end: Int): Boolean = {
    var area = 0.0
    for (i <- start + 1 until end)
      area += (cs(i).x - cs(i - 1).x) * (cs(i).y + cs(i - 1).y)
    area += (cs(start).x - cs(end - 1).x) * (cs(start).y + cs(end - 1).y)
    area > 0
  }

  private def reverse(cs: Array[Coordinate], start: Int, end: Int): Unit = {
    var i = start; var j = end - 1
    while (i < j) { val t = cs(i); cs(i) = cs(j); cs(j) = t; i += 1; j -= 1 }
  }

  def deserialize(bytes: Array[Byte]): Geometry =
    read(ByteBuffer.wrap(bytes))

  private def read(bb: ByteBuffer): Geometry = {
    val typeByte = bb.get()
    val factory = if ((typeByte & 0x80) != 0) geogFactory else geomFactory
    readBody(bb, typeByte & 0x7f, factory)
  }

  private def readBody(bb: ByteBuffer, id: Int,
      factory: GeometryFactory): Geometry = id match {
    case 0 =>
      val x = bb.getDouble; val y = bb.getDouble
      if (x.isNaN || y.isNaN) factory.createPoint()
      else factory.createPoint(new Coordinate(x, y))
    case 1 =>
      val n = bb.getInt
      factory.createMultiPoint(
        Array.fill(n)(factory.createPoint(
          new Coordinate(bb.getDouble, bb.getDouble))))
    case 2 | 3 =>
      val multi = id == 3
      val numParts = bb.getInt
      if (numParts == 0)
        return if (multi) factory.createMultiLineString(Array())
          else factory.createLineString(Array[Coordinate]())
      val numPoints = bb.getInt
      val starts = Array.fill(numParts)(bb.getInt)
      val lengths = partLengths(starts, numPoints)
      val lines = lengths.map(n => factory.createLineString(
        Array.fill(n)(new Coordinate(bb.getDouble, bb.getDouble))))
      if (multi) factory.createMultiLineString(lines) else lines.head
    case 4 | 5 =>
      val multi = id == 5
      val numParts = bb.getInt
      if (numParts == 0)
        return if (multi) factory.createMultiPolygon(Array())
          else factory.createPolygon()
      val numPoints = bb.getInt
      val starts = Array.fill(numParts)(bb.getInt)
      val lengths = partLengths(starts, numPoints)
      var shell: LinearRing = null
      val holes = collection.mutable.ArrayBuffer[LinearRing]()
      val polygons = collection.mutable.ArrayBuffer[Polygon]()
      lengths.foreach { n =>
        val cs = Array.fill(n)(new Coordinate(bb.getDouble, bb.getDouble))
        if (isClockwise(cs, 0, cs.length)) {
          if (shell != null) {
            polygons += factory.createPolygon(shell, holes.toArray)
            holes.clear()
          }
          shell = factory.createLinearRing(cs)
        } else holes += factory.createLinearRing(cs)
      }
      polygons += factory.createPolygon(shell, holes.toArray)
      if (multi) factory.createMultiPolygon(polygons.toArray)
      else polygons.head
    case 6 =>
      val geoms = collection.mutable.ArrayBuffer[Geometry]()
      while (bb.hasRemaining) geoms += read(bb)
      factory.createGeometryCollection(geoms.toArray)
    case t => throw new IllegalArgumentException(s"Unexpected type id: $t")
  }

  private def partLengths(starts: Array[Int], numPoints: Int): Array[Int] = {
    val n = starts.length
    val lengths = new Array[Int](n)
    if (n > 1) {
      lengths(0) = starts(1)
      for (i <- 1 until n - 1) lengths(i) = starts(i + 1) - starts(i)
    }
    lengths(n - 1) = numPoints - starts(n - 1)
    lengths
  }

  // ——— reference scalar semantics ———

  def parseWkt(wkt: String, geography: Boolean): Array[Byte] =
    serialize(new WKTReader(
      if (geography) geogFactory else geomFactory).read(wkt))

  def parseWkb(wkb: Array[Byte], geography: Boolean): Array[Byte] =
    serialize(new WKBReader(
      if (geography) geogFactory else geomFactory).read(wkb))

  def sphericalDistance(a: Geometry, b: Geometry): Double = {
    require(a.isInstanceOf[Point] && b.isInstanceOf[Point],
      "geography distance requires points")
    val (lng1, lat1) = (a.getCoordinate.x, a.getCoordinate.y)
    val (lng2, lat2) = (b.getCoordinate.x, b.getCoordinate.y)
    val rl1 = math.toRadians(lat1); val rl2 = math.toRadians(lat2)
    val sin1 = math.sin(rl1); val cos1 = math.cos(rl1)
    val sin2 = math.sin(rl2); val cos2 = math.cos(rl2)
    val dLng = math.toRadians(lng1) - math.toRadians(lng2)
    val cosD = math.cos(dLng)
    val t1 = cos2 * math.sin(dLng)
    val t2 = cos1 * sin2 - sin1 * cos2 * cosD
    val t3 = sin1 * sin2 + cos1 * cos2 * cosD
    math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * EarthRadiusM
  }

  // ——— Column API ———

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def geomFromText(wkt: Column): Column = col(GeoFromText(ex(wkt), false))
  def geogFromText(wkt: Column): Column = col(GeoFromText(ex(wkt), true))
  def geomFromWkb(wkb: Column): Column = col(GeoFromWkb(ex(wkb), false))
  def geogFromWkb(wkb: Column): Column = col(GeoFromWkb(ex(wkb), true))
  def asText(g: Column): Column = col(GeoUnary(ex(g), "astext"))
  def asBinary(g: Column): Column = col(GeoUnary(ex(g), "asbinary"))
  def area(g: Column): Column = col(GeoUnary(ex(g), "area"))
  def geometryType(g: Column): Column = col(GeoUnary(ex(g), "type"))
  def toSphericalGeography(g: Column): Column = col(GeoUnary(ex(g), "togeog"))
  def toGeometry(g: Column): Column = col(GeoUnary(ex(g), "togeom"))
  def contains(a: Column, b: Column): Column = col(GeoBinaryOp(ex(a), ex(b), "contains"))
  def within(a: Column, b: Column): Column = col(GeoBinaryOp(ex(a), ex(b), "within"))
  def stEquals(a: Column, b: Column): Column = col(GeoBinaryOp(ex(a), ex(b), "equals"))
  def distance(a: Column, b: Column): Column = col(GeoBinaryOp(ex(a), ex(b), "distance"))
  def point(x: Column, y: Column, geography: Boolean = false): Column =
    col(GeoPoint(ex(x), ex(y), geography))
  def unionAgg(g: Column): Column =
    col(StUnionAgg(ex(g)).toAggregateExpression())
}

/** ST_GeomFromText / ST_GeogFromText over arbitrary WKT. */
case class GeoFromText(child: Expression, geography: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (geography) "st_geog_from_text" else "st_geom_from_text"
  override protected def nullSafeEval(input: Any): Any =
    GeoJts.parseWkt(input.toString, geography)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ST_GeomFromWKB / ST_GeogFromWKB (standard WKB in, blob out). */
case class GeoFromWkb(child: Expression, geography: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (geography) "st_geog_from_wkb" else "st_geom_from_wkb"
  override protected def nullSafeEval(input: Any): Any =
    GeoJts.parseWkb(input.asInstanceOf[Array[Byte]], geography)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ST_Point(x, y[, isGeography]) → blob. */
case class GeoPoint(x: Expression, y: Expression, geography: Boolean)
  extends BinaryExpression with CodegenFallback {
  override def left: Expression = x
  override def right: Expression = y
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_point"
  override def nullSafeEval(xv: Any, yv: Any): Any = {
    val factory = if (geography)
      new GeometryFactory(new PrecisionModel(), GeoJts.GeographySrid)
    else new GeometryFactory()
    GeoJts.serialize(factory.createPoint(new Coordinate(
      xv.asInstanceOf[Double], yv.asInstanceOf[Double])))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(x = l, y = r)
}

/** Unary blob functions: asText, asBinary(WKB), area, geometryType,
  * toSphericalGeography, toGeometry. */
case class GeoUnary(child: Expression, op: String)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = op match {
    case "astext" | "type" => StringType
    case "area" => DoubleType
    case _ => BinaryType
  }
  override def prettyName: String = s"st_$op"
  override protected def nullSafeEval(input: Any): Any = {
    val g = GeoJts.deserialize(input.asInstanceOf[Array[Byte]])
    op match {
      case "astext" => UTF8String.fromString(new WKTWriter().write(g))
      case "asbinary" => new WKBWriter().write(g)
      case "area" => g.getArea
      case "type" => UTF8String.fromString(g.getGeometryType)
      case "togeog" => g.setSRID(GeoJts.GeographySrid); GeoJts.serialize(g)
      case "togeom" => g.setSRID(0); GeoJts.serialize(g)
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Binary blob functions — the reference's INT-returning relates and
  * planar/spherical distance (ScalarFunctions.java:176-255). */
case class GeoBinaryOp(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (op == "distance") DoubleType else IntegerType
  override def prettyName: String = s"st_$op"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = GeoJts.deserialize(l.asInstanceOf[Array[Byte]])
    val b = GeoJts.deserialize(r.asInstanceOf[Array[Byte]])
    op match {
      case "distance" =>
        require(GeoJts.isGeography(a) == GeoJts.isGeography(b),
          "arguments must both be geometry or both geography")
        if (GeoJts.isGeography(a)) GeoJts.sphericalDistance(a, b)
        else if (a.isEmpty || b.isEmpty) Double.NaN
        else a.distance(b)
      case "contains" =>
        require(GeoJts.isGeography(a) == GeoJts.isGeography(b),
          "arguments must both be geometry or both geography")
        if (a.contains(b)) 1 else 0
      case "within" =>
        require(GeoJts.isGeography(a) == GeoJts.isGeography(b),
          "arguments must both be geometry or both geography")
        if (a.within(b)) 1 else 0
      case "equals" => if (a.equals(b)) 1 else 0
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ST_UNION aggregation over serialized geometries
  * (StUnionAggregationFunction.java). */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Geometry] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_union"

  override def createAggregationBuffer(): Geometry =
    new GeometryFactory().createGeometryCollection()

  override def update(buf: Geometry, row: InternalRow): Geometry = {
    val v = child.eval(row)
    if (v == null) buf
    else buf.union(GeoJts.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(buf: Geometry, other: Geometry): Geometry =
    buf.union(other)
  override def eval(buf: Geometry): Any = GeoJts.serialize(buf)
  override def serialize(buf: Geometry): Array[Byte] = GeoJts.serialize(buf)
  override def deserialize(b: Array[Byte]): Geometry = GeoJts.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): StUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}
