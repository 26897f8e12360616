package graft

import org.apache.spark.sql.functions._
import org.locationtech.jts.io.WKTReader
import graft.plans.GeoJts

/** Wire-format and semantics checks for the JTS-backed geometry blob
  * engine: the serialized layout must match the reference's
  * GeometrySerializer byte-for-byte conventions (type byte + 0x80
  * geography bit, big-endian coords, canonicalized polygon rings), and
  * relates/distance must follow the reference's ScalarFunctions. */
class GeoJtsSpec extends SparkSpec {
  import spark.implicits._

  private val wkts = Seq(
    "POINT (1 2)",
    "MULTIPOINT ((1 2), (3 4))",
    "LINESTRING (0 0, 1 1, 2 0)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))")

  test("serde round-trips every geometry type (topology-equal)") {
    val reader = new WKTReader()
    wkts.foreach { w =>
      val g = reader.read(w)
      val rt = GeoJts.deserialize(GeoJts.serialize(g))
      assert(rt.equalsTopo(g), s"round-trip mismatch for $w")
      assert(rt.getGeometryType == g.getGeometryType)
    }
  }

  test("point blob layout matches the reference byte conventions") {
    val bytes = GeoJts.parseWkt("POINT (3 7)", geography = false)
    assert(bytes.length == 17 && bytes(0) == 0) // type POINT, no geog bit
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, 16) // big-endian doubles
    assert(bb.getDouble == 3.0 && bb.getDouble == 7.0)
    val geog = GeoJts.parseWkt("POINT (3 7)", geography = true)
    assert((geog(0) & 0x80) != 0 && (geog(0) & 0x7f) == 0)
    // geography flag survives the round trip
    assert(GeoJts.isGeography(GeoJts.deserialize(geog)))
    assert(!GeoJts.isGeography(GeoJts.deserialize(bytes)))
  }

  test("polygon rings canonicalize: shell clockwise, holes ccw in blob") {
    // input shell is counter-clockwise; serializer must flip it
    val bytes = GeoJts.parseWkt(
      "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      geography = false)
    val g = GeoJts.deserialize(bytes)
    val p = g.asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(p.getNumInteriorRing == 1)
    assert(p.getArea == 35.0) // 36 − 1
  }

  test("relates and area over blobs follow reference semantics (int 0/1)") {
    val df = Seq(1).toDF("x")
      .withColumn("poly", GeoJts.geomFromText(
        lit("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
      .withColumn("inP", GeoJts.point(lit(5.0), lit(5.0)))
      .withColumn("outP", GeoJts.point(lit(15.0), lit(5.0)))
      .select(
        GeoJts.contains(col("poly"), col("inP")).as("c1"),
        GeoJts.contains(col("poly"), col("outP")).as("c0"),
        GeoJts.within(col("inP"), col("poly")).as("w1"),
        GeoJts.area(col("poly")).as("a"),
        GeoJts.geometryType(col("poly")).as("t"))
      .head()
    assert(df.getInt(0) == 1 && df.getInt(1) == 0 && df.getInt(2) == 1)
    assert(df.getDouble(3) == 100.0 && df.getString(4) == "Polygon")
  }

  test("distance: planar for geometry, reference great-circle for geography") {
    val planar = Seq(1).toDF("x").select(GeoJts.distance(
      GeoJts.point(lit(0.0), lit(0.0)),
      GeoJts.point(lit(3.0), lit(4.0)))).head().getDouble(0)
    assert(planar == 5.0)
    val geog = Seq(1).toDF("x").select(GeoJts.distance(
      GeoJts.point(lit(0.0), lit(0.0), geography = true),
      GeoJts.point(lit(1.0), lit(0.0), geography = true)))
      .head().getDouble(0)
    // 1 degree of longitude at the equator with R = 6371.01 km
    val expect = math.toRadians(1.0) * 6371010.0
    assert(math.abs(geog - expect) < 1.0)
    // mixing geometry and geography throws (reference behavior)
    intercept[Exception] {
      Seq(1).toDF("x").select(GeoJts.distance(
        GeoJts.point(lit(0.0), lit(0.0)),
        GeoJts.point(lit(1.0), lit(0.0), geography = true))).head()
    }
  }

  test("WKB export re-imports through standard readers") {
    val rows = Seq(1).toDF("x")
      .withColumn("g", GeoJts.geomFromText(
        lit("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")))
      .withColumn("wkb", GeoJts.asBinary(col("g")))
      .select(GeoJts.stEquals(GeoJts.geomFromWkb(col("wkb")), col("g")),
        GeoJts.asText(col("g")))
      .head()
    assert(rows.getInt(0) == 1)
    assert(rows.getString(1).startsWith("MULTIPOLYGON"))
  }

  test("ST_UNION aggregate unions blobs across rows and partitions") {
    val blob = Seq("POINT (0 0)", "POINT (1 1)", "POINT (2 2)", "POINT (1 1)")
      .toDF("w").repartition(3)
      .select(GeoJts.geomFromText(col("w")).as("g"))
      .agg(GeoJts.unionAgg(col("g"))).head().getAs[Array[Byte]](0)
    val g = GeoJts.deserialize(blob)
    assert(g.getNumPoints == 3) // union dedups the repeated point
  }

  test("toSphericalGeography / toGeometry flip the geography bit") {
    val r = Seq(1).toDF("x")
      .withColumn("g", GeoJts.geomFromText(lit("POINT (1 2)")))
      .withColumn("geog", GeoJts.toSphericalGeography(col("g")))
      .select(col("geog"), GeoJts.toGeometry(col("geog")).as("back"))
      .head()
    assert((r.getAs[Array[Byte]]("geog")(0) & 0x80) != 0)
    assert((r.getAs[Array[Byte]]("back")(0) & 0x80) == 0)
  }
}
