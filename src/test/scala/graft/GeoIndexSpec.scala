package graft

import org.apache.spark.sql.functions._

import graft.sources.GeoIndex

/** H3-index analog: the geo facade rewrite is EXACT — identical
  * answers to the per-row haversine/ray-cast scan in every boolean
  * context including NOT and NULL coordinates — and falls back to the
  * scan whenever ownership, registration, or the range caps can't be
  * satisfied. */
class GeoIndexSpec extends SparkSpec {

  // deterministic point cloud (same construction as q_geo_*) with a
  // NULL-coordinate row
  private lazy val pts = {
    val k = col("id")
    spark.range(1, 4001).toDF("id")
      .withColumn("lng",
        when(k === 7, lit(null)).otherwise((k * 7919 % 36000) / 100.0 - 180.0))
      .withColumn("lat",
        when(k === 11, lit(null)).otherwise((k * 104729 % 17000) / 100.0 - 85.0))
  }

  private def indexed(): Unit = {
    val layout = GeoIndex(pts, "lng", "lat", Seq(4, 6))
      .repartition(2).sortWithinPartitions(col(GeoIndex.cellColumn("lng", "lat", 6)))
    val dir = java.nio.file.Files.createTempDirectory("graft_geoidx").toString
    layout.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("geopts")
    GeoIndex.registerTable("geopts", "lng", "lat", Seq(4, 6))
  }

  private def rewrite(stmt: String): String =
    graft.sql.QueryFacade.rewriteGeoIndexed(spark, stmt)

  private def bothWays(stmt: String): Seq[Seq[Any]] = {
    val served = graft.sql.QueryFacade.sql(spark,
      s"SET explicitLimit = true; $stmt")
    val scan = spark.sql(stmt)
    val a = served.collect().map(_.toSeq).toSeq
    assert(a == scan.collect().map(_.toSeq).toSeq, stmt)
    a
  }

  test("ST_Distance < r serves from cell ranges and matches the scan") {
    indexed()
    try {
      val stmt = "SELECT id FROM geopts WHERE " +
        "ST_Distance(ST_Point(lng, lat), ST_Point(11.0, 22.0)) < 900000 " +
        "ORDER BY id"
      val r = rewrite(stmt)
      assert(r.contains("BETWEEN") && r.contains("$h3$lng$lat$"),
        s"expected cell ranges: $r")
      // interior cells short-circuit: the full-range disjunct is present
      assert(r.contains(" OR ST_Distance"), s"expected full-match OR: $r")
      val rows = bothWays(stmt)
      assert(rows.nonEmpty)
      // the range predicate reaches the parquet scan
      val served = graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; $stmt")
      assert(served.queryExecution.executedPlan.toString
        .linesIterator.exists(l => l.contains("PushedFilters") &&
          l.contains("h3$lng$lat")),
        "cell ranges did not push into the scan")
      // literal-first argument order serves too
      val swapped = rewrite("SELECT id FROM geopts WHERE " +
        "ST_Distance(ST_Point(11.0, 22.0), ST_Point(lng, lat)) < 900000")
      assert(swapped.contains("BETWEEN"), s"swapped args not served: $swapped")
    } finally GeoIndex.clear()
  }

  test("NULL coordinates and NOT contexts keep scan semantics") {
    indexed()
    try {
      // NOT over the served leaf: NULL-coordinate rows must not
      // resurface (cell id is NULL exactly when the exact pred is)
      bothWays("SELECT id FROM geopts WHERE NOT (" +
        "ST_Distance(ST_Point(lng, lat), ST_Point(11.0, 22.0)) < 2000000) " +
        "ORDER BY id")
      // <= comparison form
      bothWays("SELECT count(*) AS n FROM geopts WHERE " +
        "ST_Distance(ST_Point(lng, lat), ST_Point(-170.0, 40.0)) <= 1500000")
      // antimeridian-crossing circle: wrapped candidates still exact
      bothWays("SELECT id FROM geopts WHERE " +
        "ST_Distance(ST_Point(lng, lat), ST_Point(179.5, 10.0)) < 1200000 " +
        "ORDER BY id")
    } finally GeoIndex.clear()
  }

  test("polygon inclusion serves from the bbox candidates, exact verify") {
    indexed()
    try {
      val stmt = "SELECT id FROM geopts WHERE ST_Contains(" +
        "ST_GeogFromText('POLYGON ((10 20, 30 20, 30 40, 10 40, 10 20))'), " +
        "ST_Point(lng, lat)) ORDER BY id"
      val r = rewrite(stmt)
      assert(r.contains("BETWEEN") && r.contains("ST_Contains"),
        s"expected bbox ranges + exact verify: $r")
      assert(bothWays(stmt).nonEmpty)
      // ST_Within spelling
      bothWays("SELECT count(*) AS n FROM geopts WHERE ST_Within(" +
        "ST_Point(lng, lat), " +
        "ST_GeogFromText('POLYGON ((10 20, 30 20, 30 40, 10 40, 10 20))'))")
    } finally GeoIndex.clear()
  }

  test("fallback: unregistered pair, pole circles, two-column points") {
    indexed()
    try {
      // unregistered coordinate pair keeps the scan
      val other = rewrite("SELECT 1 FROM geopts WHERE " +
        "ST_Distance(ST_Point(lat, lng), ST_Point(1.0, 2.0)) < 1000")
      assert(!other.contains("$h3$"), s"wrong-pair must not serve: $other")
      // pole-touching circle falls back (lng band unbounded)
      val pole = rewrite("SELECT 1 FROM geopts WHERE " +
        "ST_Distance(ST_Point(lng, lat), ST_Point(0.0, 89.0)) < 500000")
      assert(!pole.contains("$h3$"), s"pole circle must not serve: $pole")
      // both points columns (a join-shape distance) falls back
      val cols = rewrite("SELECT 1 FROM geopts WHERE " +
        "ST_Distance(ST_Point(lng, lat), ST_Point(lng, lat)) < 1000")
      assert(!cols.contains("$h3$"))
    } finally GeoIndex.clear()
  }

  test("driver-side grid math agrees with the engine's geoToH3 cells") {
    // every point's stored cell must land inside the candidate ranges
    // of a circle that contains the point (superset property, probed
    // over a mesh of centers/radii)
    val sample = pts.filter(col("lng").isNotNull && col("lat").isNotNull)
      .withColumn("cell",
        graft.functions.GeoFunctions.geoToH3(col("lng"), col("lat"), lit(6)))
      .select("lng", "lat", "cell").limit(300).collect()
    for (row <- sample; rM <- Seq(1000.0, 250000.0)) {
      val (lng, lat, cell) =
        (row.getDouble(0), row.getDouble(1), row.getLong(2))
      GeoIndex.circleRanges(lng, lat, rM, 6).foreach { rs =>
        assert(rs.candidates.exists(cr => cell >= cr.lo && cell <= cr.hi),
          s"own cell outside candidates: ($lng,$lat) r=$rM")
      }
    }
  }
}
