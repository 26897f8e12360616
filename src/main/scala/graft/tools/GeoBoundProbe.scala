package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the round-8 geo index shapes (lower-bound complement split +
  * BETWEEN) against the exact haversine scan at replica scale.
  * Usage: SPARK_GRAFT_GEO_DIR=/tmp/graft_sf10 (a ScaleProbe replica)
  *        sbt 'runMain graft.tools.GeoBoundProbe'
  */
object GeoBoundProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_GEO_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.PinotFunctions.registerAll(spark)

    // same synthetic layout as q_geo_radius_indexed, on the replica
    val out = s"$dir/geoprobe_t"
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      val k = col("c_custkey")
      val pts = spark.read.parquet(s"$dir/customer.parquet").select(k)
        .withColumn("lng", (k * 7919 % 36000) / 100.0 - 180.0)
        .withColumn("lat", (k * 104729 % 17000) / 100.0 - 85.0)
      graft.sources.GeoIndex(pts, "lng", "lat", Seq(2, 4, 6))
        .repartition(16)
        .sortWithinPartitions(
          col(graft.sources.GeoIndex.cellColumn("lng", "lat", 6)))
        .write.mode("overwrite").parquet(out)
    }
    val t = spark.read.parquet(out)
    t.createOrReplaceTempView("geoprobe_ix")
    t.createOrReplaceTempView("geoprobe_scan")
    graft.sources.GeoIndex.clear()
    graft.sources.GeoIndex.registerTable("geoprobe_ix", "lng", "lat",
      Seq(2, 4, 6))

    def time(sql: String): (Double, Long) = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.sql.QueryFacade.sql(spark,
          s"SET explicitLimit = true; $sql").head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (best.map(_._1).min, best.head._2)
    }
    val shapes = Seq(
      "lower >" -> "ST_Distance(ST_Point(lng, lat), ST_Point(11.0, 22.0)) > 2000000",
      "between" -> "ST_Distance(ST_Point(lng, lat), ST_Point(11.0, 22.0)) BETWEEN 500000 AND 2000000")
    println(f"${"shape"}%-9s ${"indexed"}%9s ${"scan"}%9s ${"ratio"}%7s  rows-match")
    shapes.foreach { case (name, pred) =>
      val (ti, ni) = time(s"SELECT COUNT(*) AS n FROM geoprobe_ix WHERE $pred")
      val (ts, ns) = time(s"SELECT COUNT(*) AS n FROM geoprobe_scan WHERE $pred")
      println(f"$name%-9s $ti%9.2f $ts%9.2f ${ts / ti}%7.2f  ${ni == ns} ($ni)")
    }
    spark.stop()
  }
}
