package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× A/B for the round-9 JSON_MATCH flattened-scalar fallback: the
  * unshredded path switched from a raw `get_json_object` + cast to a
  * per-row parse into flattened scalars (exists() over
  * `jsonmatchscalars`). Both are linear per-row maps with no shuffle,
  * but the new path pays a generic JSON parse per document — this
  * probe measures that tax at 100× the sf0.1 events table so the
  * scale claim is measured, not assumed. */
object JsonScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.PinotFunctions.registerAll(spark)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val events = graft.Tables(spark, sfDir).events
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val big = spark.range(factor).crossJoin(events)
      .select(col("event_type"), col("props"))
      .repartition(cpus.toInt * 2).localCheckpoint()
    println(s"[probe] rows = ${big.count()}")
    big.createOrReplaceTempView("json_probe_t")

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-28s $s%8.2f s  rows=$n")
        s
      }
    }
    // old-style raw extraction + cast (the pre-r9 fallback shape)
    time("get_json_object+cast") {
      big.filter(get_json_object(col("props"), "$.k").cast("int") >= 50)
        .groupBy(col("event_type")).count().collect().map(_.getLong(1)).sum
    }
    // r9 flattened-scalar fallback through the facade's SQL rewrite
    time("jsonmatchscalars exists()") {
      graft.sql.QueryFacade.sql(spark,
        "SELECT event_type, COUNT(*) AS n FROM json_probe_t" +
          " WHERE JSON_MATCH(props, '\"$.k\" >= 50') GROUP BY event_type")
        .collect().map(_.getLong(1)).sum
    }
    spark.stop()
  }
}
