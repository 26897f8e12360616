package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc debugging main (contents change per investigation). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.PinotFunctions.registerAll(spark)
    val base = 1609459200000L
    (0 until 1000).map(i => base + i).toDF("ms")
      .select(timestamp_micros($"ms" * 1000).as("timestampColumn"))
      .createOrReplaceTempView("ts_testtable4")
    val sql = "SELECT TO_TIMESTAMP(FROM_TIMESTAMP(MAX(timestampColumn)))" +
      " AS maxTimestamp FROM ts_testtable4 GROUP BY timestampColumn" +
      " HAVING maxTimestamp < '2021-01-01 00:00:00.005'" +
      " ORDER BY maxTimestamp"
    val df = graft.sql.QueryFacade.sql(spark, sql)
    println("[scratch] rows=" + df.collect().mkString(" | "))
    val noHaving = graft.sql.QueryFacade.sql(spark,
      "SELECT TO_TIMESTAMP(FROM_TIMESTAMP(MAX(timestampColumn)))" +
        " AS maxTimestamp FROM ts_testtable4 GROUP BY timestampColumn" +
        " ORDER BY maxTimestamp")
    println("[scratch] noHaving=" + noHaving.collect().take(3).mkString(" | "))
    println("[scratch] plan=\n" +
      df.queryExecution.analyzed.toString.take(2000))
    spark.stop()
  }
}
