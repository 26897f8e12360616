package graft

import org.apache.spark.sql.functions._
import graft.sources.BatchIngest

/** Batch input formats beyond parquet (SURVEY §2.1): csv/json/orc round-
  * trip through BatchIngest.readAny and produce identical aggregates. */
class InputFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("csv/json/orc inputs agree with the parquet baseline") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_formats").toString
    // avoid timestamp serialization drift in csv: project a stable slice
    val slice = li.select($"l_orderkey", $"l_partkey", $"l_quantity",
      $"l_extendedprice", $"l_returnflag")
    slice.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
    slice.write.mode("overwrite").json(s"$root/json")
    slice.write.mode("overwrite").orc(s"$root/orc")

    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(20,4)")).cast("double").as("q"))
        .orderBy($"l_returnflag")
        .as[(String, Long, Double)].collect().toSeq

    val want = summarize(slice)
    val ddl = "l_orderkey LONG, l_partkey LONG, l_quantity DOUBLE, " +
      "l_extendedprice DOUBLE, l_returnflag STRING"
    assert(summarize(BatchIngest.readAny(spark, s"$root/csv", "csv",
      Some(ddl)).select(slice.columns.map(col): _*)) == want)
    assert(summarize(BatchIngest.readAny(spark, s"$root/json", "json",
      Some(ddl)).select(slice.columns.map(col): _*)) == want)
    assert(summarize(BatchIngest.readAny(spark, s"$root/orc", "orc")) == want)
  }
}
