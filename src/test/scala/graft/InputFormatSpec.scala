package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.BatchIngest

/** Batch input formats beyond parquet (reference batch-ingestion
  * input-format plugins `pinot-plugins/pinot-batch-ingestion` +
  * `pinot-input-format/{csv,json,orc,...}`): the same table written as
  * csv/json/orc must ingest through BatchIngest.readAny to rows
  * identical to the parquet source. Avro is excluded — the spark-avro
  * connector jar is not in this container (readAny documents the call
  * shape).
  */
class InputFormatSpec extends SparkSpec {

  override val sf = "/root/testdata/sf0.001"

  test("csv/json/orc round-trip equals the parquet source") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    // nation: small, has int keys + free-text comment (delimiter stress)
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy(col("n_nationkey"))
    val ddl = src.schema.toDDL

    src.coalesce(1).write.option("header", "true").mode("overwrite")
      .csv(s"$dir/csv")
    src.coalesce(1).write.mode("overwrite").json(s"$dir/json")
    src.coalesce(1).write.mode("overwrite").orc(s"$dir/orc")

    val expected = src.collect().toSeq
    for (fmt <- Seq("csv", "json", "orc")) {
      val back = BatchIngest.readAny(spark, s"$dir/$fmt", fmt, Some(ddl))
        .select(src.columns.map(col).toSeq: _*)
        .orderBy(col("n_nationkey"))
      assert(back.schema == src.schema, s"$fmt schema drift")
      assert(back.collect().toSeq == expected, s"$fmt rows drift")
    }
  }

  test("readAny csv without explicit schema still reads (header names, inferred-as-string)") {
    val dir = Files.createTempDirectory("graft_fmt2").toString
    val src = spark.read.parquet(s"$sf/region.parquet")
    src.coalesce(1).write.option("header", "true").mode("overwrite")
      .csv(s"$dir/csv")
    val back = BatchIngest.readAny(spark, s"$dir/csv", "csv")
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.count() == src.count())
  }

  test("ingest from a non-parquet source lands the same pruned layout") {
    val dir = Files.createTempDirectory("graft_fmt3").toString
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    src.write.mode("overwrite").orc(s"$dir/orc")
    val in = BatchIngest.readAny(spark, s"$dir/orc", "orc")
    BatchIngest.ingest(spark, in, s"$dir/out",
      transforms = Seq(BatchIngest.Derive("o_year", year(col("o_orderdate")))),
      partitionBy = Seq("o_year"), sortBy = Seq("o_orderkey"))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == src.count())
    // partition pruning works on the derived layout
    val pruned = out.filter(col("o_year") === 1995)
    assert(pruned.count() ==
      src.filter(year(col("o_orderdate")) === 1995).count())
  }
}
