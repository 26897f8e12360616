package graft

import org.apache.spark.sql.functions._

/** Metadata-only aggregation (NonScanBasedAggregationOperator analog):
  * unfiltered COUNT/MIN/MAX must answer from the footer-statistics
  * table with NO file scan; anything the footer cannot prove must fall
  * back to the scan with identical results. */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def writePlain(df: org.apache.spark.sql.DataFrame): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_footer").toString + "/t"
    df.write.mode("overwrite").parquet(d)
    d
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("unfiltered count/min/max answer from footers with no file scan") {
    val src = spark.range(100000).toDF("id")
      .withColumn("s", concat(lit("v"), format_string("%06d", $"id")))
      .withColumn("d", $"id" * 1.5)
      .withColumn("maybe", when($"id" % 7 === 0, lit(null))
        .otherwise($"id" + 1))
      .withColumn("allnull", lit(null).cast("long"))
      .repartition(4)
    val path = writePlain(src)
    val fact = spark.read.parquet(path)
    graft.plans.RollupRewrite.clear()
    assert(graft.sources.FooterStats.register(spark, fact).isDefined)

    val q = fact.agg(
      count(lit(1)).as("n"), count($"maybe").as("nm"),
      count($"allnull").as("na"),
      min($"id").as("mn_id"), max($"id").as("mx_id"),
      min($"s").as("mn_s"), max($"s").as("mx_s"),
      min($"d").as("mn_d"), max($"d").as("mx_d"),
      min($"allnull").as("mn_an"))
    val plan = planOf(q)
    assert(!plan.contains("FileScan"), s"footer agg still scans:\n$plan")
    val r = q.collect().head
    assert(r.getLong(0) == 100000L)
    assert(r.getLong(1) == 100000L - 14286L) // ids ≡ 0 (mod 7) in [0,1e5)
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == 0L && r.getLong(4) == 99999L)
    assert(r.getString(5) == "v000000" && r.getString(6) == "v099999")
    assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 99999 * 1.5)
    assert(r.isNullAt(9))
  }

  test("filters and group-bys refuse the metadata path and stay correct") {
    val src = spark.range(1000).toDF("id")
      .withColumn("g", $"id" % 3)
    val path = writePlain(src)
    val fact = spark.read.parquet(path)
    graft.plans.RollupRewrite.clear()
    graft.sources.FooterStats.register(spark, fact)

    val filtered = fact.filter($"id" >= 500).agg(count(lit(1)).as("n"))
    assert(planOf(filtered).contains("FileScan"))
    assert(filtered.head.getLong(0) == 500L)

    val grouped = fact.groupBy($"g").agg(max($"id").as("m"))
    assert(planOf(grouped).contains("FileScan"))
    assert(grouped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(0L -> 999L, 1L -> 997L, 2L -> 998L))
  }

  test("NaN-polluted double stats are refused; count(col) still serves") {
    val src = Seq(1.0, 2.0, Double.NaN, 3.0).toDF("d")
      .withColumn("k", lit(1L))
    val path = writePlain(src)
    val fact = spark.read.parquet(path)
    graft.plans.RollupRewrite.clear()
    graft.sources.FooterStats.register(spark, fact)

    // Spark orders NaN greater than any double — a footer answer that
    // dropped NaN would say 3.0; the refusal keeps the scan and the
    // correct NaN
    val mx = fact.agg(max($"d").as("m"))
    assert(planOf(mx).contains("FileScan"), "NaN stats must refuse")
    assert(mx.head.getDouble(0).isNaN)

    val cnt = fact.agg(count($"d").as("n"), min($"k").as("mk"))
    assert(!planOf(cnt).contains("FileScan"))
    assert(cnt.head.getLong(0) == 4L && cnt.head.getLong(1) == 1L)
  }

  test("sum refuses (footers have no sums); mixed agg falls back whole") {
    val src = spark.range(100).toDF("id")
    val path = writePlain(src)
    val fact = spark.read.parquet(path)
    graft.plans.RollupRewrite.clear()
    graft.sources.FooterStats.register(spark, fact)
    val q = fact.agg(count(lit(1)).as("n"), sum($"id").as("s"))
    assert(planOf(q).contains("FileScan"))
    val r = q.head
    assert(r.getLong(0) == 100L && r.getLong(1) == 4950L)
  }
}
