package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.schema.LogicalTable
import graft.schema.LogicalTable.{Config, Physical}

/** N-physical-table logical views (LogicalTableConfig semantics). */
class LogicalTableSpec extends SparkSpec {

  test("min strategy takes the earliest fully-ingested offline horizon") {
    import spark.implicits._
    val offA = Seq(("a", "2024-01-10 00:00:00"), ("a", "2024-01-05 00:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast(TimestampType))
    val offB = Seq(("b", "2024-01-07 00:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast(TimestampType))
    val bMin = LogicalTable.timeBoundary(Seq(offA, offB), "t", "1 day", "min").get
    val bMax = LogicalTable.timeBoundary(Seq(offA, offB), "t", "1 day", "max").get
    val row = spark.range(1).select(bMin.cast("string").as("mn"),
      bMax.cast("string").as("mx")).head
    assert(row.getString(0) == "2024-01-06 00:00:00")
    assert(row.getString(1) == "2024-01-09 00:00:00")
  }

  test("empty offline member: min strategy routes everything realtime") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String)]) = rows.toDF("id", "t")
      .withColumn("t", col("t").cast(TimestampType))
    val empty = mk(Nil)
    val off = mk(Seq((1, "2024-01-05 00:00:00")))
    val rt = mk(Seq((1, "2024-01-05 00:00:00"), (2, "2024-01-08 00:00:00")))
    // an empty offline member's horizon is −∞ under min: no crash,
    // offline answers nothing, realtime answers everything
    val v = LogicalTable.view(Config("lt",
      Seq(Physical("a_OFFLINE", off, "OFFLINE"),
        Physical("b_OFFLINE", empty, "OFFLINE"),
        Physical("r_REALTIME", rt, "REALTIME")), "t"))
    assert(v.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("overlapping members answer each row exactly once") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String)]) = rows.toDF("id", "t")
      .withColumn("t", col("t").cast(TimestampType))
    // offline covers through the 5th (boundary = 4th), realtime
    // overlaps from the 3rd onward
    val off = mk(Seq((1, "2024-01-01 00:00:00"), (2, "2024-01-03 00:00:00"),
      (3, "2024-01-05 00:00:00")))
    val rt = mk(Seq((2, "2024-01-03 00:00:00"), (3, "2024-01-05 00:00:00"),
      (4, "2024-01-08 00:00:00")))
    val v = LogicalTable.view(Config("lt",
      Seq(Physical("o_OFFLINE", off, "OFFLINE"),
        Physical("r_REALTIME", rt, "REALTIME")), "t"))
    val got = v.select("id").collect().map(_.getLong(0)).sorted.toSeq
    // boundary = 2024-01-04: offline answers ids 1,2; realtime 3,4
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("fromJson resolves physical members and strategy") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:00:00")).toDF("id", "t")
      .withColumn("t", col("t").cast(TimestampType))
    val json = """{
      "tableName": "sales_logical",
      "physicalTableConfigMap": {
        "sales_2023_OFFLINE": {},
        "sales_2024_OFFLINE": {},
        "sales_live_REALTIME": {}
      },
      "timeBoundaryConfig": {"boundaryStrategy": "max"}
    }"""
    val cfg = LogicalTable.fromJson(json, "t", _ => df)
    assert(cfg.tableName == "sales_logical")
    assert(cfg.boundaryStrategy == "max")
    assert(cfg.physical.map(p => (p.name, p.tableType)) == Seq(
      ("sales_2023_OFFLINE", "OFFLINE"),
      ("sales_2024_OFFLINE", "OFFLINE"),
      ("sales_live_REALTIME", "REALTIME")))
  }
}
