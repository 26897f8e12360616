package graft

import org.apache.spark.sql.functions._
import graft.sources.TimestampIndex
import graft.sql.QueryFacade

class TimestampIndexSpec extends SparkSpec {

  test("derived columns equal the SQL dateTrunc values exactly") {
    QueryFacade.init(spark, sf)
    val events = spark.table("events").select(col("ts"))
    val indexed = TimestampIndex(events, "ts", Seq("DAY", "HOUR", "WEEK"))
    assert(indexed.columns.toSet ==
      Set("ts", "$ts$DAY", "$ts$HOUR", "$ts$WEEK"))
    val mismatches = indexed
      .withColumn("viaFn", expr("datetrunc('day', ts)"))
      .filter(col("`$ts$DAY`") =!= col("viaFn")).count()
    assert(mismatches == 0L)
    // a WEEK value is always a Monday boundary at or before the DAY
    val weekBad = indexed.filter(col("`$ts$WEEK`") > col("`$ts$DAY`")).count()
    assert(weekBad == 0L)
  }

  test("facade overrides dateTrunc to the materialized column; pushes down") {
    QueryFacade.init(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("tsidx").toString
    try {
      val indexed = TimestampIndex(
        spark.table("events").select(col("event_id"), col("ts")),
        "ts", Seq("DAY"))
      indexed.write.mode("overwrite").parquet(s"$dir/t")
      spark.read.parquet(s"$dir/t").createOrReplaceTempView("events_tsidx")
      TimestampIndex.registerTable("events_tsidx", "ts", Seq("DAY"))
      // pick a day that exists
      val day = QueryFacade.sql(spark,
        "SET explicitLimit = true; " +
          "SELECT min(`$ts$DAY`) AS d FROM events_tsidx")
        .collect().head.getLong(0)
      val q = QueryFacade.sql(spark,
        s"""SET explicitLimit = true;
            SELECT count(*) AS n FROM events_tsidx
            WHERE datetrunc('day', ts) = $day""")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("ts$DAY")),
        s"timestamp-index predicate not pushed:\n$plan")
      // value-identical to evaluating the function per row
      val direct = QueryFacade.sql(spark,
        s"""SET explicitLimit = true;
            SELECT count(*) AS n FROM events_tsidx
            WHERE `$$ts$$DAY` = $day""")
      assert(q.collect().head.getLong(0) ==
        direct.collect().head.getLong(0))
      assert(q.collect().head.getLong(0) > 0)
      // an UNREGISTERED granularity keeps the function form
      val hour = QueryFacade.sql(spark,
        s"""SET explicitLimit = true;
            SELECT count(*) AS n FROM events_tsidx
            WHERE datetrunc('hour', ts) >= 0""")
      assert(hour.collect().head.getLong(0) > 0) // still executes
    } finally TimestampIndex.clear()
  }

  test("table config timestampConfig drives the index end-to-end") {
    import graft.schema.TableConfig
    QueryFacade.init(spark, sf)
    val json = """{
      "tableName": "events_cfg_ts",
      "tableType": "OFFLINE",
      "fieldConfigList": [
        { "name": "ts", "indexTypes": ["TIMESTAMP"],
          "timestampConfig": { "granularities": ["DAY", "MONTH"] } }
      ]
    }"""
    val cfg = TableConfig.fromJson(json)
    assert(cfg.fieldIndexes.head.timestampGranularities ==
      Seq("DAY", "MONTH"))
    try {
      val out = TableConfig.applyIndexes(spark, cfg,
        spark.table("events").select(col("event_id"), col("ts")), "/tmp")
      assert(out.columns.contains("$ts$DAY") &&
        out.columns.contains("$ts$MONTH"))
      assert(TimestampIndex.hasGranularity("events_cfg_ts", "ts", "DAY"))
    } finally TimestampIndex.clear()
  }
}
