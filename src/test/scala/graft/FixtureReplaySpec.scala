package graft

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.{PinotSchema, TableConfig}

/** The reference's own integration-test acceptance scenarios, replayed
  * over its committed fixture archives with the Java tests' inline
  * expected values: gameScores full/partial upsert delete+revive, the
  * dedup ingestion data, the null-handling avro, and the CLP log data.
  *
  * Upsert scenario source: its
  * committed fixture data: `gameScores_csv.tar.gz` +
  * `upsert_table_test.schema` through the FULL-upsert delete/revive
  * flow of `UpsertTableIntegrationTest.java` (count contract :157-169;
  * delete + revive records and expected rows :239-290). */
class FixtureReplaySpec extends SparkSpec {
  import spark.implicits._

  // cancel (not fail) when the reference checkout is absent — same
  // graceful degradation as the TPC-H query loader
  private def requireReference(): Unit = assume(
    new java.io.File(
      "/root/reference/pinot-integration-tests/src/test/resources").isDirectory,
    "reference checkout not present")

  private val csvSchema =
    "playerId INT, name STRING, game STRING, score FLOAT, " +
      "timestampInEpoch LONG, deleted BOOLEAN"

  private lazy val baseRows = {
    val tmp = java.nio.file.Files.createTempDirectory("gamescores").toString
    val p = new java.io.File(tmp)
    val proc = new ProcessBuilder("tar", "xzf",
      "/root/reference/pinot-integration-tests/src/test/resources/gameScores_csv.tar.gz",
      "-C", tmp).start()
    require(proc.waitFor() == 0, "untar failed")
    spark.read.schema(csvSchema).csv(s"$tmp/gameScores.csv")
  }

  private val cfg = TableConfig.Config(
    tableName = "gameScoresWithDelete",
    tableType = "REALTIME",
    primaryKeys = Seq("playerId"),
    upsertMode = TableConfig.UpsertFull,
    comparisonColumn = Some("timestampInEpoch"),
    deleteRecordColumn = Some("deleted"))

  private def rows(csv: String*) =
    spark.read.schema(csvSchema).csv(csv.toDS)

  test("base data: 3 live pks of 10 raw rows (getCountStarResult)") {
    requireReference()
    assert(baseRows.count() == 10) // skipUpsert=true contract
    val view = TableConfig.view(cfg, baseRows)
    assert(view.count() == 3)
    assert(view.select($"playerId").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(100, 101, 102))
    // latest-by-comparison values: pk 100 -> score 12000.55 @1681256390000?
    // no: 1681256400000 (Zook, 2050) is NEWER than 1681256390000
    val s100 = view.filter($"playerId" === 100).select($"score", $"name")
      .collect().head
    assert(s100.getFloat(0) == 2050f && s100.getString(1) == "Zook")
  }

  test("delete then revive (testDeleteWithFullUpsert TEST 1 + TEST 2)") {
    requireReference()
    // TEST 1: two deleted=true records tombstone pks 100 and 102
    val deletes = rows(
      "102,Clifford,counter-strike,102,1681254200000,true",
      "100,Zook,counter-strike,2050,1681377200000,true")
    val afterDelete = TableConfig.view(cfg, baseRows.unionAll(deletes))
    val live = afterDelete.select($"playerId").collect().map(_.getInt(0))
    assert(live.toSeq == Seq(101), s"expected only pk 101, got ${live.toSeq}")
    // skipUpsert view still holds the tombstones
    val tombstoned = baseRows.unionAll(deletes)
      .filter($"deleted" === true).select($"playerId")
      .collect().map(_.getInt(0)).sorted
    assert(tombstoned.toSeq == Seq(100, 102))

    // TEST 2: a newer non-deleted record revives pk 100; all columns
    // take the new values, absent game becomes the "null" default
    val revive = rows("100,Zook-New,,0.0,1684707335000,false")
    val schema = PinotSchema.Schema("playerScores", Seq(
      PinotSchema.Field("playerId", IntegerType, PinotSchema.Dimension),
      PinotSchema.Field("name", StringType, PinotSchema.Dimension),
      PinotSchema.Field("game", StringType, PinotSchema.Dimension),
      PinotSchema.Field("score", FloatType, PinotSchema.Metric),
      PinotSchema.Field("timestampInEpoch", LongType, PinotSchema.DateTime),
      PinotSchema.Field("deleted", BooleanType, PinotSchema.Dimension)))
    val afterRevive = TableConfig.view(cfg,
      schema.withDefaultNulls(
        baseRows.unionAll(deletes).unionAll(revive)))
    assert(afterRevive.select($"playerId").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(100, 101))
    val pk100 = afterRevive.filter($"playerId" === 100)
      .select($"playerId", $"name", $"game").collect().head
    assert(pk100.getInt(0) == 100)
    assert(pk100.getString(1) == "Zook-New")
    assert(pk100.getString(2) == "null") // Pinot STRING default for null
  }

  test("partial upsert: a delete resets merge state (testDeleteWithPartialUpsert)") {
    requireReference()
    // fixture: gameScores_partial_upsert_csv.tar.gz; strategies
    // game=UNION score=INCREMENT (UpsertTableIntegrationTest.java:392-393)
    val tmp = java.nio.file.Files.createTempDirectory("gamescores_p").toString
    val proc = new ProcessBuilder("tar", "xzf",
      "/root/reference/pinot-integration-tests/src/test/resources/gameScores_partial_upsert_csv.tar.gz",
      "-C", tmp).start()
    require(proc.waitFor() == 0, "untar failed")
    val basePartial = spark.read.schema(csvSchema)
      .csv(s"$tmp/gameScores_partial_upsert.csv")
    val pCfg = cfg.copy(
      tableName = "gameScoresPartialUpsertWithDelete",
      upsertMode = TableConfig.UpsertPartial,
      partialStrategies = Map("game" -> "UNION", "score" -> "INCREMENT"))

    // TEST 1 (:401-403): tombstones delete pks 100 and 102
    val deletes = rows(
      "102,Clifford,counter-strike,102,1681054200000,true",
      "100,Zook,counter-strike,2050,1681377200000,true")
    val afterDelete = TableConfig.view(pCfg, basePartial.unionAll(deletes))
    assert(afterDelete.select($"playerId").collect().map(_.getInt(0)).toSeq
      == Seq(101))

    // TEST 2 (:436-449): the revival record starts a FRESH merge —
    // game is ONLY the revival's (defaulted) value, score restarts at
    // 0.0 instead of incrementing the pre-delete history
    val schema = PinotSchema.Schema("playerScores", Seq(
      PinotSchema.Field("playerId", IntegerType, PinotSchema.Dimension),
      PinotSchema.Field("name", StringType, PinotSchema.Dimension),
      PinotSchema.Field("game", StringType, PinotSchema.Dimension),
      PinotSchema.Field("score", FloatType, PinotSchema.Metric),
      PinotSchema.Field("timestampInEpoch", LongType, PinotSchema.DateTime),
      PinotSchema.Field("deleted", BooleanType, PinotSchema.Dimension)))
    val revive = rows("100,Zook,,0.0,1684707335000,false")
    val afterRevive = TableConfig.view(pCfg, schema.withDefaultNulls(
      basePartial.unionAll(deletes).unionAll(revive)))
    assert(afterRevive.select($"playerId").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(100, 101))
    val pk100 = afterRevive.filter($"playerId" === 100)
      .select($"name", $"game", $"score").collect().head
    assert(pk100.getString(0) == "Zook")
    // reference expects game = ["null"] (the revival's defaulted value
    // alone, rendered as a single-element MV)
    assert(pk100.getSeq[String](1) == Seq("null"))
    assert(pk100.getDouble(2) == 0.0) // INCREMENT sums to DOUBLE
  }

  test("reference dedup fixture: the FIRST value persists per pk") {
    requireReference()
    // dedupIngestionTestData.tar.gz through the dedup-table view:
    // 10 records over pks 0..4 — BaseDedupIntegrationTest.java:215-232
    // expects 5 rows and the OLDER name ("" + pk) to persist
    val tmp = java.nio.file.Files.createTempDirectory("dedupfix").toString
    val proc = new ProcessBuilder("tar", "xzf",
      "/root/reference/pinot-integration-tests/src/test/resources/dedupIngestionTestData.tar.gz",
      "-C", tmp).start()
    require(proc.waitFor() == 0, "untar failed")
    val (schema, rows) = graft.compat.OnTimeCompat.readAvro(
      s"$tmp/dedupIngestionTestData.avro")
    val indexed = spark.createDataFrame(
      new java.util.ArrayList(rows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i.toLong)
      }.asJava),
      schema.add("arrival_idx", LongType))
    val deduped = graft.operators.Upsert.firstByKey(
      indexed, Seq("id"), "arrival_idx")
    assert(deduped.count() == 5)
    deduped.select($"id", $"name").collect().foreach { r =>
      assert(r.getString(1) == r.getInt(0).toString,
        s"pk ${r.getInt(0)}: first value did not persist: ${r.getString(1)}")
    }
    // testSegmentReload: pushing the data AGAIN changes nothing
    val repushed = graft.operators.Upsert.firstByKey(
      indexed.unionAll(indexed), Seq("id"), "arrival_idx")
    assert(repushed.count() == 5)
  }

  test("reference null-handling fixture: inline count golds + distinct-from") {
    requireReference()
    // avro_data_with_nulls through NullHandlingIntegrationTest.java's
    // inline expectations (:140-142 count=100, :173-180 OR-null=57,
    // :188-196 neq-or-null=99) and the IS [NOT] DISTINCT FROM
    // identities (:214-232)
    val tmp = java.nio.file.Files.createTempDirectory("nullfix").toString
    val proc = new ProcessBuilder("tar", "xzf",
      "/root/reference/pinot-integration-tests/src/test/resources/avro_data_with_nulls.tar.gz",
      "-C", tmp).start()
    require(proc.waitFor() == 0, "untar failed")
    val (schema, rows) = graft.compat.OnTimeCompat.readAvro(
      s"$tmp/avro_data_with_nulls.avro")
    val df = spark.createDataFrame(
      new java.util.ArrayList(rows.asJava), schema)
    assert(df.count() == 100) // getCountStarResult
    assert(df.filter($"salary" === 4398214 || $"salary".isNull).count()
      == 57)
    assert(df.filter($"salary" =!= 46314 || $"salary".isNull).count()
      == 99)
    // three-valued logic: a null salary matches NEITHER branch of a
    // plain != — so without the IS NULL arm the count drops by the
    // null count
    val nullSalaries = df.filter($"salary".isNull).count()
    assert(nullSalaries > 0)
    assert(df.filter($"salary" =!= 46314).count() == 99 - nullSalaries)
    // IS DISTINCT FROM self is never true (nulls included);
    // IS NOT DISTINCT FROM self always is
    df.createOrReplaceTempView("nulls_fixture")
    assert(spark.sql(
      "SELECT * FROM nulls_fixture WHERE salary IS DISTINCT FROM salary")
      .count() == 0)
    assert(spark.sql(
      "SELECT * FROM nulls_fixture " +
        "WHERE description IS NOT DISTINCT FROM description")
      .count() == 100)
  }

  test("reference CLP fixture: 100 real log lines round-trip; regex gold") {
    requireReference()
    // clpEncodingITData through CLPEncodingRealtimeTest.java's inline
    // expectations (:70-72 count=100; :125-131 REGEXP_LIKE
    // '.*executor.*' = 53) — the logLine column is CLP-encoded at
    // ingest and queried transparently
    val tmp = java.nio.file.Files.createTempDirectory("clpfix").toString
    val proc = new ProcessBuilder("tar", "xzf",
      "/root/reference/pinot-integration-tests/src/test/resources/clpEncodingITData.tar.gz",
      "-C", tmp).start()
    require(proc.waitFor() == 0, "untar failed")
    val (schema, rows) = graft.compat.OnTimeCompat.readAvro(
      s"$tmp/data.avro")
    val df = spark.createDataFrame(new java.util.ArrayList(rows.asJava),
      schema)
    assert(df.count() == 100)
    assert(df.filter($"logLine".rlike(".*executor.*")).count() == 53)
    // CLP encode → decode round-trips every REAL log line byte-exact,
    // and the regex gold holds over the DECODED column
    import graft.functions.ClpFunctions
    val enc = df.withColumn("e", ClpFunctions.clpEncode($"logLine"))
    val roundTrip = enc.withColumn("back",
      ClpFunctions.clpDecode($"e.logtype", $"e.dict_vars",
        $"e.encoded_vars"))
    assert(roundTrip.filter($"back" =!= $"logLine").count() == 0)
    assert(roundTrip.filter($"back".rlike(".*executor.*")).count() == 53)
  }

  test("reference eats fixture: aggregation and time-series golds") {
    requireReference()
    // sampleEatsData30k.avro through QueryExecutorTest.java's inline
    // golds (:189-224 aggregations over TWO identical segments;
    // :228-299 time-series with TimeBuckets' half-open-left buckets,
    // TimeBuckets.java:64-73)
    val avro = "/root/reference/pinot-core/src/test/resources/data/" +
      "sampleEatsData30k.avro"
    assume(new java.io.File(avro).isFile)
    val (schema, rows) = graft.compat.OnTimeCompat.readAvro(avro)
    val one = spark.createDataFrame(new java.util.ArrayList(rows.asJava),
      schema)
    val two = one.unionAll(one) // the harness builds 2 segments of it
    assert(two.count() == 60000L)
    assert(two.agg(sum($"orderItemCount")).head.getLong(0) == 120306L)
    assert(two.agg(max($"orderAmount")).head.getInt(0) == 999)
    assert(two.agg(min($"orderAmount")).head.getInt(0) == 0)
    // SUM series, 2 buckets of 2h from 1726228400: first bucket empty
    // (null), second sums to 29885544
    val start = 1726228400L
    val bucket1 = two.filter($"orderCreatedTimestamp" > start &&
        $"orderCreatedTimestamp" <= start + 7200)
      .agg(sum($"orderAmount")).head.getLong(0)
    assert(bucket1 == 29885544L)
    assert(two.filter($"orderCreatedTimestamp" > start - 7200 &&
      $"orderCreatedTimestamp" <= start).count() == 0L)
    // per-city MAX/MIN over the 100x1-minute window: 5 cities;
    // New York max item count 4, Chicago min 0
    val windowed = two.filter($"orderCreatedTimestamp" > start - 60 &&
      $"orderCreatedTimestamp" <= start - 60 + 100L * 60)
    assert(windowed.select($"cityName").distinct().count() == 5L)
    assert(windowed.filter($"cityName" === "New York")
      .agg(max($"orderItemCount")).head.getInt(0) == 4)
    assert(windowed.filter($"cityName" === "Chicago")
      .agg(min($"orderItemCount")).head.getInt(0) == 0)
  }

  test("reference SV corpus: InterSegmentAggregationSingleValueQueriesTest golds") {
    // `pinot-core/src/test/resources/data/test_data-sv.avro` (30k rows)
    // queried through the BaseQueriesTest inter-segment convention —
    // the one built segment served as 4 copies (2 identical segments
    // × 2 instances), hence totalDocs 120000 in every gold
    // (`BaseSingleValueQueriesTest.java:99-104` FILTER;
    // `InterSegmentAggregationSingleValueQueriesTest.java:46-260`
    // inline expected result tables).
    val avroPath =
      "/root/reference/pinot-core/src/test/resources/data/test_data-sv.avro"
    assume(new java.io.File(avroPath).isFile, "reference checkout absent")
    val (schema, rows) = graft.compat.OnTimeCompat.readAvro(avroPath)
    val seg = spark.createDataFrame(rows.asJava, schema)
    val table = seg.union(seg).union(seg).union(seg)
    table.createOrReplaceTempView("sv_testtable")
    val FILTER = "column1 > 100000000" +
      " AND column3 BETWEEN 20000000 AND 1000000000" +
      " AND column5 = 'gFuH'" +
      " AND (column6 < 500000000 OR column11 NOT IN ('t', 'P'))" +
      " AND daysSinceEpoch = 126164076"
    // GROUP_BY convention (:38): keep the top group by (v1, v2) desc
    val GROUP_BY = " GROUP BY column9 ORDER BY v1 DESC, v2 DESC LIMIT 1"
    def got(sel: String, tail: String = ""): Seq[Any] =
      spark.sql(s"SELECT $sel FROM sv_testtable$tail")
        .collect().head.toSeq
    def approx(a: Any, b: Double, tol: Double = 1e-9): Boolean =
      math.abs(a.toString.toDouble - b) <= tol * math.max(1.0, math.abs(b))

    // testCount
    assert(got("COUNT(*)") == Seq(120000L))
    assert(got("COUNT(*)", s" WHERE $FILTER") == Seq(24516L))
    assert(got("COUNT(*) AS v1",
      " GROUP BY column9 ORDER BY v1 DESC LIMIT 1") == Seq(64420L))
    assert(got("COUNT(*) AS v1",
      s" WHERE $FILTER GROUP BY column9 ORDER BY v1 DESC LIMIT 1") ==
      Seq(17080L))
    // testMax
    def maxSel = "CAST(MAX(column1) AS DOUBLE) AS v1, " +
      "CAST(MAX(column3) AS DOUBLE) AS v2"
    assert(got(maxSel) == Seq(2146952047.0, 2147419555.0))
    assert(got(maxSel, s" WHERE $FILTER") == Seq(2146952047.0, 999813884.0))
    assert(got(maxSel, GROUP_BY) == Seq(2146952047.0, 2146630496.0))
    assert(got(maxSel, s" WHERE $FILTER$GROUP_BY") ==
      Seq(2146952047.0, 999813884.0))
    // testMin (its own group-by orders ascending)
    def minSel = "CAST(MIN(column1) AS DOUBLE) AS v1, " +
      "CAST(MIN(column3) AS DOUBLE) AS v2"
    assert(got(minSel) == Seq(240528.0, 17891.0))
    assert(got(minSel, s" WHERE $FILTER") == Seq(101116473.0, 20396372.0))
    assert(got(minSel, " GROUP BY column9 ORDER BY v1, v2 LIMIT 1") ==
      Seq(240528.0, 17891.0))
    assert(got(minSel,
      s" WHERE $FILTER GROUP BY column9 ORDER BY v1, v2 LIMIT 1") ==
      Seq(101116473.0, 91804599.0))
    // testSum
    def sumSel = "CAST(SUM(column1) AS DOUBLE) AS v1, " +
      "CAST(SUM(column3) AS DOUBLE) AS v2"
    assert(got(sumSel) == Seq(129268741751388.0, 129156636756600.0))
    assert(got(sumSel, s" WHERE $FILTER") ==
      Seq(27503790384288.0, 12429178874916.0))
    assert(got(sumSel, GROUP_BY) == Seq(69526727335224.0, 69225631719808.0))
    assert(got(sumSel, s" WHERE $FILTER$GROUP_BY") ==
      Seq(19058003631876.0, 8606725456500.0))
    // testAvg (reference allows 1e-5)
    def avgSel = "AVG(column1) AS v1, AVG(column3) AS v2"
    val avg0 = got(avgSel)
    assert(approx(avg0(0), 1077239514.5949, 1e-5) &&
      approx(avg0(1), 1076305306.305, 1e-5))
    val avgF = got(avgSel, s" WHERE $FILTER")
    assert(approx(avgF(0), 1121871038.68037, 1e-5) &&
      approx(avgF(1), 506982332.96280, 1e-5))
    assert(got(avgSel, GROUP_BY) == Seq(2142595699.0, 334963174.0))
    assert(got(avgSel, s" WHERE $FILTER$GROUP_BY") ==
      Seq(2142595699.0, 334963174.0))
    // testMinMaxRange
    def rangeSel =
      "CAST(MAX(column1) - MIN(column1) AS DOUBLE) AS v1, " +
        "CAST(MAX(column3) - MIN(column3) AS DOUBLE) AS v2"
    assert(got(rangeSel) == Seq(2146711519.0, 2147401664.0))
    assert(got(rangeSel, s" WHERE $FILTER") ==
      Seq(2045835574.0, 979417512.0))
    assert(got(rangeSel, GROUP_BY) == Seq(2146711519.0, 2146612605.0))
    assert(got(rangeSel, s" WHERE $FILTER$GROUP_BY") ==
      Seq(2044094181.0, 979417512.0))
    // testDistinctCount
    def dcSel = "CAST(COUNT(DISTINCT column1) AS INT) AS v1, " +
      "CAST(COUNT(DISTINCT column3) AS INT) AS v2"
    assert(got(dcSel) == Seq(6582, 21910))
    assert(got(dcSel, s" WHERE $FILTER") == Seq(1872, 4556))
    assert(got(dcSel, GROUP_BY) == Seq(3495, 11961))
    assert(got(dcSel, s" WHERE $FILTER$GROUP_BY") == Seq(1272, 3289))
  }

  test("reference geospatial fixtures: complex WKT round-trips the wire format") {
    requireReference()
    // pinot-core/src/test/resources/geospatial/complex-*.txt — the
    // real-world geometries the reference's serde benchmark
    // (BenchmarkGeospatialSerde.java) feeds through
    // GeometrySerializer; each must survive our
    // serialize → deserialize byte layout with geometry equality
    val dir = new java.io.File(
      "/root/reference/pinot-core/src/test/resources/geospatial")
    val files = dir.listFiles().filter(_.getName.endsWith(".txt"))
    assert(files.nonEmpty)
    val reader = new org.locationtech.jts.io.WKTReader()
    files.foreach { f =>
      val wkt = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      val g = reader.read(wkt)
      val bytes = graft.plans.GeoJts.serialize(g)
      val back = graft.plans.GeoJts.deserialize(bytes)
      // norm() canonicalizes ring orientation/order without topology
      // ops (real-world fixtures include invalid self-touching rings
      // that equalsTopo cannot relate)
      assert(back.norm().equalsExact(g.norm(), 0.0),
        s"${f.getName}: wire round-trip changed the geometry")
      assert(math.abs(back.getArea - g.getArea) <= 1e-12 * (1 + g.getArea),
        s"${f.getName}: area drifted")
      assert(back.getNumPoints == g.getNumPoints,
        s"${f.getName}: point count changed")
    }
  }
}
