package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.PinotSchema
import graft.sources.BatchIngest
import graft.operators.TimeSeries

class IngestSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("pinot json schema parses to StructType with roles and MV arrays") {
    val json = """{
      "schemaName": "game",
      "dimensionFieldSpecs": [
        {"name": "player", "dataType": "STRING"},
        {"name": "tags", "dataType": "INT", "singleValueField": false}],
      "metricFieldSpecs": [{"name": "score", "dataType": "DOUBLE"}],
      "dateTimeFieldSpecs": [{"name": "ts", "dataType": "TIMESTAMP"}]
    }"""
    val sch = PinotSchema.fromJson(json)
    assert(sch.name == "game")
    val st = sch.toStructType
    assert(st("player").dataType == StringType)
    assert(st("tags").dataType == ArrayType(IntegerType))
    assert(st("score").dataType == DoubleType)
    assert(st("score").metadata.getString("pinotRole") == "METRIC")
    assert(st("ts").dataType == TimestampType)
  }

  test("default null mode substitutes FieldSpec defaults") {
    val sch = PinotSchema.Schema("t", Seq(
      PinotSchema.Field("d", IntegerType, PinotSchema.Dimension),
      PinotSchema.Field("m", DoubleType, PinotSchema.Metric),
      PinotSchema.Field("s", StringType, PinotSchema.Dimension)))
    val df = Seq((Some(1), Some(2.0), Some("x")), (None, None, None))
      .toDF("d", "m", "s")
    val out = sch.withDefaultNulls(df).orderBy($"d".desc)
      .as[(Int, Double, String)].collect()
    assert(out(1) == ((Int.MinValue, 0.0, "null")))
  }

  test("schema evolution backfills new columns with field defaults") {
    // stored table predates the evolved schema: no `m2`, no `mv`, and
    // it still carries a column (`legacy`) the schema dropped
    val stored = Seq((1, "a", 10L), (2, "b", 20L))
      .toDF("id", "legacy", "m1")
    val evolved = PinotSchema.Schema("t", Seq(
      PinotSchema.Field("id", IntegerType, PinotSchema.Dimension),
      PinotSchema.Field("m1", DoubleType, PinotSchema.Metric), // LONG→DOUBLE widen
      PinotSchema.Field("m2", LongType, PinotSchema.Metric),   // new metric → 0
      PinotSchema.Field("tag", StringType, PinotSchema.Dimension), // new dim → "null"
      PinotSchema.Field("mv", IntegerType, PinotSchema.Dimension,
        singleValue = false)))                                 // new MV → [default]
    val out = evolved.evolve(stored)
    assert(out.columns.toSeq == Seq("id", "m1", "m2", "tag", "mv"))
    val rows = out.orderBy($"id")
      .as[(Int, Double, Long, String, Seq[Int])].collect()
    assert(rows(0) == ((1, 10.0, 0L, "null", Seq(Int.MinValue))))
    assert(rows(1) == ((2, 20.0, 0L, "null", Seq(Int.MinValue))))
  }

  test("batch ingest applies transforms and writes pruned layout") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    val input = Seq(
      (1L, "  hello  ", "2024-01-01 10:00:00", Seq(1, 2)),
      (2L, "drop me", "2024-01-02 10:00:00", Seq(3)),
      (3L, "keep", "1899-01-01 00:00:00", Seq.empty[Int]))
      .toDF("id", "s", "t", "arr")
      .withColumn("t", to_timestamp($"t"))
    BatchIngest.ingest(spark, input, s"$dir/out",
      transforms = Seq(
        BatchIngest.Sanitize("s", 4),
        BatchIngest.DropWhere(col("s") === "drop"),
        BatchIngest.ValidTime("t", "1990-01-01", "2030-01-01"),
        BatchIngest.Derive("day", to_date($"t")),
        BatchIngest.Unnest("arr")),
      partitionBy = Seq("day"), sortBy = Seq("id"))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.filter($"s" === "drop").count() == 0)
    assert(out.filter($"id" === 1L).count() == 2) // unnested
    assert(out.filter($"id" === 3L).select($"t").collect().head.isNullAt(0))
    assert(out.filter($"id" === 1L).select($"s").as[String].collect().head == "hell")
    // partition pruning: day is a partition column in the layout
    assert(new java.io.File(s"$dir/out").listFiles.exists(_.getName.startsWith("day=")))
  }

  test("time series range query buckets and aggregates") {
    val events = Seq(
      ("2024-01-01 00:10:00", "a", 1.0),
      ("2024-01-01 01:50:00", "a", 2.0),   // same 2h bucket as above
      ("2024-01-01 02:10:00", "a", 4.0),   // next bucket
      ("2023-12-31 23:59:00", "a", 100.0)) // out of range
      .toDF("ts", "tag", "v")
      .withColumn("ts", to_timestamp($"ts"))
    val out = TimeSeries.rangeQuery(events, TimeSeries.RangeRequest(
      "ts", "v", TimeSeries.SumSeries, Seq("tag"),
      startSeconds = 1704067200L, endSeconds = 1704067200L + 86400, stepSeconds = 7200))
      .orderBy($"bucket").select($"value").as[Double].collect()
    assert(out.toSeq == Seq(3.0, 4.0))
  }

  test("open-struct value inference follows the reference policy table") {
    import graft.schema.OpenStruct
    // OpenStructTypeInference.java: BYTE/CHAR/SHORT/INT → INT; LONG;
    // FLOAT; DOUBLE; BIG_DECIMAL; BOOLEAN; TIMESTAMP kept;
    // STRING/DATE/TIME/UUID → STRING; BYTES; unrepresentable → None
    assert(OpenStruct.inferDataType(1.toByte).contains(IntegerType))
    assert(OpenStruct.inferDataType('c').contains(IntegerType))
    assert(OpenStruct.inferDataType(1.toShort).contains(IntegerType))
    assert(OpenStruct.inferDataType(42).contains(IntegerType))
    assert(OpenStruct.inferDataType(42L).contains(LongType))
    assert(OpenStruct.inferDataType(1.5f).contains(FloatType))
    assert(OpenStruct.inferDataType(1.5d).contains(DoubleType))
    assert(OpenStruct.inferDataType(new java.math.BigDecimal("1.5"))
      .exists(_.isInstanceOf[DecimalType]))
    assert(OpenStruct.inferDataType(true).contains(BooleanType))
    assert(OpenStruct.inferDataType(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      .contains(TimestampType))
    assert(OpenStruct.inferDataType("s").contains(StringType))
    assert(OpenStruct.inferDataType(
      java.sql.Date.valueOf("2024-01-01")).contains(StringType))
    assert(OpenStruct.inferDataType(
      java.util.UUID.randomUUID()).contains(StringType))
    assert(OpenStruct.inferDataType(Array[Byte](1, 2)).contains(BinaryType))
    assert(OpenStruct.inferDataType(List(1, 2)).isEmpty)
  }

  test("open-struct split over a divergent-schema file set") {
    import graft.schema.OpenStruct
    val dir = Files.createTempDirectory("openstruct").toString
    // two JSON files whose `props` objects disagree on keys and types
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"id": 1, "props": {"k": 10, "tag": "x", "rare": "r1"}}
        |{"id": 2, "props": {"k": 20, "tag": "y"}}
        |{"id": 3, "props": {"k": 30, "tag": "z"}}
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"id": 4, "props": {"k": 40, "nested": {"a": 1}}}
        |{"id": 5, "props": {"k": "not-a-number", "tag": "w"}}
        |""".stripMargin)
    // schema-merge read: key union, absent keys null (the presence
    // bitmap analog); k's int/string conflict widens to string
    val df = spark.read.json(s"$dir/a.json", s"$dir/b.json")

    // fill rates over 5 docs: k 5/5, tag 4/5, rare 1/5, nested 1/5
    val rates = OpenStruct.fillRates(df, "props")
    assert(rates("k") == 1.0 && rates("tag") == 0.8 &&
      rates("rare") == 0.2 && rates("nested") == 0.2)

    // classify: fill-rate desc, min fill 0.5 → dense {k, tag}
    val cfg = OpenStruct.Config(
      childSpecs = Map("k" -> IntegerType))
    assert(OpenStruct.classify(rates, cfg) == Seq("k", "tag"))
    // maxDenseKeys caps the ranked set; configured keys go first
    assert(OpenStruct.classify(rates,
      OpenStruct.Config(denseKeys = Seq("rare"), maxDenseKeys = 2)) ==
      Seq("rare", "k"))

    val out = OpenStruct.split(df, "props", cfg)
    assert(out.columns.toSet ==
      Set("id", "props$k", "props$tag", "props$__sparse__"))
    // declared child spec INT coerces; the "not-a-number" row fails
    // coercion → null (the reference's dropped presence bit)
    assert(out.schema("props$k").dataType == IntegerType)
    val byId = out.collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
    assert(byId(1L).getInt(byId(1L).fieldIndex("props$k")) == 10)
    assert(byId(5L).isNullAt(byId(5L).fieldIndex("props$k")))
    // sparse column: only present keys serialize; rows with no sparse
    // keys are null
    val s1 = byId(1L).getString(byId(1L).fieldIndex("props$__sparse__"))
    assert(s1.contains("\"rare\":\"r1\"") && !s1.contains("nested"))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("props$__sparse__")))
    val s4 = byId(4L).getString(byId(4L).fieldIndex("props$__sparse__"))
    assert(s4.contains("\"nested\""))
    // naming helpers round-trip
    assert(OpenStruct.materializedColumnName("props", "k") == "props$k")
    assert(OpenStruct.sparseColumnName("props") == "props$__sparse__")
  }
}
