package graft

import org.apache.spark.sql.functions._
import graft.functions.ClpFunctions
import graft.sources.ClpLogIngest

/** Config-driven CLP-log ingest extractor (sources/ClpLogIngest.scala)
  * — the analog of the reference's pinot-clp-log plugin
  * (CLPLogRecordExtractor.java / CLPLogRecordExtractorConfig.java):
  * configured message fields land as the logtype/dictionaryVars/
  * encodedVars column triple at ingest, no hand-written projections.
  */
class ClpLogIngestSpec extends SparkSpec {
  import spark.implicits._

  private def decodeOf(prefix: String) = ClpFunctions.clpDecode(
    col(prefix + "_logtype"),
    col(prefix + "_dictionaryVars"),
    col(prefix + "_encodedVars"))

  test("configured string field lands as a round-tripping triple; original kept by default") {
    val df = Seq(
      ("a", "INFO Task 12345 completed in 250 ms"),
      ("b", "ERROR node-7 failed after 3 retries")).toDF("id", "msg")
    val out = ClpLogIngest.extract(df,
      ClpLogIngest.Config(fieldsForClpEncoding = Seq("msg")))
    assert(out.columns.toSeq == Seq("id", "msg",
      "msg_logtype", "msg_dictionaryVars", "msg_encodedVars"))
    assert(out.filter(decodeOf("msg") =!= $"msg").count() == 0)
    val r = out.filter($"id" === "a")
      .select($"msg_dictionaryVars", $"msg_encodedVars").collect().head
    assert(r.getSeq[Long](1) == Seq(12345L, 250L))
  }

  test("removeProcessedFields drops the original column (CLPLogRecordExtractor.java:260-262)") {
    val df = Seq(("a", "x 1")).toDF("id", "msg")
    val out = ClpLogIngest.extract(df, ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("msg"), removeProcessedFields = true))
    assert(!out.columns.contains("msg"))
    assert(out.columns.contains("msg_logtype"))
  }

  test("non-string values are JSON-rendered before encoding (:198-212)") {
    val df = Seq((1L, 42L)).toDF("id", "code")
      .withColumn("evt", struct(lit("boot").as("kind"), lit(7L).as("n")))
    val out = ClpLogIngest.extract(df, ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("code", "evt")))
    val r = out.select(
      decodeOf("code").as("code_back"), decodeOf("evt").as("evt_back"))
      .collect().head
    assert(r.getString(0) == "42")
    assert(r.getString(1) == """{"kind":"boot","n":7}""")
  }

  test("absent configured field and null values yield null triples, never an error (:190-194)") {
    val df = Seq(("a", "x 1"), ("b", null)).toDF("id", "msg")
    val out = ClpLogIngest.extract(df, ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("msg", "ghost")))
    val rows = out.orderBy("id").select(
      $"msg_logtype".isNull, $"ghost_logtype".isNull,
      $"ghost_dictionaryVars".isNull, $"ghost_encodedVars".isNull)
      .collect()
    assert(!rows(0).getBoolean(0) && rows(0).getBoolean(1))
    assert(rows(1).getBoolean(0) && rows(1).getBoolean(1))
    assert(rows(0).getBoolean(2) && rows(0).getBoolean(3))
  }

  test("topicNameDestinationColumn stamps the source on every row (:111-114)") {
    val df = Seq(("a", "x")).toDF("id", "msg")
    val cfg = ClpLogIngest.Config(fieldsForClpEncoding = Seq("msg"),
      topicNameDestinationColumn = Some("src_topic"))
    val stamped = ClpLogIngest.extract(df, cfg, Some("logs-raw"))
    assert(stamped.select($"src_topic").collect().head.getString(0) == "logs-raw")
    val unstamped = ClpLogIngest.extract(df, cfg, None)
    assert(unstamped.select($"src_topic").collect().head.isNullAt(0))
  }

  test("unencodable cells: error-message triple + original under the configured suffix (:237-253)") {
    // > MAX_VARIABLES_PER_CELL encoded vars makes the cell unencodable
    val big = (1 to ClpLogIngest.MaxVariablesPerCell + 1).mkString(" ")
    val df = Seq(("big", big), ("ok", "x 1")).toDF("id", "msg")
    val out = ClpLogIngest.extract(df, ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("msg"),
      unencodableFieldSuffix = Some("_raw"),
      unencodableFieldError = Some("Unencodable field: msg")))
    val r = out.orderBy("id").select(
      decodeOf("msg").as("back"), $"msg_raw", $"msg").collect()
    // row "big": triple holds the error message's own encoding, raw col keeps the value
    assert(r(0).getString(0) == "Unencodable field: msg")
    assert(r(0).getString(1) == big)
    // row "ok": normal encoding, raw col null
    assert(r(1).getString(0) == "x 1")
    assert(r(1).isNullAt(1))

    // without unencodableFieldError the fallback triple is null (:249-252)
    val nulls = ClpLogIngest.extract(df, ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("msg")))
      .filter($"id" === "big")
      .select($"msg_logtype".isNull, $"msg_dictionaryVars".isNull,
        $"msg_encodedVars".isNull).collect().head
    assert(nulls.getBoolean(0) && nulls.getBoolean(1) && nulls.getBoolean(2))
  }

  test("stream decoder shape: kafka-value JSON -> configured fields CLP-encoded (CLPLogMessageDecoder)") {
    // the reference's CLPLogMessageDecoder parses the record body as
    // JSON and hands the map to the extractor; here: MemoryStream with
    // the kafka record shape -> from_json -> ClpLogIngest.extract.
    // The extractor is a pure projection, so it is streaming-legal.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val cfg = ClpLogIngest.fromProps(Map(
      "stream.kafka.decoder.prop.fieldsForClpEncoding" -> "message",
      "stream.kafka.decoder.prop.removeProcessedFields" -> "true",
      "topicNameDestinationColumn" -> "topic"))
    val parsed = mem.toDF().toDF("value")
      .select(from_json(col("value").cast("string"),
        StructType(Seq(StructField("level", StringType),
          StructField("message", StringType)))).as("j"))
      .select(col("j.level").as("level"), col("j.message").as("message"))
    val decoded = ClpLogIngest.extract(parsed, cfg, Some("logs-raw"))
    val q = decoded.writeStream.format("memory").queryName("clp_stream")
      .outputMode("append").start()
    mem.addData("""{"level":"INFO","message":"Task 42 took 7 ms"}"""
      .getBytes("UTF-8"))
    q.processAllAvailable()
    val got = spark.table("clp_stream").collect()
    q.stop()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("level") == "INFO")
    assert(r.getAs[String]("topic") == "logs-raw")
    assert(!got.head.schema.fieldNames.contains("message"))
    // triple round-trips through clpDecode
    val back = decoded.sparkSession.createDataFrame(
        java.util.List.of(r), r.schema)
      .select(decodeOf("message").as("b")).collect().head.getString(0)
    assert(back == "Task 42 took 7 ms")
  }

  test("fromProps parses the reference decoder-prop surface (CLPLogRecordExtractorConfig.init)") {
    val cfg = ClpLogIngest.fromProps(Map(
      "stream.kafka.decoder.prop.fieldsForClpEncoding" -> "message,logPath",
      "stream.kafka.decoder.prop.removeProcessedFields" -> "TRUE",
      "stream.kafka.decoder.prop.unencodableFieldSuffix" -> "_raw",
      "stream.kafka.decoder.prop.unencodableFieldError" -> "",
      "topicNameDestinationColumn" -> "topic"))
    assert(cfg.fieldsForClpEncoding == Seq("message", "logPath"))
    assert(cfg.removeProcessedFields)
    assert(cfg.unencodableFieldSuffix.contains("_raw"))
    assert(cfg.unencodableFieldError.isEmpty) // empty value ignored
    assert(cfg.topicNameDestinationColumn.contains("topic"))
  }
}
