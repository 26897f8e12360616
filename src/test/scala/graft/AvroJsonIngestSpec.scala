package graft

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecordBuilder}
import graft.sources.AvroJsonIngest

/** Replay of the reference's avro→JSON-column ingestion suite
  * (`pinot-core/.../queries/JsonIngestionFromAvroQueriesTest.java`):
  * the avro file is built with the suite's exact schema and seven
  * records (union/map/record/enum/fixed/bytes/array-of-records), then
  * ingested with the five json columns declared as JSON destinations,
  * and the suite's selection + json-path + JSON_MATCH queries replay
  * against its committed expected strings. */
class AvroJsonIngestSpec extends SparkSpec {

  private def buildAvro(dir: java.io.File): java.io.File = {
    import org.apache.avro.Schema.Type
    import org.apache.avro.Schema.{create, createArray, createMap, createUnion, createEnum, createFixed, createRecord}
    def recordSchema: Schema = {
      val s = createRecord("structType", null, null, false)
      s.setFields(Seq(
        new Schema.Field("id", create(Type.INT), null, null),
        new Schema.Field("name", create(Type.STRING), null, null)).asJava)
      s
    }
    def json5Schema: Schema = {
      val s = createRecord("json5", null, null, false)
      s.setFields(Seq(
        new Schema.Field("timestamp", create(Type.LONG), null, null),
        new Schema.Field("data", createMap(create(Type.STRING)), null, null)).asJava)
      s
    }
    val enumSchema = createEnum("direction", null, null,
      Seq("UP", "DOWN", "LEFT", "RIGHT").asJava)
    val fixedSchema = createFixed("fixed", null, null, 4)
    val avroSchema = createRecord("eventsRecord", null, null, false)
    avroSchema.setFields(Seq(
      new Schema.Field("intColumn",
        createUnion(create(Type.INT), create(Type.NULL)), null, null),
      new Schema.Field("stringColumn",
        createUnion(create(Type.STRING), create(Type.NULL)), null, null),
      new Schema.Field("jsonColumn1", createUnion(
        createArray(create(Type.STRING)), createMap(create(Type.STRING)),
        recordSchema, create(Type.STRING), create(Type.NULL)), null, null),
      new Schema.Field("jsonColumn2", enumSchema, null, null),
      new Schema.Field("jsonColumn3", fixedSchema, null, null),
      new Schema.Field("jsonColumn4", create(Type.BYTES), null, null),
      new Schema.Field("jsonColumn5", createArray(json5Schema), null, null))
      .asJava)

    def mapOf(pairs: (String, String)*): java.util.Map[String, String] = {
      val m = new java.util.LinkedHashMap[String, String]()
      pairs.foreach { case (k, v) => m.put(k, v) }
      m
    }
    def fixedOf(i: Int) = new GenericData.Fixed(fixedSchema,
      Array[Byte](0, 0, 0, i.toByte))
    def json5Of(ts: Long, pairs: (String, String)*) = {
      val l = new java.util.ArrayList[Any]()
      l.add(new GenericRecordBuilder(json5Schema)
        .set("timestamp", ts).set("data", mapOf(pairs: _*)).build())
      l
    }
    def structOf(id: Int, name: String) =
      new GenericRecordBuilder(recordSchema).set("id", id)
        .set("name", name).build()
    def rec(i: Int, s: String, j1: Any, dir: String) = {
      val r = new GenericData.Record(avroSchema)
      r.put("intColumn", i)
      r.put("stringColumn", s)
      r.put("jsonColumn1", j1)
      r.put("jsonColumn2", new GenericData.EnumSymbol(enumSchema, dir))
      r.put("jsonColumn3", fixedOf(i))
      r.put("jsonColumn4", java.nio.ByteBuffer.wrap(Array[Byte](0, 0, 0, i.toByte)))
      r.put("jsonColumn5", json5Of(1719390720L + i,
        "a" -> i.toString, "b" -> (2 * i).toString))
      r
    }
    val records = Seq(
      rec(1, "daffy duck",
        java.util.List.of("this", "is", "a", "test"), "UP"),
      rec(2, "mickey mouse", mapOf("b" -> "2", "a" -> "1"), "DOWN"),
      rec(3, "donald duck", mapOf("a" -> "1", "b" -> "2"), "UP"),
      rec(4, "scrooge mcduck", mapOf("a" -> "1", "b" -> "2"), "LEFT"),
      rec(5, "minney mouse", structOf(1, "minney"), "RIGHT"),
      rec(6, "pluto", "test", "DOWN"),
      rec(7, "scooby doo", "{\"name\":  \"scooby\",   \"id\":7}", "UP"))
    val f = new java.io.File(dir, "JsonIngestionFromAvroTest.avro")
    val w = new DataFileWriter[GenericData.Record](
      new GenericDatumWriter[GenericData.Record](avroSchema))
    w.create(avroSchema, f)
    records.foreach(w.append)
    w.close()
    f
  }

  test("reference avro JSON-ingestion suite: JsonIngestionFromAvroQueriesTest golds") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_avro_json").toFile
    val file = buildAvro(dir)
    val df = AvroJsonIngest.read(spark, file.getPath,
      Set("jsonColumn1", "jsonColumn2", "jsonColumn3",
        "jsonColumn4", "jsonColumn5"))
    df.createOrReplaceTempView("avro_json_testtable")
    graft.sql.QueryFacade.init(spark, sf)
    def q(sql: String) = graft.sql.QueryFacade.sql(spark,
      s"SET explicitLimit = true; $sql")

    // testSimpleSelectOnJsonColumn (:330-356): raw JSON-column strings
    val r1 = q("SELECT intColumn, stringColumn, jsonColumn1, jsonColumn2" +
      " FROM avro_json_testtable ORDER BY intColumn LIMIT 100")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    assert(r1 == Seq(
      (1, "daffy duck", """["this","is","a","test"]""", "\"UP\""),
      (2, "mickey mouse", """{"a":"1","b":"2"}""", "\"DOWN\""),
      (3, "donald duck", """{"a":"1","b":"2"}""", "\"UP\""),
      (4, "scrooge mcduck", """{"a":"1","b":"2"}""", "\"LEFT\""),
      (5, "minney mouse", """{"id":1,"name":"minney"}""", "\"RIGHT\""),
      (6, "pluto", "\"test\"", "\"DOWN\""),
      (7, "scooby doo", """{"name":"scooby","id":7}""", "\"UP\"")))

    // testJsonPathSelectOnJsonColumn (:359-378): '$.name' with a
    // 'null' STRING default
    val r2 = q("SELECT intColumn, json_extract_scalar(jsonColumn1," +
      " '$.name', 'STRING', 'null') AS v FROM avro_json_testtable" +
      " ORDER BY intColumn").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(r2 == Seq((1, "null"), (2, "null"), (3, "null"), (4, "null"),
      (5, "minney"), (6, "null"), (7, "scooby")))

    // testStringValueSelectOnJsonColumn (:381-399): JSON_MATCH on the
    // document ROOT ("$" = 'test') hits only the plain-string row
    val r3 = q("SELECT json_extract_scalar(jsonColumn1, '$', 'STRING')" +
      " AS v FROM avro_json_testtable" +
      " WHERE JSON_MATCH(jsonColumn1, '\"$\" = ''test''')").collect()
    assert(r3.map(_.getString(0)).toSeq == Seq("test"))

    // testSimpleSelectOnFixedJsonColumn / OnBytesJsonColumn (:402-412,
    // 443-457): FIXED and BYTES render as base64 JSON strings
    for (c <- Seq("jsonColumn3", "jsonColumn4")) {
      val got = q(s"SELECT $c FROM avro_json_testtable ORDER BY intColumn")
        .collect().map(_.getString(0)).toSeq
      val expect = (1 to 7).map { i =>
        "\"" + java.util.Base64.getEncoder
          .encodeToString(Array[Byte](0, 0, 0, i.toByte)) + "\""
      }
      assert(got == expect, s"column $c")
    }

    // testComplexSelectOnJsonColumn (:414-441): array of records —
    // record keys sorted (data before timestamp)
    val r5 = q("SELECT jsonColumn5 FROM avro_json_testtable" +
      " ORDER BY intColumn").collect().map(_.getString(0)).toSeq
    assert(r5 == (1 to 7).map(i =>
      s"""[{"data":{"a":"$i","b":"${2 * i}"},"timestamp":${1719390720L + i}}]"""))

    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
