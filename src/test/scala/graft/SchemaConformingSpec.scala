package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.sources.SchemaConforming
import graft.sources.SchemaConforming.Config

/** Replay of the reference's SchemaConformingTransformer suite
  * (`pinot-segment-local/.../recordtransformer/
  * SchemaConformingTransformerTest.java`): dedicated-column
  * extraction, indexable/unindexable extras, the anonymous-dot flag,
  * null dropping, and the merged-text-index document format. The
  * upstream corpus (TEST_JSON_MAP_NODE and friends) is reproduced
  * verbatim; merged-text docs compare as sets (the reference's
  * HashMap iteration order is not part of the contract). */
class SchemaConformingSpec extends SparkSpec {
  import spark.implicits._

  private val M = new ObjectMapper
  private def conformed(input: String, declared: Map[String, Boolean],
      cfg: Config): com.fasterxml.jackson.databind.JsonNode = {
    val df = Seq(input).toDF("j")
      .select(SchemaConforming.conform(col("j"), declared, cfg).as("out"))
    M.readTree(df.collect().head.getString(0))
  }

  // TEST_JSON_MAP_NODE: {arrayField:[0,1,2,3], nullField:null, stringField:"a"}
  private val mapNode =
    """{"arrayField":[0,1,2,3],"nullField":null,"stringField":"a"}"""
  private val mapNodeNoNull = """{"arrayField":[0,1,2,3],"stringField":"a"}"""
  // the suite's input record (testWithNoUnindexableFields)
  private val input =
    s"""{"arrayField":[0,1,2,3],"nullField":null,"stringField":"a",
        "mapField":$mapNode,
        "dotField.dotSuffix":"a",
        "nestedFields":{"arrayField":[0,1,2,3],"nullField":null,
          "stringField":"a","mapField":$mapNode}}"""

  test("no dedicated columns: everything under json_data, nulls dropped (:155-186)") {
    val got = conformed(input, Map.empty, Config())
    val expect = M.readTree(
      s"""{"json_data":{"arrayField":[0,1,2,3],"stringField":"a",
          "mapField":$mapNodeNoNull,
          "dotField.dotSuffix":"a",
          "nestedFields":{"arrayField":[0,1,2,3],"stringField":"a",
            "mapField":$mapNodeNoNull}}}""")
    assert(got == expect)
  }

  test("four declared columns, two populated; anonymous dot OFF (:188-230)") {
    val declared = Map(
      "arrayField" -> false, "mapField" -> false,
      "dotField.dotSuffix" -> false, "nestedFields.stringField" -> false)
    val got = conformed(input, declared,
      Config(useAnonymousDotInFieldNames = false))
    val expect = M.readTree(
      s"""{"arrayField":[0,1,2,3],
          "nestedFields.stringField":"a",
          "json_data":{"stringField":"a",
            "mapField":$mapNodeNoNull,
            "dotField.dotSuffix":"a",
            "nestedFields":{"arrayField":[0,1,2,3],
              "mapField":$mapNodeNoNull}}}""")
    assert(got == expect)
  }

  test("eight declared columns, six populated; JSON columns take subtrees (:232-269)") {
    val declared = Map(
      "arrayField" -> false, "nullField" -> false, "stringField" -> false,
      "dotField.dotSuffix" -> false, "mapField" -> true,
      "nestedFields.arrayField" -> false, "nestedFields.nullField" -> false,
      "nestedFields.stringField" -> false, "nestedFields.mapField" -> true)
    val got = conformed(input, declared, Config())
    val expect = M.readTree(
      s"""{"arrayField":[0,1,2,3],"stringField":"a",
          "dotField.dotSuffix":"a",
          "mapField":$mapNodeNoNull,
          "nestedFields.arrayField":[0,1,2,3],
          "nestedFields.stringField":"a",
          "nestedFields.mapField":$mapNodeNoNull}""")
    assert(got == expect)
  }

  test("unindexable suffix splits extras; merged text index docs (:271-440)") {
    val mapWithNoIdx =
      s"""{"arrayField":[0,1,2,3],"nullField":null,"stringField":"a",
          "intField_noIndex":9,"stringField_noIndex":"z"}"""
    val in =
      s"""{"arrayField":[0,1,2,3],"nullField":null,"stringField":"aA_123",
          "intField_noIndex":9,"stringField_noIndex":"z",
          "mapField":$mapWithNoIdx,
          "mapField_noIndex":$mapNode,
          "nestedFields":{"arrayField":[0,1,2,3],"nullField":null,
            "stringField":"a","intField_noIndex":9,
            "stringField_noIndex":"z","mapField":$mapWithNoIdx}}"""
    val cfg = Config(
      indexableExtrasField = "indexableExtras",
      unindexableExtrasField = Some("unindexableExtras"),
      unindexableFieldSuffix = Some("_noIndex"),
      mergedTextIndexField = Some("__mergedTextIndex"),
      jsonKeyValueSeparator = "\u001e",
      mergedTextIndexBeginOfDocAnchor = "\u0002",
      mergedTextIndexEndOfDocAnchor = "\u0003")
    val got = conformed(in, Map.empty, cfg)
    val expectIdx = M.readTree(
      s"""{"arrayField":[0,1,2,3],"stringField":"aA_123",
          "mapField":$mapNodeNoNull,
          "nestedFields":{"arrayField":[0,1,2,3],"stringField":"a",
            "mapField":$mapNodeNoNull}}""")
    val expectUnidx = M.readTree(
      s"""{"intField_noIndex":9,"stringField_noIndex":"z",
          "mapField":{"intField_noIndex":9,"stringField_noIndex":"z"},
          "mapField_noIndex":$mapNodeNoNull,
          "nestedFields":{"intField_noIndex":9,"stringField_noIndex":"z",
            "mapField":{"intField_noIndex":9,"stringField_noIndex":"z"}}}""")
    assert(got.get("indexableExtras") == expectIdx)
    assert(got.get("unindexableExtras") == expectUnidx)
    // merged docs: BOD + value + sep + key + EOD; arrays contribute the
    // whole-array JSON plus one doc per element (:391-440 golds)
    def d(v: String, k: String) = "\u0002" + v + "\u001e" + k + "\u0003"
    val gotDocs = got.get("__mergedTextIndex").elements()
    val docs = Iterator.continually(gotDocs)
      .takeWhile(_.hasNext).map(_.next().asText()).toSet
    val arrDocs = (k: String) =>
      Set(d("[0,1,2,3]", k)) ++ (0 to 3).map(i => d(i.toString, k))
    val expectDocs =
      arrDocs("arrayField") ++ Set(d("aA_123", "stringField")) ++
      arrDocs("mapField.arrayField") ++ Set(d("a", "mapField.stringField")) ++
      arrDocs("nestedFields.arrayField") ++
      Set(d("a", "nestedFields.stringField")) ++
      arrDocs("nestedFields.mapField.arrayField") ++
      Set(d("a", "nestedFields.mapField.stringField"))
    assert(docs == expectDocs)
  }

  test("fieldPathsToDrop + anonymous dot ON matches the dotted column") {
    val declared = Map("dotField.dotSuffix" -> false)
    val got = conformed(input, declared,
      Config(fieldPathsToDrop = Set("mapField", "nestedFields.mapField")))
    assert(got.get("dotField.dotSuffix").asText() == "a")
    assert(!got.get("json_data").has("mapField"))
    assert(!got.get("json_data").get("nestedFields").has("mapField"))
  }

  test("base64ValueFilter contract (:990-1010)") {
    val min = 10
    assert(!SchemaConforming.base64Filter("Hello world", min))
    assert(SchemaConforming.base64Filter("ABCxyz12345-_+/=", min))
    assert(SchemaConforming.base64Filter("ABCxyz12345-_+/=..", min))
    assert(!SchemaConforming.base64Filter("A.BCxy.z12345-_+/=..", min))
    assert(!SchemaConforming.base64Filter("short", min))
    assert(!SchemaConforming.base64Filter(
      "field:1:1:v1Cgy+ypzk8yf9JzsdkBjvZ1jM8Mem/BTtNilst64Df/34xmJzeRstmihpfrWZ", min))
    assert(!SchemaConforming.base64Filter(
      """{"field":"text:1:1:v1Cgy+ypzk8yf9JzsdkBjvZ1jM8Mem/BTtNilst64Df"}""", min))
  }

  test("optimizeCaseInsensitiveSearch adds a lowercase duplicate") {
    val cfg = Config(mergedTextIndexField = Some("m"),
      optimizeCaseInsensitiveSearch = true)
    val got = conformed("""{"k":"AbC"}""", Map.empty, cfg)
    val docs = got.get("m").elements()
    val set = Iterator.continually(docs).takeWhile(_.hasNext)
      .map(_.next().asText()).toSet
    assert(set == Set("AbC:k", "abc:k"))
  }
}
