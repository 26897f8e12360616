package graft

import org.apache.spark.sql.functions._
import graft.sources.{BatchIngest, RecordEnrichers}
import graft.functions.ClpFunctions

/** Record-enricher SPI analog — config plumbing for the reference's
  * "generateColumn" and "clpEnricher" factories and the
  * preComplexTypeTransform ordering contract
  * (`RecordTransformerUtils.java:44-70`). */
class RecordEnrichersSpec extends SparkSpec {
  import spark.implicits._

  test("EnrichmentConfig JSON parses type, properties, and the pre flag") {
    val es = RecordEnrichers.parse("""[
      {"enricherType": "generateColumn",
       "properties": {"fieldToFunctionMap": {"b": "a + 1"}}},
      {"enricherType": "clpEnricher", "preComplexTypeTransform": true,
       "properties": {"fields": ["msg"]}}]""")
    assert(es.map(_.enricherType) == Seq("generateColumn", "clpEnricher"))
    assert(es.map(_.preComplexTypeTransform) == Seq(false, true))
    assert(es(1).properties.path("fields").get(0).asText == "msg")
  }

  test("generateColumn derives columns in fieldToFunctionMap order") {
    val df = Seq((2, 3)).toDF("a", "b")
    val out = RecordEnrichers.enrich(df, RecordEnrichers.parse(
      """{"enricherType": "generateColumn", "properties": {
           "fieldToFunctionMap": {"c": "a + b", "d": "c * 10"}}}""").head)
    // map order matters: d reads the c the same enricher just derived
    // (LinkedHashMap in CustomFunctionEnricherConfig)
    assert(out.select("c", "d").as[(Int, Int)].collect().head == ((5, 50)))
  }

  test("clpEnricher adds the triple, keeps the original, round-trips") {
    val df = Seq("INFO took 0.335 ms for user user123").toDF("message")
    val out = RecordEnrichers.enrich(df, RecordEnrichers.parse(
      """{"enricherType": "clpEnricher",
         "properties": {"fields": ["message"]}}""").head)
    assert(out.columns.toSeq == Seq("message", "message_logtype",
      "message_dictionaryVars", "message_encodedVars"))
    val r = out.select(ClpFunctions.clpDecode(col("message_logtype"),
      col("message_dictionaryVars"), col("message_encodedVars")))
      .as[String].collect().head
    assert(r == "INFO took 0.335 ms for user user123")
  }

  test("clpEnricher on a non-string field yields the null triple") {
    val df = Seq((7, "x")).toDF("n", "s")
    val out = RecordEnrichers.enrich(df, RecordEnrichers.parse(
      """{"enricherType": "clpEnricher", "properties": {"fields": ["n"]}}""")
      .head).collect().head
    assert(out.isNullAt(2) && out.isNullAt(3) && out.isNullAt(4))
  }

  test("unknown enricher type fails like the registry validation") {
    val df = Seq(1).toDF("a")
    val e = intercept[IllegalArgumentException] {
      RecordEnrichers.enrich(df, RecordEnrichers.parse(
        """{"enricherType": "nope", "properties": {}}""").head)
    }
    assert(e.getMessage.contains("No record enricher found"))
  }

  test("applyAll: pre enrichers see pre-flatten names, post see flattened") {
    val df = Seq((1, 2)).toDF("x", "y")
      .select(struct($"x", $"y").as("s"))
    val es = RecordEnrichers.parse("""[
      {"enricherType": "generateColumn", "preComplexTypeTransform": true,
       "properties": {"fieldToFunctionMap": {"preSum": "s.x + s.y"}}},
      {"enricherType": "generateColumn",
       "properties": {"fieldToFunctionMap": {"postSum": "`s.x` + `s.y`"}}}]""")
    val out = RecordEnrichers.applyAll(df, es,
      Some(BatchIngest.FlattenComplex()))
    // pre ran on the struct; flatten produced literal `s.x`/`s.y`
    // columns; post ran on those
    assert(out.columns.toSet == Set("s.x", "s.y", "preSum", "postSum"))
    assert(out.select("preSum", "postSum").as[(Int, Int)].collect().head ==
      ((3, 3)))
  }
}
