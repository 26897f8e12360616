package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JsonShred

class JsonShredSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, """{"k": 10, "name": "alpha", "tags": {"env": "prod"}}"""),
    (2L, """{"k": 75, "name": "beta", "tags": {"env": "dev"}}"""),
    (3L, """{"k": 99, "name": "gamma"}"""),
    (4L, """{"name": "delta", "tags": {"env": "prod"}}"""))
    .toDF("id", "js")

  test("shredded ingest materializes typed path columns; JSON_MATCH targets them") {
    val out = Files.createTempDirectory("jshred").toString
    try {
      val shredded = JsonShred.ingestShredded(spark, docs, s"$out/t", "js",
        Seq("$.k" -> IntegerType, "$.tags.env" -> StringType))
      assert(shredded.columns.toSet ==
        Set("id", "js", "js__k", "js__tags_env"))
      // numeric comparison uses the typed column and pushes down
      val q = shredded.filter(JsonShred.jsonMatch(shredded, "js", "\"$.k\" >= 50"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("js__k")),
        s"shredded predicate not pushed:\n$plan")
      assert(q.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(2L, 3L))
      // string equality on a nested path
      val prod = shredded.filter(
        JsonShred.jsonMatch(shredded, "js", "\"$.tags.env\" = 'prod'"))
      assert(prod.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 4L))
      // AND / OR / parens / IS NULL compose
      val mix = shredded.filter(JsonShred.jsonMatch(shredded, "js",
        "(\"$.k\" >= 50 AND \"$.tags.env\" = 'dev') OR \"$.tags.env\" IS NULL"))
      assert(mix.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(2L, 3L))
    } finally JsonShred.clear()
  }

  test("unshredded paths fall back to string parsing with identical results") {
    val out = Files.createTempDirectory("jshred2").toString
    try {
      val shredded = JsonShred.ingestShredded(spark, docs, s"$out/t", "js",
        Seq("$.k" -> IntegerType))
      // $.name was NOT shredded: same rows via get_json_object fallback
      val byName = shredded.filter(
        JsonShred.jsonMatch(shredded, "js", "\"$.name\" = 'beta'"))
      assert(byName.select($"id").collect().map(_.getLong(0)).toSeq == Seq(2L))
      // an entirely unregistered frame also works (pure fallback)
      val plain = docs.filter(JsonShred.jsonMatch(docs, "js", "\"$.k\" < 50"))
      assert(plain.select($"id").collect().map(_.getLong(0)).toSeq == Seq(1L))
      // malformed predicates fail loudly
      intercept[IllegalArgumentException] {
        JsonShred.jsonMatch(docs, "js", "\"$.k\" >=")
      }
      intercept[IllegalArgumentException] {
        JsonShred.jsonMatch(docs, "js", "(\"$.k\" = 1")
      }
    } finally JsonShred.clear()
  }
}
