package graft

import org.apache.spark.sql.functions._

import graft.functions.TextMatch

/** TEXT_MATCH query-language coverage: terms, phrases, wildcards
  * (incl. inside phrases), fuzzy, proximity, parens grouping. */
class TextMatchSpec extends SparkSpec {

  private def matches(text: String, query: String): Boolean = {
    import spark.implicits._
    Seq(text).toDF("t")
      .filter(TextMatch.textMatch(col("t"), query))
      .count() == 1
  }

  test("grouping parens override AND/OR precedence") {
    val t = "alpha beta gamma"
    // without parens: alpha OR (beta AND delta) -> true via alpha
    assert(matches(t, "alpha OR beta AND delta"))
    // with parens: (alpha OR beta) AND delta -> false
    assert(!matches(t, "(alpha OR beta) AND delta"))
    assert(matches(t, "(alpha OR delta) AND (gamma OR epsilon)"))
    // nested groups
    assert(matches(t, "((alpha AND beta) OR delta) AND gamma"))
  }

  test("wildcard terms: prefix, mid-token star, single-char ?") {
    val t = "streaming window aggregate"
    assert(matches(t, "stream*"))
    assert(matches(t, "str*ing"))
    assert(matches(t, "wind?w"))
    assert(!matches(t, "wind?ww"))
    assert(!matches(t, "str*ingx"))
    // wildcard matches within ONE token only
    assert(!matches(t, "streaming*window"))
  }

  test("wildcard inside a phrase matches adjacent tokens") {
    val t = "the big data pipeline runs"
    assert(matches(t, "\"big da*\""))
    assert(matches(t, "\"da* pipeline\""))
    assert(matches(t, "\"big d?ta pipeline\""))
    // adjacency required: big ... pipeline are not adjacent
    assert(!matches(t, "\"big pipe*\""))
    // ordered: pipeline before data never occurs
    assert(!matches(t, "\"pipel* data\""))
  }

  test("phrase-with-wildcard composes with groups and fuzzy") {
    val t = "query scan over big table"
    assert(matches(t, "(\"big tab*\" OR missing) AND qery~1"))
    assert(!matches(t, "(\"big tab*\" AND missing) OR qeryz~1"))
  }

  test("unbalanced parens are rejected") {
    intercept[IllegalArgumentException] {
      matches("x", "(alpha OR beta")
    }
  }
}
