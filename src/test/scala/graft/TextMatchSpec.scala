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

  test("Lucene classic-parser occur rules: flat clauses, not precedence") {
    val t = "alpha beta gamma"
    // `alpha OR beta AND delta` is ONE BooleanQuery: AND promotes beta
    // to MUST and makes delta MUST; alpha stays SHOULD (score-only
    // once a MUST exists). Match = beta AND delta — delta is absent,
    // so NO match (a precedence grammar would match via alpha).
    assert(!matches(t, "alpha OR beta AND delta"))
    assert(matches("beta delta other", "alpha OR beta AND delta"))
    // parens make a sub-level: (alpha OR beta) AND delta
    assert(!matches(t, "(alpha OR beta) AND delta"))
    assert(matches("alpha delta", "(alpha OR beta) AND delta"))
    assert(matches(t, "(alpha OR delta) AND (gamma OR epsilon)"))
    // nested groups
    assert(matches(t, "((alpha AND beta) OR delta) AND gamma"))
    // OR'd NOT is MUST_NOT: `x OR NOT y` = x AND NOT y
    assert(matches("xx zz", "xx OR NOT yy"))
    assert(!matches("xx yy", "xx OR NOT yy"))
    assert(!matches("zz", "xx OR NOT yy"))
    // an all-MUST_NOT query matches NOTHING (pure-negative
    // BooleanQuery), not the complement
    assert(!matches("zz", "NOT xx"))
    assert(!matches("xx", "NOT xx"))
    assert(!matches("zz", "NOT xx NOT yy"))
    // adjacency-joined NOT still subtracts: art NOT fox
    assert(matches("art gallery", "art NOT fox"))
    assert(!matches("art fox", "art NOT fox"))
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
