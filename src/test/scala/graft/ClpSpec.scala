package graft

import org.apache.spark.sql.functions._
import graft.functions.ClpFunctions

/** CLP log-column encode/decode/match (functions/ClpFunctions.scala). */
class ClpSpec extends SparkSpec {
  import spark.implicits._

  private val msgs = Seq(
    "INFO Task 12345 completed in 250 ms",
    "ERROR node-7 failed after 3 retries: code=0xdead",
    "plain message without variables",
    "negative -42 and huge 999999999999999999999 stay safe",
    // non-canonical renderings must stay dictionary vars or decode
    // would re-render the parsed long and break the round trip
    "padded -0000123 and 007 and -0 stay textual",
    "")

  test("clpEncode/clpDecode round-trips every message") {
    val df = msgs.toDF("msg")
      .withColumn("e", ClpFunctions.clpEncode($"msg"))
      .withColumn("back", ClpFunctions.clpDecode(
        $"e.logtype", $"e.dict_vars", $"e.encoded_vars"))
    assert(df.filter($"back" =!= $"msg").count() == 0)
  }

  test("variable classification: ints encoded, digit-tokens to dictionary") {
    val r = Seq("INFO Task 12345 done code=0xdead in 250 ms").toDF("msg")
      .select(ClpFunctions.clpEncode($"msg").as("e"))
      .select($"e.logtype", $"e.dict_vars", $"e.encoded_vars")
      .collect().head
    assert(r.getSeq[String](1) == Seq("code=0xdead"))
    assert(r.getSeq[Long](2) == Seq(12345L, 250L))
    // 19+ digit numbers overflow long: kept as dictionary vars
    val big = Seq("n 999999999999999999999").toDF("msg")
      .select(ClpFunctions.clpEncode($"msg").as("e"))
      .select($"e.dict_vars", $"e.encoded_vars").collect().head
    assert(big.getSeq[String](0) == Seq("999999999999999999999"))
    assert(big.getSeq[Long](1).isEmpty)
  }

  test("property: random messages round-trip and classify like the reference rules") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val token = Gen.oneOf(
      Gen.oneOf("INFO", "error", "done", "x", "", "-", "=", "a-b"),
      Gen.choose(-999999L, 999999L).map(_.toString),
      Gen.oneOf("999999999999999999999", "-000000000000000000123",
        "0xdead", "code=7", "3.14", "12:30:07", "v2", "2024-01-01"))
    val msgGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
    val msgs = (1 to 200).map(s =>
      msgGen.pureApply(Gen.Parameters.default, Seed(s.toLong)))

    // reference rules (CLPEncodingEnricher): int token = optional '-' +
    // 1..18 digits in CANONICAL rendering (no leading zeros, no "-0" —
    // the encoded form stores the parsed long, so only round-tripping
    // renderings may encode; real CLP applies the same check) ->
    // encoded var; any other token containing a digit -> dictionary
    // var; else stays in the logtype.
    def isInt(t: String): Boolean =
      t.matches("-?[0-9]{1,18}") &&
        java.lang.Long.parseLong(t).toString == t
    val expectDict = msgs.map(_.split(" ", -1).toSeq
      .filter(t => !isInt(t) && t.exists(_.isDigit)))
    val expectEnc = msgs.map(_.split(" ", -1).toSeq
      .filter(isInt).map(_.toLong))

    val rows = msgs.toDF("msg")
      .withColumn("e", ClpFunctions.clpEncode($"msg"))
      .select($"msg",
        ClpFunctions.clpDecode(
          $"e.logtype", $"e.dict_vars", $"e.encoded_vars").as("back"),
        $"e.dict_vars", $"e.encoded_vars")
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(1) == r.getString(0), s"round-trip case $i")
      assert(r.getSeq[String](2) == expectDict(i), s"dict case $i")
      assert(r.getSeq[Long](3) == expectEnc(i), s"enc case $i")
    }
  }

  test("SQL names clpencode/clpdecode/clpencodedvarsmatch resolve") {
    msgs.toDF("msg").createOrReplaceTempView("clp_in")
    val n = spark.sql(
      """SELECT count(*) AS n FROM (
           SELECT msg, clpencode(msg) AS e FROM clp_in)
         WHERE clpdecode(e.logtype, e.dict_vars, e.encoded_vars) = msg""")
      .collect().head.getLong(0)
    assert(n == msgs.size)
    val matched = spark.sql(
      """SELECT msg FROM (SELECT msg, clpencode(msg) AS e FROM clp_in)
         WHERE clpencodedvarsmatch(e.logtype, e.encoded_vars, '2*', 0)""")
      .collect().map(_.getString(0)).toSet
    // wildcard 2* matches an encoded var rendering starting with 2
    assert(matched == Set("INFO Task 12345 completed in 250 ms"))
  }

  test("clpMatch / clpDecode group rewrites (ClpRewriter analog)") {
    // column-group triple, as ClpLogIngest materializes it
    val grp = graft.sources.ClpLogIngest.extract(
      msgs.toDF("message"),
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("message")))
    grp.createOrReplaceTempView("clp_grp")
    def rows(sql: String): Set[String] =
      graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; $sql")
        .collect().map(_.getString(0)).toSet

    // clpDecode("group") sugar expands to the triple (1-arg + default)
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp") ==
      msgs.toSet)
    assert(rows("SELECT clpDecode(message, 'null') AS m FROM clp_grp") ==
      msgs.toSet)
    // clpMatch(group, wildcard): full-message wildcard semantics
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp" +
      " WHERE clpMatch(message, '*completed*')") ==
      Set("INFO Task 12345 completed in 250 ms"))
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp" +
      " WHERE clpMatch(message, 'ERROR*retries*')") ==
      Set("ERROR node-7 failed after 3 retries: code=0xdead"))
    // `?` = exactly one char; no-star query must match the WHOLE message
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp" +
      " WHERE clpMatch(message, 'plain message without variable?')") ==
      Set("plain message without variables"))
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp" +
      " WHERE clpMatch(message, 'completed')").isEmpty)
    // empty wildcard → logtype = '' (the empty message)
    assert(graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT count(*) AS n FROM clp_grp" +
        " WHERE clpMatch(message, '')").collect().head.getLong(0) == 1L)
    // the issue-10478 workaround shapes compose unchanged
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp" +
      " WHERE clpMatch(message, '*completed*') = true") ==
      Set("INFO Task 12345 completed in 250 ms"))
    assert(graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT count(*) AS n FROM clp_grp" +
        " WHERE NOT clpMatch(message, '*completed*') = true")
      .collect().head.getLong(0) == msgs.size - 1L)
    // explicit 4-arg triple form
    assert(rows("SELECT clpDecode(message) AS m FROM clp_grp" +
      " WHERE clpMatch(message_logtype, message_dictionaryVars," +
      " message_encodedVars, '*0xdead*')") ==
      Set("ERROR node-7 failed after 3 retries: code=0xdead"))
  }

  test("reserved placeholder bytes round-trip: bare-placeholder tokens become dict vars") {
    // a message token that IS the placeholder char would be misread
    // as a variable slot on decode — the encoder routes it to the
    // dictionary (real CLP escapes its reserved bytes similarly);
    // interior placeholder bytes are not whole-token and pass verbatim
    val tricky = Seq("x \u0011 y", "a\u0012b mid", "\u0012",
      "ok \u0011\u0011 end")
    val df = tricky.toDF("msg")
      .withColumn("e", ClpFunctions.clpEncode($"msg"))
      .withColumn("back", ClpFunctions.clpDecode(
        $"e.logtype", $"e.dict_vars", $"e.encoded_vars"))
    assert(df.filter($"back" =!= $"msg" || $"back".isNull).count() == 0)
  }

  test("entire-message anchoring: trailing newline is not ignored (ADVICE r12)") {
    // Java regex $ matches before a trailing line terminator; the
    // contract is byte-for-byte to the end, so 'foo' must NOT match
    // "foo\n" (and must still match itself)
    val df = Seq("foo", "foo\n", "foo\nbar").toDF("msg")
    val hit = df.filter(ClpFunctions.clpWildcardMatch($"msg", "foo"))
      .collect().map(_.getString(0)).toSeq
    assert(hit == Seq("foo"))
    // multi-line messages still match through * ((?s) dotall)
    val span = df.filter(ClpFunctions.clpWildcardMatch($"msg", "foo*bar"))
      .collect().map(_.getString(0)).toSeq
    assert(span == Seq("foo\nbar"))
  }
}
