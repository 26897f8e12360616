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
    // 1..18 digits -> encoded var; any other token containing a digit
    // -> dictionary var; else stays in the logtype.
    def isInt(t: String): Boolean =
      t.matches("-?[0-9]{1,18}")
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
}
