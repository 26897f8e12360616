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
