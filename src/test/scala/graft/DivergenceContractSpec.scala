package graft

import org.apache.spark.sql.functions._

/** Round-13 directive #5: the PLANS.md-documented DELIBERATE
  * divergences from the reference lived in prose only — this spec
  * asserts graft's CHOSEN behavior for each one, pinning them against
  * silent drift, and adds BrokerResponse error-class parity for the
  * common failure classes. Each case cites where the divergence (or
  * contract) was adjudicated.
  *
  * Divergences (reference behavior → graft behavior, by design):
  *  - factorial(n>20): ArithmeticFunctions.factorial throws long
  *    overflow upstream → graft yields NULL (PLANS.md wave 7).
  *  - widthBucket with NaN bounds: upstream throws → graft yields
  *    NULL (PLANS.md wave 7).
  *  - CLP float-looking tokens: the reference packs them into its
  *    digit-preserving float encoding → graft stores them as
  *    DICTIONARY vars, losslessly (ClpFunctions.scala header note).
  *  - exprMin/exprMax mixed with OTHER aggregations in one select:
  *    the reference returns tie ROWS via its parent-aggregation
  *    rewriter → graft keeps the single-row min_by/max_by fallback
  *    (PLANS.md round-9 exprMinMax adjudication).
  * Contracts that look like divergences but are parity (pinned so a
  * refactor can't un-fix them):
  *  - jsonPath{Long,Double} NO-DEFAULT misses return the reference's
  *    TYPE defaults (Long.MIN_VALUE / NaN), not SQL NULL
  *    (JsonFunctionsTest.java:92-98; PLANS.md wave 10).
  *  - jsonExtractScalar 'null' default degrades to the type's ZERO
  *    with null handling DISABLED, stays SQL NULL with it enabled
  *    (JsonExtractScalarTransformFunction.java:202-208).
  *  - uniqueNgrams with minGram > length is EMPTY; hexDecimalToLong
  *    accepts the 0x prefix (PLANS.md wave 7 fixes).
  *  - Pinot DIV is DOUBLE division: div-by-zero is ±Infinity DATA
  *    under both null modes, never an error
  *    (ArithmeticFunctions.divide).
  */
class DivergenceContractSpec extends SparkSpec {
  import spark.implicits._

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(sql).collect().head

  test("factorial: exact through 20, NULL past the long range (ref throws)") {
    val r = one("SELECT factorial(0) a, factorial(5) b, factorial(20) c," +
      " factorial(21) d")
    assert(r.getLong(0) == 1L && r.getLong(1) == 120L &&
      r.getLong(2) == 2432902008176640000L)
    assert(r.isNullAt(3), "factorial(21) must be NULL, not an error")
  }

  test("widthBucket: NaN bounds yield NULL (ref throws)") {
    val ok = one("SELECT widthBucket(5.0, 0.0, 10.0, 5) a," +
      " widthBucket(11.0, 0.0, 10.0, 5) b")
    assert(ok.getLong(0) == 3L && ok.getLong(1) == 6L)
    val nan = one(
      "SELECT widthBucket(5.0, double('NaN'), 10.0, 5) a," +
        " widthBucket(double('NaN'), 0.0, 10.0, 5) b")
    assert(nan.isNullAt(0) && nan.isNullAt(1),
      "NaN widthBucket must be NULL, not an error")
  }

  test("CLP float-looking tokens stay dictionary vars, losslessly") {
    val enc = Seq("pi is 3.14 exactly", "v 2.5e3 sci", "neg -0.5 ok")
      .toDF("msg")
      .select(graft.functions.ClpFunctions.clpEncode($"msg").as("e"), $"msg")
      .select($"e.logtype", $"e.dict_vars", $"e.encoded_vars",
        graft.functions.ClpFunctions.clpDecode(
          $"e.logtype", $"e.dict_vars", $"e.encoded_vars").as("back"), $"msg")
      .collect()
    for (r <- enc) {
      assert(r.getSeq[Long](2).isEmpty,
        s"float-looking tokens must not int-encode: ${r.getString(4)}")
      assert(r.getString(3) == r.getString(4), "lossless round trip")
    }
    assert(enc(0).getSeq[String](1) == Seq("3.14"))
    assert(enc(1).getSeq[String](1) == Seq("2.5e3"))
    assert(enc(2).getSeq[String](1) == Seq("-0.5"))
  }

  test("exprMin tie rows survive mixing with another aggregation") {
    // PLANS.md round-9 documented a single-row min_by fallback for
    // mixed-aggregation selects; the round-10/11 per-query-block
    // anchoring closed that divergence — this pins the CURRENT
    // (reference-matching) contract: tie rows return, and sibling
    // aggregates are padded onto every tie row (the reference's
    // ParentAggregationResultRewriter presentation).
    graft.sql.QueryFacade.init(spark, sf)
    Seq(("g", 1L, 10L), ("g", 1L, 20L), ("g", 2L, 30L))
      .toDF("grp", "m", "v").createOrReplaceTempView("dvg_exprmin")
    val tieRows = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT exprMin(v, m) FROM dvg_exprmin")
    assert(tieRows.count() == 2L, "single-call exprMin must return tie rows")
    val mixed = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT exprMin(v, m) AS emin, SUM(v) AS sv" +
        " FROM dvg_exprmin").collect()
    assert(mixed.length == 2, "mixed-aggregation exprMin keeps tie rows")
    assert(mixed.map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L))
    assert(mixed.forall(_.getLong(1) == 60L),
      "sibling aggregate padded onto every tie row")
  }

  test("jsonPath numeric no-default misses return TYPE defaults, not NULL") {
    val r = one("""SELECT jsonPathLong('{"a":1}', '$.miss') a,
        jsonPathDouble('{"a":1}', '$.miss') b,
        jsonPathString('{"a":1}', '$.miss') c,
        jsonPathExists('{"a":1}', '$.miss') d,
        jsonPathLong('{"a":7}', '$.a') e""")
    assert(r.getLong(0) == Long.MinValue, "jsonPathLong miss -> Long.MIN_VALUE")
    assert(r.getDouble(1).isNaN, "jsonPathDouble miss -> NaN")
    assert(r.isNullAt(2), "jsonPathString miss -> NULL")
    assert(!r.getBoolean(3))
    assert(r.getLong(4) == 7L)
  }

  test("jsonExtractScalar null default: type zero OFF, SQL NULL ON") {
    graft.sql.QueryFacade.init(spark, sf)
    Seq("""{"a":5}""").toDF("js").createOrReplaceTempView("dvg_jes")
    val off = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT jsonExtractScalar(js, '$.miss'," +
        " 'long', null) AS v FROM dvg_jes").collect().head
    assert(!off.isNullAt(0) && off.getLong(0) == 0L,
      "null default degrades to the type ZERO with null handling off")
    val on = graft.sql.QueryFacade.sql(spark,
      "SET enableNullHandling = true; SET explicitLimit = true;" +
        " SELECT jsonExtractScalar(js, '$.miss', 'long', null) AS v" +
        " FROM dvg_jes").collect().head
    assert(on.isNullAt(0), "null default stays SQL NULL with null handling on")
  }

  test("uniqueNgrams empty past length; hexDecimalToLong takes 0x") {
    val r = one("SELECT uniqueNgrams('a', 2, 3) a," +
      " hexDecimalToLong('0xff') b, hexDecimalToLong('ff') c")
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getLong(1) == 255L && r.getLong(2) == 255L)
  }

  test("Pinot DIV by zero is Infinity DATA under both null modes") {
    graft.sql.QueryFacade.init(spark, sf)
    Seq((1.0, 0.0)).toDF("a", "b").createOrReplaceTempView("dvg_div")
    for (mode <- Seq("", "SET enableNullHandling = true; ")) {
      val r = graft.sql.QueryFacade.sql(spark,
        s"${mode}SET explicitLimit = true;" +
          " SELECT DIV(a, b) AS q, DIV(-a, b) AS qn FROM dvg_div")
        .collect().head
      assert(r.getDouble(0).isPosInfinity && r.getDouble(1).isNegInfinity,
        s"DIV(x, 0) must be ±Infinity data (mode '$mode')")
    }
  }

  test("BrokerResponse error classes match QueryErrorCode") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper
    graft.sql.QueryFacade.init(spark, sf)
    def errOf(sql: String): (Int, String) = {
      val resp = graft.sql.BrokerResponse.execute(spark, sql)
      val n = mapper.readTree(resp)
      val ex = n.path("exceptions")
      assert(ex.size == 1, s"expected one exceptions entry: $resp")
      (ex.get(0).path("errorCode").asInt, ex.get(0).path("message").asText)
    }
    // SQL_PARSING = 150
    assert(errOf("SELEKT 1 FRUM x")._1 == 150)
    // UNKNOWN_COLUMN = 710
    assert(errOf("SELECT no_such_col FROM nation")._1 == 710)
    // TABLE_DOES_NOT_EXIST = 190
    assert(errOf("SELECT 1 FROM table_that_is_not_there")._1 == 190)
    // QUERY_EXECUTION = 200 catch-all for runtime failures
    val (code, msg) = errOf("SELECT raise_error('boom')")
    assert(code == 200 && msg.contains("boom"))
    // and a healthy query reports an EMPTY exceptions array
    val ok = mapper.readTree(graft.sql.BrokerResponse.execute(spark,
      "SELECT n_name FROM nation LIMIT 1"))
    assert(ok.path("exceptions").size == 0)
    assert(ok.path("numRowsResultSet").asInt == 1)
  }
}
