package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

import graft.sql.{BrokerResponse, HttpGateway, TimeSeriesEndpoint}

/** The HTTP front door carries the assemblers' JSON verbatim over a
  * real socket: responses are byte-compared against direct
  * [[BrokerResponse]]/[[TimeSeriesEndpoint]] calls (only the
  * run-variant fields — timeUsedMs, requestId — are normalized). */
class HttpGatewaySpec extends SparkSpec {

  private lazy val metrics: DataFrame = {
    import spark.implicits._
    Seq(("a", 0L, 10.0), ("a", 10L, 30.0), ("b", 0L, 5.0))
      .toDF("host", "t", "v")
  }

  private def request(url: String, method: String = "GET",
      body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(b.getBytes(UTF_8)) finally os.close()
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = try new String(is.readAllBytes(), UTF_8) finally is.close()
    conn.disconnect()
    (code, text)
  }

  private def normalize(json: String): String = json
    .replaceAll("\"timeUsedMs\":\\d+", "\"timeUsedMs\":0")
    .replaceAll("\"requestId\":\"\\d+\"", "\"requestId\":\"0\"")

  test("POST and GET /query/sql return the BrokerResponse JSON verbatim") {
    graft.sql.QueryFacade.init(spark, sf)
    val gw = HttpGateway.start(spark, _ => metrics)
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val sql = "SELECT n_regionkey, count(*) AS n FROM nation " +
        "GROUP BY n_regionkey ORDER BY n_regionkey"
      val direct = normalize(BrokerResponse.execute(spark, sql))
      val (pc, posted) = request(s"$base/query/sql", "POST",
        Some(s"""{"sql": ${escape(sql)}}"""))
      assert(pc == 200)
      assert(normalize(posted) == direct,
        s"POST body diverged:\n${normalize(posted)}\n$direct")
      // GET form: sql as a query parameter
      // (PinotClientRequest.processSqlQueryGet)
      val enc = java.net.URLEncoder.encode(sql, UTF_8)
      val (gc, got) = request(s"$base/query/sql?sql=$enc")
      assert(gc == 200 && normalize(got) == direct)
      // request ids increment per request
      assert(normalize(posted) != posted, "expected a requestId")
      // a query ERROR still answers 200 with the exceptions payload
      val (ec, err) = request(s"$base/query/sql", "POST",
        Some("""{"sql": "SELECT FROM nowhere"}"""))
      assert(ec == 200 && err.contains("\"errorCode\":200"))
      // missing 'sql' field → 400 with the reference's message
      val (mc, missing) = request(s"$base/query/sql", "POST",
        Some("""{"query": "SELECT 1"}"""))
      assert(mc == 400 &&
        missing.contains("missing the query string field 'sql'"))
    } finally gw.stop()
  }

  test("GET /timeseries/api/v1/query_range carries the endpoint JSON") {
    val gw = HttpGateway.start(spark, _ => metrics)
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val q = """fetch{table="m", ts_column="t", ts_unit="SECONDS", value="v"} | sum{host}"""
      val params = Map("query" -> q, "start" -> "0", "end" -> "19",
        "step" -> "10")
      val direct = TimeSeriesEndpoint.queryRange(_ => metrics, params)
      val qs = params.map { case (k, v) =>
        s"$k=${java.net.URLEncoder.encode(v, UTF_8)}" }.mkString("&")
      val (c, body) = request(s"$base/timeseries/api/v1/query_range?$qs")
      assert(c == 200)
      assert(body == direct, s"query_range diverged:\n$body\n$direct")
      assert(body.contains("\"resultType\":\"matrix\""))
      // endpoint-level errors ride the payload at HTTP 200
      // (TimeSeriesRequestHandler maps them into the response)
      val (e, errBody) = request(
        s"$base/timeseries/api/v1/query_range?start=0&end=19&step=10")
      assert(e == 200 && errBody.contains("Query cannot be null"))
    } finally gw.stop()
  }

  test("sql field extraction handles escapes and rejects malformed bodies") {
    import HttpGateway.extractSqlField
    assert(extractSqlField("""{"sql": "SELECT 'a''b'"}""")
      .contains("SELECT 'a''b'"))
    assert(extractSqlField("""{"sql":"a\"b\\c\nd\u0041"}""")
      .contains("a\"b\\c\ndA"))
    assert(extractSqlField("""{"other": 1, "sql" : "x"}""").contains("x"))
    assert(extractSqlField("""{"nosql": "x"}""").isEmpty)
    assert(extractSqlField("""{"sql": 5}""").isEmpty)
    assert(extractSqlField("""{"sql": "unterminated""").isEmpty)
  }

  private def escape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
