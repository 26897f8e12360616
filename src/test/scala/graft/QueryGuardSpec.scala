package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.sql.{BrokerResponse, HttpGateway, QueryFacade, QueryGuard}

/** Serving guardrails (round-13 verdict directives 1/4/6): enforced
  * `timeoutMs` → EXECUTION_TIMEOUT=250, live `DELETE /query/{id}`
  * cancellation → QUERY_CANCELLATION=503, `GET /queries` inventory,
  * response-size budget → SERVER_RESOURCE_LIMIT_EXCEEDED=245, scan
  * budget → QUERY_SCAN_LIMIT_EXCEEDED=246, RLS fail-closed →
  * ACCESS_DENIED=180 — the reference's `QueryErrorCode.java` classes
  * over the exceptions-as-data contract. */
class QueryGuardSpec extends SparkSpec {

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

  private def errCode(json: String): Option[Int] =
    """"errorCode":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)

  // per-row sleep keeps guarded work cancellable mid-task
  // (Thread.sleep answers the interruptOnCancel interrupt)
  private def registerSlowUdf(): Unit =
    spark.udf.register("guard_slow_ms",
      (x: Long, ms: Int) => { Thread.sleep(ms.toLong); x })

  test("timeoutMs is enforced: 250 in exceptions-as-data, pool stays live") {
    QueryFacade.init(spark, sf)
    registerSlowUdf()
    val gw = HttpGateway.start(spark, _ => spark.range(1).toDF(),
      brokerTimeoutMs = 60000L)
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      // ~6.4 s of work (4 tasks x 16 rows x 100 ms) against a 700 ms
      // per-query SET timeoutMs — the option, not the broker default
      val slow = "SET timeoutMs = 700; SELECT sum(guard_slow_ms(id, 100))" +
        " AS n FROM range(0, 64, 1, 4)"
      val t0 = System.nanoTime()
      val (c, body) = request(s"$base/query/sql", "POST",
        Some(s"""{"sql": "${slow.replace("\"", "\\\"")}"}"""))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(c == 200, body) // broker contract: errors are data
      assert(errCode(body).contains(250), body)
      assert(elapsedMs < 5000L,
        s"timeout did not stop the query (took $elapsedMs ms)")
      // the pool serves the next query immediately after
      val (c2, ok) = request(s"$base/query/sql", "POST",
        Some("""{"sql": "SELECT count(*) AS n FROM nation"}"""))
      assert(c2 == 200 && ok.contains("\"rows\":[[25]]"), ok)
    } finally gw.stop()
  }

  test("broker default timeout applies when no option is set") {
    QueryFacade.init(spark, sf)
    registerSlowUdf()
    val gw = HttpGateway.start(spark, _ => spark.range(1).toDF(),
      brokerTimeoutMs = 700L)
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val slow = "SELECT sum(guard_slow_ms(id, 100)) AS n" +
        " FROM range(0, 64, 1, 4)"
      val (c, body) = request(s"$base/query/sql", "POST",
        Some(s"""{"sql": "$slow"}"""))
      assert(c == 200 && errCode(body).contains(250), body)
    } finally gw.stop()
  }

  test("DELETE /query/{id} cancels mid-flight; GET /queries lists it") {
    QueryFacade.init(spark, sf)
    registerSlowUdf()
    val gw = HttpGateway.start(spark, _ => spark.range(1).toDF())
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      // fire the slow query from a background thread; it runs ~12.8 s
      // unguarded, well past every poll below
      val slow = "SET clientQueryId = 'spec-slow-1'; " +
        "SELECT sum(guard_slow_ms(id, 200)) AS n FROM range(0, 64, 1, 4)"
      @volatile var response: String = null
      val t = new Thread(() => response = request(s"$base/query/sql", "POST",
        Some(s"""{"sql": "${slow.replace("\"", "\\\"")}"}"""))._2)
      t.start()
      // poll the running-query inventory until it appears
      var listed: Option[(String, String)] = None
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (listed.isEmpty && System.nanoTime() < deadline) {
        val (_, qs) = request(s"$base/queries")
        listed = """"(\d+)":"([^"]*)"""".r.findFirstMatchIn(qs)
          .map(m => (m.group(1), m.group(2)))
        if (listed.isEmpty) Thread.sleep(50)
      }
      assert(listed.isDefined, "running query never appeared in /queries")
      val (reqId, qText) = listed.get
      assert(qText.contains("guard_slow_ms"), qText)
      // cancel by broker requestId (PinotClientRequest.cancelQuery)
      val (cc, cbody) = request(s"$base/query/$reqId", "DELETE")
      assert(cc == 200 && cbody == s"Cancelled query: $reqId", cbody)
      t.join(15000)
      assert(response != null, "cancelled query never returned")
      assert(errCode(response).contains(503), response)
      // once finished it is no longer cancellable -> 404; bad id -> 400
      val (nf, nfb) = request(s"$base/query/$reqId", "DELETE")
      assert(nf == 404 && nfb.contains("not found"), nfb)
      val (bad, badb) = request(s"$base/query/not-a-number", "DELETE")
      assert(bad == 400 && badb.contains("Invalid internal query id"), badb)
    } finally gw.stop()
  }

  test("DELETE /query/{clientQueryId}?client=true cancels by client id") {
    QueryFacade.init(spark, sf)
    registerSlowUdf()
    val gw = HttpGateway.start(spark, _ => spark.range(1).toDF())
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val slow = "SET clientQueryId = 'spec-slow-2'; " +
        "SELECT sum(guard_slow_ms(id, 200)) AS n FROM range(0, 64, 1, 4)"
      @volatile var response: String = null
      val t = new Thread(() => response = request(s"$base/query/sql", "POST",
        Some(s"""{"sql": "${slow.replace("\"", "\\\"")}"}"""))._2)
      t.start()
      var cancelled = false
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!cancelled && System.nanoTime() < deadline) {
        val (c, _) = request(s"$base/query/spec-slow-2?client=true", "DELETE")
        if (c == 200) cancelled = true else Thread.sleep(50)
      }
      assert(cancelled, "client-id cancel never found the query")
      t.join(15000)
      assert(response != null && errCode(response).contains(503), response)
      // unknown client id -> 404 (BaseBrokerRequestHandler:422 warn path)
      val (nf, _) = request(s"$base/query/no-such-client?client=true", "DELETE")
      assert(nf == 404)
    } finally gw.stop()
  }

  test("response-size budget aborts serialization with 245") {
    QueryFacade.init(spark, sf)
    val guard = new QueryGuard(spark)
    val over = BrokerResponse.execute(spark,
      "SET maxQueryResponseSizeBytes = 2000; SET explicitLimit = true; " +
        "SELECT * FROM lineitem",
      guard = Some(guard))
    assert(errCode(over).contains(245), over)
    assert(over.contains("cursor"), s"no pagination pointer: $over")
    // maxServerResponseSizeBytes is the same budget (one engine = one
    // server); the smaller of the two applies
    val over2 = BrokerResponse.execute(spark,
      "SET maxServerResponseSizeBytes = 2000; SET explicitLimit = true; " +
        "SELECT * FROM lineitem",
      guard = Some(guard))
    assert(errCode(over2).contains(245), over2)
    // under the cap, the streamed serialization matches the default
    // path byte-for-byte
    val sql = "SELECT n_regionkey, count(*) AS n FROM nation " +
      "GROUP BY n_regionkey ORDER BY n_regionkey"
    def normalize(js: String): String =
      js.replaceAll("\"timeUsedMs\":\\d+", "\"timeUsedMs\":0")
    val capped = BrokerResponse.execute(spark,
      s"SET maxQueryResponseSizeBytes = 10000000; $sql", guard = Some(guard))
    val plain = BrokerResponse.execute(spark, sql)
    assert(normalize(capped) == normalize(plain),
      s"capped path diverged:\n$capped\n$plain")
  }

  test("scan budget kills the query with 246") {
    QueryFacade.init(spark, sf)
    registerSlowUdf()
    // a multi-task parquet table: tasks report recordsRead, the
    // listener accumulates per job group, the budget cancels the group
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scan_budget").toString
    spark.range(0, 3200, 1, 16).selectExpr("id AS v")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("scan_budget_t")
    val guard = new QueryGuard(spark)
    val out = BrokerResponse.execute(spark,
      "SET maxDocsScanned = 50; " +
        "SELECT sum(guard_slow_ms(v, 2)) AS s FROM scan_budget_t",
      guard = Some(guard))
    assert(errCode(out).contains(246), out)
    assert(out.contains("scan budget"), out)
    // without the option the same query completes exactly
    val ok = BrokerResponse.execute(spark,
      "SELECT count(*) AS n FROM scan_budget_t", guard = Some(guard))
    assert(ok.contains("\"rows\":[[3200]]"), ok)
  }

  test("cursor queries are guarded too: store-materialization timeout is 250") {
    QueryFacade.init(spark, sf)
    registerSlowUdf()
    val gw = HttpGateway.start(spark, _ => spark.range(1).toDF())
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val slow = "SET timeoutMs = 700; SELECT sum(guard_slow_ms(id, 100))" +
        " AS n FROM range(0, 64, 1, 4)"
      val (c, body) = request(s"$base/query/sql?getCursor=true&numRows=5",
        "POST", Some(s"""{"sql": "${slow.replace("\"", "\\\"")}"}"""))
      assert(c == 200 && errCode(body).contains(250), body)
    } finally gw.stop()
  }

  test("RLS fail-closed rejection classifies as ACCESS_DENIED=180") {
    QueryFacade.init(spark, sf)
    // a COMMA-JOIN reference the rewriter cannot anchor (it wraps
    // only FROM/JOIN-prefixed references) while the parser says the
    // table IS read fails closed (QueryFacade.applyRlsFilters) ->
    // SecurityException -> 180
    val out = BrokerResponse.execute(spark,
      "SET rlsFilters-nation = 'n_regionkey = 1'; " +
        "SELECT * FROM region, nation")
    assert(errCode(out).contains(180), out)
    assert(out.contains("fail closed"), out)
  }
}
