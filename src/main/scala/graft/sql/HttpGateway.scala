package graft.sql

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP front door over the broker-response assemblers — the
  * reference's client entry points re-expressed on the JDK server (the
  * Kafka stack already proves the repo's protocol-server muscle; HTTP
  * needs no hand-rolled framing):
  *
  *   POST /query/sql       body {"sql": "..."}  →
  *   GET  /query/sql?sql=…                      →  [[BrokerResponse]]
  *     (`pinot-broker/.../api/resources/PinotClientRequest.java:141-222`
  *      — the GET form takes `sql` as a query parameter, the POST form
  *      requires the JSON field `sql` and answers 400 with "Payload is
  *      missing the query string field 'sql'" otherwise)
  *   GET  /timeseries/api/v1/query_range?query=…&start=…&end=…&step=…
  *                                              →  [[TimeSeriesEndpoint]]
  *     (`TimeSeriesRequestHandler.java:226-248`; the endpoint assembles
  *      the Prometheus matrix shape, including its own error statuses,
  *      so every outcome is HTTP 200 with a status field — matching the
  *      reference handler, which maps query errors into the payload)
  *
  * Responses are EXACTLY the assemblers' JSON — the gateway adds
  * transport, never content. Queries execute on the caller-provided
  * SparkSession; concurrency rides Spark's own scheduler (the FAIR
  * QPS probe covers the engine side).
  */
object HttpGateway {

  final case class Gateway(server: HttpServer, port: Int,
      requestIds: AtomicLong) {
    def stop(): Unit = {
      server.stop(0)
      // the transport pool's threads are non-daemon — shut them down so
      // a session that starts/stops gateways doesn't accrete threads
      server.getExecutor match {
        case es: java.util.concurrent.ExecutorService => es.shutdown()
        case _ =>
      }
    }
  }

  /** Minimal JSON string-field extractor for `{"sql": "..."}` bodies:
    * finds the top-level `"sql"` key and decodes the JSON string that
    * follows (escapes incl. \uXXXX). None when absent or malformed —
    * the 400 path. */
  private[graft] def extractSqlField(body: String): Option[String] = {
    val key = "\"sql\""
    var i = body.indexOf(key)
    while (i >= 0) {
      var j = i + key.length
      while (j < body.length && body.charAt(j).isWhitespace) j += 1
      if (j < body.length && body.charAt(j) == ':') {
        j += 1
        while (j < body.length && body.charAt(j).isWhitespace) j += 1
        if (j < body.length && body.charAt(j) == '"')
          return decodeJsonString(body, j)
      }
      i = body.indexOf(key, i + 1)
    }
    None
  }

  private def decodeJsonString(s: String, open: Int): Option[String] = {
    val sb = new StringBuilder
    var i = open + 1
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => return Some(sb.toString)
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' if i + 5 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16)
                .toChar)
              i += 6
            case c => sb.append(c); i += 2
          }
        case c => sb.append(c); i += 1
      }
    }
    None // unterminated
  }

  private[sql] def parseQueryParams(rawQuery: String): Map[String, String] =
    Option(rawQuery).filter(_.nonEmpty).map {
      _.split("&").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(
            java.net.URLDecoder.decode(k, UTF_8) ->
              java.net.URLDecoder.decode(v, UTF_8))
          case Array(k) =>
            Some(java.net.URLDecoder.decode(k, UTF_8) -> "")
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** Start the gateway on `port` (0 = ephemeral; read the bound port
    * from the returned [[Gateway]]). `resolve` is the time-series
    * table resolver (the broker's table-resolution role). */
  def start(spark: SparkSession, resolve: String => DataFrame,
      port: Int = 0): Gateway = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val ids = new AtomicLong(0L)

    server.createContext("/query/sql", (ex: HttpExchange) => {
      try {
        val sql = ex.getRequestMethod.toUpperCase match {
          case "GET" => parseQueryParams(ex.getRequestURI.getRawQuery)
            .get("sql")
          case _ => extractSqlField(readBody(ex))
        }
        sql match {
          case None => respond(ex, 400,
            """{"error": "Payload is missing the query string field 'sql'"}""")
          case Some(q) => respond(ex, 200,
            BrokerResponse.execute(spark, q,
              requestId = ids.incrementAndGet()))
        }
      } catch { case scala.util.control.NonFatal(e) =>
        respond(ex, 500, s"""{"error": ${jsonStr(e)}}""")
      }
    })

    server.createContext("/timeseries/api/v1/query_range",
      (ex: HttpExchange) => {
        try {
          respond(ex, 200, TimeSeriesEndpoint.queryRange(resolve,
            parseQueryParams(ex.getRequestURI.getRawQuery)))
        } catch { case scala.util.control.NonFatal(e) =>
          respond(ex, 500, s"""{"error": ${jsonStr(e)}}""")
        }
      })

    // small worker pool: transport threads only — Spark parallelizes
    // the queries themselves
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    Gateway(server, server.getAddress.getPort, ids)
  }

  private def jsonStr(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
    "\"" + m.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
  }
}
