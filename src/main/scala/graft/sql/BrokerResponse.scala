package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** BrokerResponse-shaped JSON result layer — the serving surface of
  * the reference's broker (`PinotClientRequest.java:144` →
  * `BrokerResponseNative.java`): query results travel as
  *
  * {{{
  * { "resultTable": { "dataSchema": { "columnNames": [...],
  *                                    "columnDataTypes": [...] },
  *                    "rows": [[...], ...] },
  *   "numRowsResultSet": N, "exceptions": [...], "timeUsedMs": ...,
  *   "requestId": ..., "brokerId": ..., "numDocsScanned": N,
  *   "totalDocs": N, "numServersQueried": 1, ... }
  * }}}
  *
  * with the field names and nesting of `@JsonPropertyOrder` on
  * `BrokerResponseNative` / `ResultTable` / `DataSchema`. Errors
  * surface as `exceptions: [{errorCode, message}]` with HTTP-200
  * semantics (`QueryProcessingException`), never as a transport
  * failure. Cursor pages reuse [[ResponseStore]] and add the
  * `CursorResponseNative` fields (offset, numRows, cursor
  * expiration).
  *
  * Stats mapping: `numDocsScanned` sums the leaf scan operators'
  * `numOutputRows` metric from the executed plan (docs surviving the
  * pushed filters — the reference's post-filter scan count);
  * `totalDocs` is unknown to a Spark plan and reported as -1, the
  * reference's own "not applicable" marker.
  */
object BrokerResponse {

  /** Pinot `DataSchema.ColumnDataType` name for a Spark type. */
  def columnDataType(dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType => "INT"
    case LongType => "LONG"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case _: DecimalType => "BIG_DECIMAL"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "TIMESTAMP"
    case StringType => "STRING"
    case BinaryType => "BYTES"
    case ArrayType(e, _) => columnDataType(e) + "_ARRAY"
    case _ => "JSON"
  }

  private def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One result cell, Pinot JSON conventions: numbers bare, BYTES as
    * a hex string, timestamps as their SQL string form, arrays
    * nested, null as null. */
  private def jCell(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => jStr(b.map("%02x".format(_)).mkString)
    case s: String => jStr(s)
    case t: java.sql.Timestamp => jStr(t.toString)
    case t: java.time.LocalDateTime => jStr(t.toString.replace('T', ' '))
    case d: java.sql.Date => jStr(d.toString)
    case b: Boolean => b.toString
    case d: Double if d.isNaN || d.isInfinite => jStr(d.toString)
    case f: Float if f.isNaN || f.isInfinite => jStr(f.toString)
    case n: java.math.BigDecimal => n.toPlainString
    case n: scala.math.BigDecimal => n.bigDecimal.toPlainString
    case seq: scala.collection.Seq[_] => seq.map(jCell).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => jStr(String.valueOf(k)) + ":" + jCell(x) }
        .mkString("{", ",", "}")
    case r: Row => r.toSeq.map(jCell).mkString("[", ",", "]")
    case other => other.toString
  }

  private def resultTableJson(schema: StructType, rows: Seq[Row]): String = {
    val names = schema.fields.map(f => jStr(f.name)).mkString("[", ",", "]")
    val types = schema.fields.map(f => jStr(columnDataType(f.dataType)))
      .mkString("[", ",", "]")
    val body = rows.map(r => r.toSeq.map(jCell).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    s"""{"dataSchema":{"columnNames":$names,"columnDataTypes":$types},""" +
      s""""rows":$body}"""
  }

  /** Sum of the executed plan's leaf-scan output rows — the
    * numDocsScanned analog (docs surviving pushed filters). */
  private def docsScanned(df: DataFrame): Long =
    try {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      // AQE wraps materialized stages as leaves (QueryStageExec), so a
      // plain collect() never reaches the scans — descend explicitly
      def scans(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scans(r.child)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    } catch { case _: Throwable => -1L }

  /** Execute `query` through the facade and assemble the broker
    * response JSON. Query failures become `exceptions` entries (the
    * broker's HTTP-200 error contract), not thrown errors.
    *
    * With a [[QueryGuard]], the serving guardrails apply: the
    * `timeoutMs` SET option (else the guard's broker default) is
    * ENFORCED via job-group cancellation (`EXECUTION_TIMEOUT` = 250),
    * `clientQueryId` registers the query for `DELETE /query/{id}
    * ?client=true`, and `maxDocsScanned` bounds the scan
    * (`QUERY_SCAN_LIMIT_EXCEEDED` = 246, the reference's
    * `accounting.scan.based.killing.maxDocsScanned` made per-query).
    * `maxQueryResponseSizeBytes` / `maxServerResponseSizeBytes`
    * (one engine = one server, so the smaller of the two applies)
    * cap the serialized result: rows stream through
    * `toLocalIterator` and serialization ABORTS at the cap
    * (`SERVER_RESOURCE_LIMIT_EXCEEDED` = 245) instead of
    * materializing an unbounded payload — unlike `numGroupsLimit`,
    * which stays an exact-results no-op by design (SURVEY §2.4),
    * these are hard budgets. */
  def execute(spark: SparkSession, query: String,
      requestId: Long = 1L, brokerId: String = "graft-broker",
      guard: Option[QueryGuard] = None): String = {
    val t0 = System.nanoTime()
    try {
      val opts = QueryFacade.parseOptions(query).options
      val timeoutMs = opts.get("timeoutms").flatMap(_.toLongOption)
        .getOrElse(0L)
      val clientId = opts.get("clientqueryid").filter(_.nonEmpty)
      val maxScan = opts.get("maxdocsscanned").flatMap(_.toLongOption)
        .getOrElse(0L)
      val sizeCap = Seq("maxqueryresponsesizebytes",
        "maxserverresponsesizebytes")
        .flatMap(k => opts.get(k).flatMap(_.toLongOption).filter(_ > 0))
        .reduceOption(_ min _).getOrElse(0L)
      def run[T](body: => T): T = guard match {
        case Some(g) =>
          g.guarded(requestId, query, timeoutMs, clientId, maxScan)(body)
        case None => body
      }
      run {
        val df = QueryFacade.sql(spark, query)
        if (sizeCap > 0) {
          val (rowsJson, n) = serializeCapped(df, sizeCap)
          val ms = (System.nanoTime() - t0) / 1000000L
          assembleRaw(df.schema, rowsJson, n, docsScanned(df), ms,
            requestId, brokerId)
        } else {
          val rows = df.collect().toSeq
          val ms = (System.nanoTime() - t0) / 1000000L
          assemble(df.schema, rows, docsScanned(df), ms, requestId, brokerId)
        }
      }
    } catch {
      case e: Throwable =>
        val ms = (System.nanoTime() - t0) / 1000000L
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        s"""{"resultTable":null,"numRowsResultSet":0,""" +
          s""""exceptions":[{"errorCode":${errorCode(e)},"message":${jStr(msg.take(500))}}],""" +
          s""""timeUsedMs":$ms,"requestId":"$requestId",""" +
          s""""brokerId":${jStr(brokerId)},"numDocsScanned":0,""" +
          s""""totalDocs":-1,"numServersQueried":1,"numServersResponded":1}"""
    }
  }

  /** Map failures to the reference's `QueryErrorCode` classes
    * (`pinot-spi/.../exception/QueryErrorCode.java`): SQL_PARSING=150,
    * ACCESS_DENIED=180 (the facade's fail-closed RLS rejection),
    * TABLE_DOES_NOT_EXIST=190, SERVER_RESOURCE_LIMIT_EXCEEDED=245
    * (response-size budget), QUERY_SCAN_LIMIT_EXCEEDED=246 (scan
    * budget), EXECUTION_TIMEOUT=250, QUERY_CANCELLATION=503,
    * UNKNOWN_COLUMN=710, and the QUERY_EXECUTION=200 catch-all — the
    * error classes a client actually branches on
    * (DivergenceContractSpec pins them). */
  private[graft] def errorCode(e: Throwable): Int = e match {
    case _: org.apache.spark.sql.catalyst.parser.ParseException => 150
    case _: SecurityException => 180
    case _: QueryGuard.ResponseSizeExceededException => 245
    case _: QueryGuard.ScanLimitExceededException => 246
    case _: QueryGuard.ExecutionTimeoutException => 250
    case _: QueryGuard.QueryCancelledException => 503
    case a: org.apache.spark.sql.AnalysisException =>
      a.errorClass match {
        case Some(c) if c.startsWith("UNRESOLVED_COLUMN") ||
          c.startsWith("UNRESOLVED_FIELD") => 710
        case Some(c) if c.startsWith("TABLE_OR_VIEW_NOT_FOUND") => 190
        case _ => 200
      }
    case _ => 200
  }

  /** Serialize the result's rows array STREAMING, aborting once the
    * serialized size crosses `capBytes` — the oversized payload is
    * never materialized (rows arrive partition-by-partition through
    * `toLocalIterator`, so the driver holds one partition at most).
    * Returns (rows JSON, row count). */
  private def serializeCapped(df: DataFrame, capBytes: Long): (String, Int) = {
    val sb = new java.lang.StringBuilder("[")
    var n = 0
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      if (n > 0) sb.append(',')
      sb.append(r.toSeq.map(jCell).mkString("[", ",", "]"))
      n += 1
      if (sb.length > capBytes)
        throw new QueryGuard.ResponseSizeExceededException(
          s"Serialized query response size exceeds threshold $capBytes" +
            s" after $n rows — narrow the query or page it with" +
            " getCursor=true (cursor pagination)")
    }
    (sb.append(']').toString, n)
  }

  private def assembleRaw(schema: StructType, rowsJson: String, nRows: Int,
      scanned: Long, timeUsedMs: Long, requestId: Long,
      brokerId: String): String = {
    val names = schema.fields.map(f => jStr(f.name)).mkString("[", ",", "]")
    val types = schema.fields.map(f => jStr(columnDataType(f.dataType)))
      .mkString("[", ",", "]")
    s"""{"resultTable":{"dataSchema":{"columnNames":$names,""" +
      s""""columnDataTypes":$types},"rows":$rowsJson},""" +
      s""""numRowsResultSet":$nRows,"exceptions":[],""" +
      s""""timeUsedMs":$timeUsedMs,"requestId":"$requestId",""" +
      s""""brokerId":${jStr(brokerId)},"numDocsScanned":$scanned,""" +
      s""""totalDocs":-1,"numServersQueried":1,"numServersResponded":1}"""
  }

  private def assemble(schema: StructType, rows: Seq[Row], scanned: Long,
      timeUsedMs: Long, requestId: Long, brokerId: String,
      cursorFields: String = "", numRowsResultSet: Long = -1L): String =
    s"""{"resultTable":${resultTableJson(schema, rows)},""" +
      s""""numRowsResultSet":${
        if (numRowsResultSet >= 0) numRowsResultSet else rows.size
      },"exceptions":[],""" +
      s""""timeUsedMs":$timeUsedMs,"requestId":"$requestId",""" +
      s""""brokerId":${jStr(brokerId)},"numDocsScanned":$scanned,""" +
      s""""totalDocs":-1,"numServersQueried":1,"numServersResponded":1""" +
      cursorFields + "}"

  /** Execute and store under a cursor, returning page 0 with the
    * `CursorResponseNative` pagination fields. The guard covers the
    * plan + store-materialization step (the expensive part); paging
    * reads the stored parquet. */
  def executeWithCursor(spark: SparkSession, store: ResponseStore,
      query: String, requestId: Long, numRows: Int,
      nowMs: Long, guard: Option[QueryGuard] = None): String = {
    val t0 = System.nanoTime()
    val opts = QueryFacade.parseOptions(query).options
    val timeoutMs = opts.get("timeoutms").flatMap(_.toLongOption)
      .getOrElse(0L)
    val clientId = opts.get("clientqueryid").filter(_.nonEmpty)
    def run[T](body: => T): T = guard match {
      case Some(g) => g.guarded(requestId, query, timeoutMs, clientId)(body)
      case None => body
    }
    try {
      val meta = run {
        val df = QueryFacade.sql(spark, query)
        store.storeResponse(requestId.toString, df, nowMs)
      }
      val ms = (System.nanoTime() - t0) / 1000000L
      fetchPage(spark, store, requestId, 0L, numRows, ms,
        totalRows = meta.numRows)
    } catch {
      case e: Throwable =>
        // same exceptions-as-data contract as execute(): a guarded
        // cursor query that times out / is cancelled answers HTTP 200
        // with the classified errorCode
        val ms = (System.nanoTime() - t0) / 1000000L
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        s"""{"resultTable":null,"numRowsResultSet":0,""" +
          s""""exceptions":[{"errorCode":${errorCode(e)},"message":${jStr(msg.take(500))}}],""" +
          s""""timeUsedMs":$ms,"requestId":"$requestId",""" +
          s""""brokerId":"graft-broker","numDocsScanned":0,""" +
          s""""totalDocs":-1,"numServersQueried":1,"numServersResponded":1}"""
    }
  }

  /** Fetch an (offset, numRows) page of a stored cursor response. */
  def fetchPage(spark: SparkSession, store: ResponseStore,
      requestId: Long, offset: Long, numRows: Int,
      timeUsedMs: Long = 0L, totalRows: Long = -1L): String = {
    val meta = store.readMeta(requestId.toString)
    val total =
      if (totalRows >= 0) totalRows else meta.map(_.numRows).getOrElse(-1L)
    val page = store.handleCursorRequest(requestId.toString, offset, numRows)
    val rows = page.collect().toSeq
    // CursorResponseNative: numRowsResultSet stays the FULL stored
    // count; the page itself sits in resultTable with (offset, numRows)
    // plus the store's submission/expiration clock fields
    assemble(page.schema, rows, rows.size, timeUsedMs, requestId,
      "graft-broker",
      s""","offset":$offset,"numRows":$numRows""" +
        meta.map(m => s""","submissionTimeMs":${m.submitTimeMs},""" +
          s""""expirationTimeMs":${m.expirationTimeMs}""").getOrElse(""),
      numRowsResultSet = total)
  }

  /** Response-without-resultTable of a stored cursor
    * (`ResponseStoreResource.getSqlQueryMetadata` →
    * `AbstractResponseStore.readResponse`). */
  def cursorMetadata(m: ResponseStore#CursorMeta): String =
    s"""{"resultTable":null,"numRowsResultSet":${m.numRows},""" +
      s""""exceptions":[],"requestId":${jStr(m.requestId)},""" +
      s""""brokerId":"graft-broker",""" +
      s""""submissionTimeMs":${m.submitTimeMs},""" +
      s""""expirationTimeMs":${m.expirationTimeMs}}"""
}
