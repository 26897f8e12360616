package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sql.{BrokerResponse, QueryFacade, ResponseStore}

class BrokerResponseSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  test("response JSON matches the reference BrokerResponseNative shape") {
    QueryFacade.init(spark, sf)
    val json = BrokerResponse.execute(spark,
      "SET explicitLimit = true; " +
        "SELECT n_name, n_regionkey FROM nation " +
        "WHERE n_regionkey = 1 ORDER BY n_name",
      requestId = 42L)
    val root = mapper.readTree(json)
    // the documented nesting: resultTable.dataSchema.{columnNames,
    // columnDataTypes} + resultTable.rows (BrokerResponseNative.java
    // @JsonPropertyOrder, ResultTable.java, DataSchema.java)
    val schema = root.path("resultTable").path("dataSchema")
    assert(mapper.convertValue(schema.path("columnNames"),
      classOf[Array[String]]).toSeq == Seq("n_name", "n_regionkey"))
    assert(mapper.convertValue(schema.path("columnDataTypes"),
      classOf[Array[String]]).toSeq == Seq("STRING", "INT"))
    val rows = root.path("resultTable").path("rows")
    assert(rows.isArray && rows.size() == 5)
    assert(rows.get(0).get(0).isTextual && rows.get(0).get(1).isNumber)
    assert(root.path("numRowsResultSet").asInt() == 5)
    assert(root.path("exceptions").isArray &&
      root.path("exceptions").size() == 0)
    assert(root.path("requestId").asText() == "42")
    assert(root.path("brokerId").asText() == "graft-broker")
    assert(root.path("timeUsedMs").isNumber)
    // numDocsScanned: rows surviving pushed filters — here the region
    // filter ran in the scan, so scanned == result rows
    assert(root.path("numDocsScanned").asLong() >= 5L)
    assert(root.path("numServersQueried").asInt() == 1)
  }

  test("query failure returns an exceptions entry, not a transport error") {
    QueryFacade.init(spark, sf)
    val json = BrokerResponse.execute(spark,
      "SELECT no_such_column FROM nation")
    val root = mapper.readTree(json)
    assert(root.path("resultTable").isNull)
    assert(root.path("numRowsResultSet").asInt() == 0)
    val exceptions = root.path("exceptions")
    assert(exceptions.size() == 1)
    // classified per the reference QueryErrorCode enum: an unresolved
    // column is UNKNOWN_COLUMN = 710 (DivergenceContractSpec covers
    // the full class table)
    assert(exceptions.get(0).path("errorCode").asInt() == 710)
    assert(exceptions.get(0).path("message").asText()
      .toLowerCase.contains("no_such_column"))
  }

  test("cursor pages reuse ResponseStore with CursorResponseNative fields") {
    QueryFacade.init(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("brkcur").toString
    val store = new ResponseStore(spark, dir)
    val page0 = mapper.readTree(BrokerResponse.executeWithCursor(
      spark, store,
      "SET explicitLimit = true; " +
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey",
      requestId = 7L, numRows = 10, nowMs = 1000L))
    assert(page0.path("numRowsResultSet").asInt() == 25) // full count
    assert(page0.path("offset").asInt() == 0)
    assert(page0.path("numRows").asInt() == 10)
    assert(page0.path("resultTable").path("rows").size() == 10)
    val page2 = mapper.readTree(BrokerResponse.fetchPage(
      spark, store, 7L, offset = 20L, numRows = 10))
    val vals = (0 until page2.path("resultTable").path("rows").size())
      .map(i => page2.path("resultTable").path("rows").get(i).get(0).asLong())
    assert(vals == Seq(20L, 21L, 22L, 23L, 24L)) // last partial page
    assert(page2.path("offset").asInt() == 20)
  }

  test("cell conventions: bytes hex, arrays nested, null, BIG_DECIMAL") {
    QueryFacade.init(spark, sf)
    val json = BrokerResponse.execute(spark,
      "SET explicitLimit = true; " +
        "SELECT cast('ab' as binary) AS b, array(1, 2) AS arr, " +
        "cast(null as string) AS s, cast(1.50 as decimal(10,2)) AS d")
    val root = mapper.readTree(json)
    val types = mapper.convertValue(
      root.path("resultTable").path("dataSchema").path("columnDataTypes"),
      classOf[Array[String]]).toSeq
    assert(types == Seq("BYTES", "INT_ARRAY", "STRING", "BIG_DECIMAL"))
    val row = root.path("resultTable").path("rows").get(0)
    assert(row.get(0).asText() == "6162") // 'ab' as hex
    assert(row.get(1).isArray && row.get(1).get(1).asInt() == 2)
    assert(row.get(2).isNull)
    assert(row.get(3).asDouble() == 1.5)
  }
}
