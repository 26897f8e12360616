package graft

import org.apache.spark.sql.functions._
import graft.sql.ResponseStore

/** Cursor pagination over a materialized response (reference
  * ResponseStore/AbstractResponseStore semantics). */
class ResponseStoreSpec extends SparkSpec {

  test("store, page in order, list, expire") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cursors").toString
    val store = new ResponseStore(spark, root, ttlMs = 1000L)

    val result = (0 until 95).map(i => (i, s"name$i")).toDF("id", "name")
      .orderBy(desc("id"))
    val meta = store.storeResponse("req1", result, nowMs = 100L)
    assert(meta.numRows == 95 && meta.expirationTimeMs == 1100L)

    // pages preserve the stored (descending) order, exact boundaries
    val p1 = store.handleCursorRequest("req1", 0, 40).as[(Int, String)].collect()
    val p2 = store.handleCursorRequest("req1", 40, 40).as[(Int, String)].collect()
    val p3 = store.handleCursorRequest("req1", 80, 40).as[(Int, String)].collect()
    assert(p1.length == 40 && p2.length == 40 && p3.length == 15)
    val all = (p1 ++ p2 ++ p3).map(_._1).toSeq
    assert(all == (94 to 0 by -1).toSeq)

    // a second stored response; listing sees both
    store.storeResponse("req2", Seq(1).toDF("x"), nowMs = 500L)
    assert(store.getAllStoredResponses.map(_.requestId).toSet == Set("req1", "req2"))

    // expiry: req1 expires at 1100, req2 at 1500
    assert(store.deleteExpiredResponses(1200L) == 1)
    assert(store.getAllStoredResponses.map(_.requestId) == Seq("req2"))
    assert(intercept[IllegalArgumentException](
      store.handleCursorRequest("req1", 0, 10)).getMessage.contains("unknown"))
    assert(store.deleteResponse("req2") && store.getAllStoredResponses.isEmpty)
  }
}
