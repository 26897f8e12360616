package graft.sql

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Cursor pagination — the reference's response-store surface
  * (`pinot-spi/.../cursors/ResponseStore.java`,
  * `pinot-common/.../cursors/AbstractResponseStore.java`,
  * `pinot-broker/.../cursors/FsResponseStore.java`): a query's result
  * table is materialized once under a request id, then fetched in
  * (offset, numRows) pages until it expires.
  *
  * Spark-native shape: the result DataFrame is written as parquet with
  * a stable `__row_idx` assigned via `zipWithIndex` (distributed,
  * preserves result order, no driver collect); a page is a pushed-down
  * range filter on that column. Metadata (row count, submit/expiration
  * times) lives in a sidecar JSON, mirroring FsResponseStore's layout.
  */
final class ResponseStore(spark: SparkSession, rootDir: String,
    ttlMs: Long = 3600000L) {

  final case class CursorMeta(requestId: String, numRows: Long,
      submitTimeMs: Long, expirationTimeMs: Long)

  private def dir(requestId: String) = s"$rootDir/$requestId"
  private def metaPath(requestId: String) = Paths.get(dir(requestId), "meta.json")

  /** Materialize a result under `requestId`; returns its metadata. */
  def storeResponse(requestId: String, result: DataFrame,
      nowMs: Long): CursorMeta = {
    require(!requestId.contains('/') && requestId.nonEmpty, "bad requestId")
    val schema = StructType(result.schema.fields :+
      StructField("__row_idx", LongType, nullable = false))
    val indexed = spark.createDataFrame(
      result.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    indexed.write.mode("overwrite").parquet(s"${dir(requestId)}/data")
    val n = spark.read.parquet(s"${dir(requestId)}/data").count()
    val meta = CursorMeta(requestId, n, nowMs, nowMs + ttlMs)
    Files.createDirectories(Paths.get(dir(requestId)))
    Files.writeString(metaPath(requestId),
      s"""{"requestId":"$requestId","numRows":${meta.numRows},""" +
        s""""submitTimeMs":${meta.submitTimeMs},""" +
        s""""expirationTimeMs":${meta.expirationTimeMs}}""")
    meta
  }

  def readMeta(requestId: String): Option[CursorMeta] = {
    val p = metaPath(requestId)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      def num(k: String) =
        s"""\"$k\":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
      Some(CursorMeta(requestId, num("numRows"), num("submitTimeMs"),
        num("expirationTimeMs")))
    }
  }

  /** Fetch one page: rows [offset, offset + numRows) in stored order
    * (the filter pushes down to the parquet scan). */
  def handleCursorRequest(requestId: String, offset: Long,
      numRows: Int): DataFrame = {
    require(readMeta(requestId).isDefined, s"unknown cursor $requestId")
    spark.read.parquet(s"${dir(requestId)}/data")
      .filter(col("__row_idx") >= offset && col("__row_idx") < offset + numRows)
      .orderBy(col("__row_idx"))
      .drop("__row_idx")
  }

  def getAllStoredResponses: Seq[CursorMeta] = {
    val root = Paths.get(rootDir)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(root).iterator().asScala.toSeq
        .flatMap(p => readMeta(p.getFileName.toString))
    }
  }

  def deleteResponse(requestId: String): Boolean = {
    val d = Paths.get(dir(requestId))
    if (!Files.exists(d)) false
    else {
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
      true
    }
  }

  /** Delete responses whose expiration is at or before the cutoff;
    * returns how many were deleted (ResponseStore.java:73-79). */
  def deleteExpiredResponses(expiredBeforeMs: Long): Int =
    getAllStoredResponses
      .filter(_.expirationTimeMs <= expiredBeforeMs)
      .count(m => deleteResponse(m.requestId))
}
