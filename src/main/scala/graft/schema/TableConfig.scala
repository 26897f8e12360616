package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Upsert
import graft.sources.BatchIngest

/** Pinot table-config subset → engine layout and view semantics.
  *
  * Reference: apache/pinot `pinot-spi/.../config/table/TableConfig.java`
  * (tableName, tableType OFFLINE/REALTIME), `IndexingConfig`
  * (sortedColumn — drives the sorted index), `SegmentPartitionConfig`
  * (partition column — drives segment pruning), `UpsertConfig.java:36-37`
  * (mode FULL/PARTIAL, comparison column, deleteRecordColumn, partial
  * strategies), dedup config.
  *
  * Mapping: sortedColumn → `sortWithinPartitions` at write (row-group
  * min/max skipping); partition column → `partitionBy` directory layout
  * (partition pruning); upsert/dedup → the query-time views in
  * [[graft.operators.Upsert]]. A reference user's table config therefore
  * reproduces both their storage layout and their query semantics.
  */
object TableConfig {

  sealed trait UpsertMode
  case object UpsertNone extends UpsertMode
  case object UpsertFull extends UpsertMode
  case object UpsertPartial extends UpsertMode

  final case class Config(
      tableName: String,
      tableType: String, // OFFLINE | REALTIME
      primaryKeys: Seq[String] = Nil,
      sortedColumn: Option[String] = None,
      partitionColumn: Option[String] = None,
      upsertMode: UpsertMode = UpsertNone,
      comparisonColumn: Option[String] = None,
      deleteRecordColumn: Option[String] = None,
      partialStrategies: Map[String, String] = Map.empty, // col -> strategy
      dedupEnabled: Boolean = false)

  private def str(json: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(json).map(_.group(1))

  private def strList(json: String, key: String): Seq[String] = {
    val i = json.indexOf("\"" + key + "\"")
    if (i < 0) return Nil
    val start = json.indexOf('[', i)
    if (start < 0) return Nil
    val end = json.indexOf(']', start)
    "\"([^\"]*)\"".r.findAllMatchIn(json.substring(start, end))
      .map(_.group(1)).toSeq
  }

  /** Parse the reference's table-config JSON subset (regex-based like
    * PinotSchema.fromJson — no external JSON dependency). */
  def fromJson(json: String): Config = {
    def section(key: String): String = {
      val i = json.indexOf("\"" + key + "\"")
      if (i < 0) return ""
      val start = json.indexOf('{', i)
      var depth = 0; var end = start
      do {
        json(end) match { case '{' => depth += 1 case '}' => depth -= 1 case _ => }
        end += 1
      } while (depth > 0)
      json.substring(start, end)
    }
    val upsertSec = section("upsertConfig")
    val dedupSec = section("dedupConfig")
    val mode = str(upsertSec, "mode").map(_.toUpperCase) match {
      case Some("FULL") => UpsertFull
      case Some("PARTIAL") => UpsertPartial
      case _ => UpsertNone
    }
    val partial = {
      val sec = section("partialUpsertStrategies")
      "\"(\\w+)\"\\s*:\\s*\"(\\w+)\"".r.findAllMatchIn(sec)
        .map(m => m.group(1) -> m.group(2).toUpperCase).toMap
    }
    Config(
      tableName = str(json, "tableName").getOrElse("table"),
      tableType = str(json, "tableType").getOrElse("OFFLINE").toUpperCase,
      primaryKeys = strList(json, "primaryKeyColumns"),
      sortedColumn = strList(json, "sortedColumn").headOption,
      partitionColumn = {
        val sec = section("segmentPartitionConfig")
        "\"(\\w+)\"\\s*:\\s*\\{".r.findFirstMatchIn(section("columnPartitionMap") match {
          case "" => sec; case s => s
        }).map(_.group(1))
      },
      upsertMode = mode,
      comparisonColumn = strList(upsertSec, "comparisonColumns").headOption
        .orElse(str(upsertSec, "comparisonColumn")),
      deleteRecordColumn = str(upsertSec, "deleteRecordColumn"),
      partialStrategies = partial,
      dedupEnabled = dedupSec.nonEmpty)
  }

  /** Ingest per the config's layout: partition dir + sorted files. */
  def ingest(spark: SparkSession, cfg: Config, input: DataFrame,
      outPath: String): Unit =
    BatchIngest.ingest(spark, input, outPath,
      partitionBy = cfg.partitionColumn.toSeq,
      sortBy = cfg.sortedColumn.toSeq)

  /** The queryable view the config implies over raw ingested rows. */
  def view(cfg: Config, raw: DataFrame): DataFrame = {
    val cmp = cfg.comparisonColumn.getOrElse(
      throw new IllegalArgumentException("upsert/dedup needs a comparison column"))
    cfg.upsertMode match {
      case UpsertFull =>
        Upsert.latestByKey(raw, cfg.primaryKeys, cmp,
          deleteCol = cfg.deleteRecordColumn)
      case UpsertPartial =>
        val merges = raw.columns
          .filterNot(c => cfg.primaryKeys.contains(c) || c == cmp)
          .map { c =>
            cfg.partialStrategies.getOrElse(c, "OVERWRITE") match {
              case "INCREMENT" => Upsert.Increment(c)
              case "IGNORE" => Upsert.Ignore(c)
              case "MAX" => Upsert.MaxOf(c)
              case "MIN" => Upsert.MinOf(c)
              case "APPEND" => Upsert.Append(c)
              case "UNION" => Upsert.UnionOf(c)
              case _ => Upsert.Overwrite(c)
            }
          }
        Upsert.partialUpsert(raw, cfg.primaryKeys, cmp, merges.toSeq)
      case UpsertNone =>
        if (cfg.dedupEnabled) Upsert.firstByKey(raw, cfg.primaryKeys, cmp)
        else raw
    }
  }
}
