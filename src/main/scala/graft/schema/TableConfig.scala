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

  /** One `fieldConfigList` entry (`FieldConfig.java:99-108`): the
    * per-column index declarations this engine acts on — JSON (shred
    * paths from properties.shredPaths "path:TYPE;…"), VECTOR (HNSW
    * registration via properties.idColumn), OPENSTRUCT (dense/sparse
    * split per `OpenStructIndexConfig.java:84-90`). */
  final case class FieldIndex(
      column: String,
      indexTypes: Seq[String],
      properties: Map[String, String] = Map.empty,
      openStruct: Option[OpenStruct.Config] = None,
      // timestampConfig.granularities (TimestampIndexUtils.java):
      // derived $col$GRANULARITY columns + the dateTrunc override
      timestampGranularities: Seq[String] = Nil)

  /** `indexingConfig.multiColumnTextIndexConfig`
    * (`MultiColumnTextIndexConfig.java`): ONE shared text index over
    * several columns — columns list + shared properties (graft reads
    * `idColumn`; analyzer properties follow the default-stop-set
    * analyzer as single-column indexes do). */
  final case class MultiColumnText(
      columns: Seq[String],
      properties: Map[String, String] = Map.empty,
      perColumnProperties: Map[String, Map[String, String]] = Map.empty)

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
      dedupEnabled: Boolean = false,
      fieldIndexes: Seq[FieldIndex] = Nil,
      multiColumnText: Option[MultiColumnText] = None)

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
      dedupEnabled = dedupSec.nonEmpty,
      fieldIndexes = parseFieldConfigs(json),
      multiColumnText = {
        val sec = section("multiColumnTextIndexConfig")
        if (sec.isEmpty) None
        else {
          def flatProps(body: String): Map[String, String] =
            "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
              .findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2)).toMap
          def objAt(src: String, from: Int): (String, Int) = {
            val ss = src.indexOf('{', from)
            var dd = 0; var se = ss
            do {
              src(se) match {
                case '{' => dd += 1; case '}' => dd -= 1; case _ =>
              }
              se += 1
            } while (dd > 0 && se < src.length)
            (src.substring(ss, se), se)
          }
          Some(MultiColumnText(
            columns = strList(sec, "columns"),
            properties = {
              val pi = sec.indexOf("\"properties\"")
              if (pi < 0) Map.empty
              else flatProps(objAt(sec, pi)._1)
            },
            perColumnProperties = {
              val pi = sec.indexOf("\"perColumnProperties\"")
              if (pi < 0) Map.empty
              else {
                val (body, _) = objAt(sec, pi)
                // nested { "col": { "k": "v", ... }, ... }
                val out = Map.newBuilder[String, Map[String, String]]
                val colKey = "\"([^\"]+)\"\\s*:\\s*\\{".r
                var at = 1 // skip the outer '{'
                var m = colKey.findFirstMatchIn(body.substring(at))
                while (m.isDefined) {
                  val mm = m.get
                  val (colBody, end) = objAt(body, at + mm.start)
                  out += mm.group(1) -> flatProps(colBody)
                  at = end
                  m = colKey.findFirstMatchIn(body.substring(at))
                }
                out.result()
              }
            }))
        }
      })
  }

  /** Parse `fieldConfigList` entries: name, indexTypes, properties,
    * and a nested `indexes.openstruct` section when present. */
  private def parseFieldConfigs(json: String): Seq[FieldIndex] = {
    val i = json.indexOf("\"fieldConfigList\"")
    if (i < 0) return Nil
    val start = json.indexOf('[', i)
    if (start < 0) return Nil
    // balanced-bracket list slice
    var depth = 0; var end = start
    do {
      json(end) match {
        case '[' => depth += 1
        case ']' => depth -= 1
        case _ =>
      }
      end += 1
    } while (depth > 0 && end < json.length)
    val body = json.substring(start + 1, end - 1)
    // split top-level objects
    val objs = Seq.newBuilder[String]
    var d = 0; var objStart = -1
    body.zipWithIndex.foreach { case (c, j) =>
      c match {
        case '{' =>
          if (d == 0) objStart = j
          d += 1
        case '}' =>
          d -= 1
          if (d == 0) objs += body.substring(objStart, j + 1)
        case _ =>
      }
    }
    objs.result().flatMap { obj =>
      str(obj, "name").map { name =>
        val types = strList(obj, "indexTypes") ++
          str(obj, "indexType").toSeq
        val props = {
          val pi = obj.indexOf("\"properties\"")
          if (pi < 0) Map.empty[String, String]
          else {
            val ps = obj.indexOf('{', pi)
            val pe = obj.indexOf('}', ps)
            "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
              .findAllMatchIn(obj.substring(ps, pe + 1))
              .map(m => m.group(1) -> m.group(2)).toMap
          }
        }
        val os = {
          // the KEY "openstruct": { ... } — not the "OPENSTRUCT"
          // indexTypes VALUE, which has no section body
          val oi = "(?i)\"openstruct\"\\s*:\\s*\\{".r
            .findFirstMatchIn(obj).map(_.start).getOrElse(-1)
          if (oi < 0 && !types.exists(_.equalsIgnoreCase("OPENSTRUCT"))) None
          else {
            val sec = if (oi < 0) obj else {
              val ss = obj.indexOf('{', oi)
              var dd = 0; var se = ss
              do {
                obj(se) match {
                  case '{' => dd += 1
                  case '}' => dd -= 1
                  case _ =>
                }
                se += 1
              } while (dd > 0)
              obj.substring(ss, se)
            }
            Some(OpenStruct.Config(
              denseKeys = strList(sec, "denseKeys"),
              maxDenseKeys = str(sec, "maxDenseKeys")
                .orElse("\"maxDenseKeys\"\\s*:\\s*(-?\\d+)".r
                  .findFirstMatchIn(sec).map(_.group(1)))
                .map(_.toInt).getOrElse(-1),
              denseKeyMinFillRate =
                "\"denseKeyMinFillRate\"\\s*:\\s*([0-9.]+)".r
                  .findFirstMatchIn(sec).map(_.group(1).toDouble)
                  .getOrElse(0.5)))
          }
        }
        val tsGrans = {
          val ti = "(?i)\"timestampConfig\"\\s*:\\s*\\{".r
            .findFirstMatchIn(obj).map(_.start).getOrElse(-1)
          if (ti < 0) Nil
          else {
            val ss = obj.indexOf('{', ti)
            val se = obj.indexOf('}', ss)
            strList(obj.substring(ss, se + 1), "granularities")
          }
        }
        FieldIndex(name, types.map(_.toUpperCase), props, os, tsGrans)
      }
    }
  }

  /** Apply the config's field indexes to an ingested frame: JSON
    * fields shred their configured paths (`JsonShred`), VECTOR fields
    * register an HNSW index for the facade's predicate rewrites
    * (`QueryFacade.VectorIndexes`), OPENSTRUCT fields split
    * dense/sparse. Returns the transformed frame. */
  def applyIndexes(spark: SparkSession, cfg: Config, df: DataFrame,
      shredOutPath: String): DataFrame = {
    import org.apache.spark.sql.types._
    def dt(s: String): DataType = s.toUpperCase match {
      case "INT" => IntegerType
      case "LONG" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "BOOLEAN" => BooleanType
      case "TIMESTAMP" => TimestampType
      case _ => StringType
    }
    // one shared text index over the configured columns — a single
    // build/artifact (MultiColumnLuceneTextIndexCreator) instead of
    // one per column
    cfg.multiColumnText.foreach { mc =>
      // shared properties apply to every column; per-column overrides
      // win (MultiColumnLuceneTextIndexReader.buildColumnConfigs)
      val perCol = mc.columns.map { c =>
        c -> ((mc.properties - "idColumn") ++
          mc.perColumnProperties.getOrElse(c, Map.empty))
      }.toMap
      graft.sources.TextIndex.registerMulti(cfg.tableName, df,
        mc.properties.getOrElse("idColumn", cfg.primaryKeys.headOption
          .getOrElse(throw new IllegalArgumentException(
            "multi-column text index needs an idColumn property" +
              " or a primary key"))),
        mc.columns, perColumnProps = perCol)
    }
    // a fieldConfig entry's index declarations are INDEPENDENT in the
    // reference (one entry may set both an indexType and a
    // timestampConfig) — apply every matching family in sequence
    // rather than stopping at the first
    cfg.fieldIndexes.foldLeft(df) { (d0, fi) =>
      var d = d0
      if (fi.indexTypes.contains("JSON") &&
          fi.properties.contains("shredPaths")) {
        val paths = fi.properties("shredPaths").split(";").toSeq
          .map(_.trim).filter(_.nonEmpty).map { p =>
            p.split(":") match {
              case Array(path, t) => path.trim -> dt(t)
              case Array(path) => path.trim -> (StringType: DataType)
            }
          }
        d = graft.sources.JsonShred.ingestShredded(spark, d,
          s"$shredOutPath/${fi.column}_shred", fi.column, paths)
      }
      if (fi.indexTypes.contains("MAP") &&
          fi.properties.contains("shredKeys")) {
        // the reference's map index family (MapKeyIndexReader.java):
        // per-key serving — here the configured dense keys shred to
        // typed columns and the facade rewrite serves mapValue calls
        val keys = fi.properties("shredKeys").split(";").toSeq
          .map(_.trim).filter(_.nonEmpty)
        d = graft.sources.MapShred.ingestShredded(spark, d,
          s"$shredOutPath/${fi.column}_mapshred", fi.column, keys)
        graft.sources.MapShred.registerTable(cfg.tableName,
          fi.column, keys)
      }
      if (fi.indexTypes.contains("VECTOR")) {
        // the reference's VectorIndexConfig property surface:
        // vectorDistanceFunction (VectorIndexConfig.java:48) and
        // vectorExactRerank (VectorExecutionMode.java:47)
        graft.sql.QueryFacade.VectorIndexes.register(cfg.tableName, d,
          fi.properties.getOrElse("idColumn", cfg.primaryKeys.headOption
            .getOrElse(throw new IllegalArgumentException(
              s"vector index on ${fi.column} needs an idColumn property" +
                " or a primary key"))),
          fi.column,
          distanceFunction =
            fi.properties.getOrElse("vectorDistanceFunction", "COSINE"),
          exactRerank = fi.properties.get("vectorExactRerank")
            .exists(_.toBoolean),
          filterThenAnnLimit = fi.properties.get("filterThenAnnLimit")
            .map(_.toInt).getOrElse(0),
          vectorIndexType =
            fi.properties.getOrElse("vectorIndexType", "HNSW"),
          nlist = fi.properties.get("nlist").map(_.toInt).getOrElse(0),
          nprobe = fi.properties.get("nprobe").map(_.toInt).getOrElse(8))
      }
      if (fi.indexTypes.contains("TEXT")) {
        graft.sources.TextIndex.register(cfg.tableName, d,
          fi.properties.getOrElse("idColumn", cfg.primaryKeys.headOption
            .getOrElse(throw new IllegalArgumentException(
              s"text index on ${fi.column} needs an idColumn property" +
                " or a primary key"))),
          fi.column, props = fi.properties - "idColumn")
      }
      if (fi.openStruct.isDefined ||
          fi.indexTypes.contains("OPENSTRUCT")) {
        d = OpenStruct.split(d, fi.column,
          fi.openStruct.getOrElse(OpenStruct.Config()))
      }
      if (fi.timestampGranularities.nonEmpty) {
        graft.sources.TimestampIndex.registerTable(cfg.tableName,
          fi.column, fi.timestampGranularities)
        d = graft.sources.TimestampIndex(d, fi.column,
          fi.timestampGranularities)
      }
      d
    }
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
        Upsert.partialUpsert(raw, cfg.primaryKeys, cmp, merges.toSeq,
          cfg.deleteRecordColumn)
      case UpsertNone =>
        if (cfg.dedupEnabled) Upsert.firstByKey(raw, cfg.primaryKeys, cmp)
        else raw
    }
  }
}
