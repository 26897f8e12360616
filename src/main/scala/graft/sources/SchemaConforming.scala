package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Schema-conforming ingestion transform — the analog of the
  * reference's `SchemaConformingTransformer.java` (contract pinned by
  * `SchemaConformingTransformerTest.java`): arbitrary JSON log records
  * conform to a declared schema, with
  *
  *  - declared dotted paths extracted to dedicated columns (an OBJECT
  *    value only lands in a JSON-typed column; scalars/arrays land in
  *    any declared column); a literal dotted input key matches its
  *    dotted column only under `useAnonymousDotInFieldNames`;
  *  - undeclared fields collected into the `indexableExtrasField` JSON
  *    object (nested structure preserved), except fields whose KEY
  *    ends with `unindexableFieldSuffix`, which go to
  *    `unindexableExtrasField`;
  *  - null values dropped everywhere; `fieldPathsToDrop` skipped;
  *  - an optional merged-text-index column: one document per flattened
  *    indexable leaf, `<bodAnchor>value<sep>key<eodAnchor>` (reverse
  *    order default; key-first when disabled), arrays contributing the
  *    whole-array JSON plus one document per element, with
  *    CLP-suffix/path/prefix/base64 exclusions and an optional
  *    lowercase duplicate for case-insensitive search.
  *
  * The row function is a single `StaticInvoke` producing one JSON
  * object of every output field (dedicated columns carry their node;
  * extras objects are pre-rendered) — callers `from_json` it with
  * their output schema; per-row work only, scan-parallel. */
object SchemaConforming {

  /** Mirrors SchemaConformingTransformerConfig defaults. */
  case class Config(
      indexableExtrasField: String = "json_data",
      unindexableExtrasField: Option[String] = None,
      unindexableFieldSuffix: Option[String] = None,
      fieldPathsToDrop: Set[String] = Set.empty,
      useAnonymousDotInFieldNames: Boolean = true,
      mergedTextIndexField: Option[String] = None,
      jsonKeyValueSeparator: String = ":",
      mergedTextIndexBeginOfDocAnchor: String = "",
      mergedTextIndexEndOfDocAnchor: String = "",
      reverseTextIndexKeyValueOrder: Boolean = true,
      optimizeCaseInsensitiveSearch: Boolean = false,
      mergedTextIndexPathToExclude: Set[String] = Set.empty,
      mergedTextIndexPrefixToExclude: Seq[String] = Nil,
      mergedTextIndexBinaryDocumentDetectionMinLength: Int = 512)

  /** CLP-triple suffixes never merged into the text index
    * (`SchemaConformingTransformer.java:105`). */
  private val SuffixToExclude = Seq("_logtype", "_dictionaryVars", "_encodedVars")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  /** `base64ValueFilter` (`SchemaConformingTransformerTest:990-1010`):
    * true (= filter out) when the value is at least `minLength` bytes
    * and, after stripping TRAILING periods, every char is a base64
    * urlsafe char. */
  def base64Filter(s: String, minLength: Int): Boolean = {
    if (s.length < minLength) return false
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '.') end -= 1
    if (end == 0) return false
    var i = 0
    while (i < end) {
      val c = s.charAt(i)
      val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '=' ||
        c == '-' || c == '_'
      if (!ok) return false
      i += 1
    }
    true
  }

  private case class Compiled(declared: Map[String, Boolean], cfg: Config)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Compiled]()

  private def parseSpec(spec: String): Compiled =
    cache.computeIfAbsent(spec, { s =>
      val n = mapper.readTree(s)
      val declared = n.get("declared").properties().asScala
        .map(e => e.getKey -> e.getValue.asBoolean()).toMap
      val c = n.get("cfg")
      def str(k: String, d: String) =
        if (c.hasNonNull(k)) c.get(k).asText() else d
      def opt(k: String) =
        if (c.hasNonNull(k)) Some(c.get(k).asText()) else None
      def bool(k: String, d: Boolean) =
        if (c.hasNonNull(k)) c.get(k).asBoolean() else d
      def set(k: String) =
        if (c.hasNonNull(k)) c.get(k).elements().asScala.map(_.asText()).toSet
        else Set.empty[String]
      Compiled(declared, Config(
        indexableExtrasField = str("indexableExtrasField", "json_data"),
        unindexableExtrasField = opt("unindexableExtrasField"),
        unindexableFieldSuffix = opt("unindexableFieldSuffix"),
        fieldPathsToDrop = set("fieldPathsToDrop"),
        useAnonymousDotInFieldNames = bool("useAnonymousDotInFieldNames", true),
        mergedTextIndexField = opt("mergedTextIndexField"),
        jsonKeyValueSeparator = str("jsonKeyValueSeparator", ":"),
        mergedTextIndexBeginOfDocAnchor = str("mergedTextIndexBeginOfDocAnchor", ""),
        mergedTextIndexEndOfDocAnchor = str("mergedTextIndexEndOfDocAnchor", ""),
        reverseTextIndexKeyValueOrder = bool("reverseTextIndexKeyValueOrder", true),
        optimizeCaseInsensitiveSearch = bool("optimizeCaseInsensitiveSearch", false),
        mergedTextIndexPathToExclude = set("mergedTextIndexPathToExclude"),
        mergedTextIndexPrefixToExclude =
          set("mergedTextIndexPrefixToExclude").toSeq,
        mergedTextIndexBinaryDocumentDetectionMinLength =
          if (c.hasNonNull("mergedTextIndexBinaryDocumentDetectionMinLength"))
            c.get("mergedTextIndexBinaryDocumentDetectionMinLength").asInt()
          else 512))
    })

  /** Serialize (declared, cfg) into the literal the StaticInvoke carries. */
  def specJson(declared: Map[String, Boolean], cfg: Config): String = {
    val root = mapper.createObjectNode()
    val d = root.putObject("declared")
    declared.foreach { case (k, v) => d.put(k, v) }
    val c = root.putObject("cfg")
    c.put("indexableExtrasField", cfg.indexableExtrasField)
    cfg.unindexableExtrasField.foreach(c.put("unindexableExtrasField", _))
    cfg.unindexableFieldSuffix.foreach(c.put("unindexableFieldSuffix", _))
    val fd = c.putArray("fieldPathsToDrop")
    cfg.fieldPathsToDrop.foreach(fd.add)
    c.put("useAnonymousDotInFieldNames", cfg.useAnonymousDotInFieldNames)
    cfg.mergedTextIndexField.foreach(c.put("mergedTextIndexField", _))
    c.put("jsonKeyValueSeparator", cfg.jsonKeyValueSeparator)
    c.put("mergedTextIndexBeginOfDocAnchor", cfg.mergedTextIndexBeginOfDocAnchor)
    c.put("mergedTextIndexEndOfDocAnchor", cfg.mergedTextIndexEndOfDocAnchor)
    c.put("reverseTextIndexKeyValueOrder", cfg.reverseTextIndexKeyValueOrder)
    c.put("optimizeCaseInsensitiveSearch", cfg.optimizeCaseInsensitiveSearch)
    val pe = c.putArray("mergedTextIndexPathToExclude")
    cfg.mergedTextIndexPathToExclude.foreach(pe.add)
    val pre = c.putArray("mergedTextIndexPrefixToExclude")
    cfg.mergedTextIndexPrefixToExclude.foreach(pre.add)
    c.put("mergedTextIndexBinaryDocumentDetectionMinLength",
      cfg.mergedTextIndexBinaryDocumentDetectionMinLength)
    mapper.writeValueAsString(root)
  }

  /** Row function: input JSON record → one JSON object holding every
    * output field. Invalid input JSON yields null. */
  def conformRow(json: UTF8String, spec: UTF8String): UTF8String = {
    if (json == null) return null
    val Compiled(declared, cfg) = parseSpec(spec.toString)
    val root = try mapper.readTree(json.toString) catch {
      case _: Exception => return null
    }
    if (!root.isObject) return null
    val out = mapper.createObjectNode()
    val idx = mapper.createObjectNode()
    val unidx = mapper.createObjectNode()
    // insertion-ordered flattened leaf map feeding the text index
    val merged = new java.util.LinkedHashMap[String, JsonNode]()

    def extrasAt(extras: ObjectNode, path: List[String]): ObjectNode =
      path.foldLeft(extras)((o, k) =>
        o.get(k) match {
          case obj: ObjectNode => obj
          case _ => o.putObject(k)
        })

    // null fields are dropped EVERYWHERE, including inside subtrees
    // captured by JSON-typed columns (the suite's golds use
    // TEST_JSON_MAP_NODE_WITHOUT_NULL_FIELD in every output position)
    def stripNulls(v: JsonNode): JsonNode = v match {
      case o: ObjectNode =>
        val out = mapper.createObjectNode()
        o.properties().asScala.foreach(e =>
          if (!e.getValue.isNull) out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, stripNulls(e.getValue)))
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        a.elements().asScala.foreach(el => out.add(stripNulls(el)))
        out
      case other => other
    }

    def addMerged(full: String, v: JsonNode): Unit = v match {
      case o: ObjectNode =>
        o.properties().asScala.foreach(e =>
          addMerged(full + "." + e.getKey, e.getValue))
      case _ =>
        if (!v.isNull && !cfg.unindexableFieldSuffix.exists(full.endsWith))
          merged.put(full, v)
    }

    def process(key: String, value: JsonNode, path: List[String]): Unit = {
      if (value.isNull) return
      val full = (path :+ key).mkString(".")
      if (cfg.fieldPathsToDrop.contains(full)) return
      if (cfg.unindexableFieldSuffix.exists(key.endsWith)) {
        extrasAt(unidx, path).set[com.fasterxml.jackson.databind.JsonNode](key, stripNulls(value)); return
      }
      val dedicated = declared.get(full).exists { isJson =>
        (cfg.useAnonymousDotInFieldNames || !key.contains(".")) &&
          (!value.isObject || isJson)
      }
      if (dedicated) {
        out.set[com.fasterxml.jackson.databind.JsonNode](full, stripNulls(value))
        addMerged(full, value)
      } else if (value.isObject) {
        value.properties().asScala.foreach(e =>
          process(e.getKey, e.getValue, path :+ key))
      } else {
        extrasAt(idx, path).set[com.fasterxml.jackson.databind.JsonNode](key, stripNulls(value))
        addMerged(full, value)
      }
    }
    root.properties().asScala.foreach(e => process(e.getKey, e.getValue, Nil))

    if (idx.size() > 0) out.set[com.fasterxml.jackson.databind.JsonNode](cfg.indexableExtrasField, idx)
    cfg.unindexableExtrasField.foreach(f =>
      if (unidx.size() > 0) out.set[com.fasterxml.jackson.databind.JsonNode](f, unidx))

    cfg.mergedTextIndexField.foreach { f =>
      val docs = mapper.createArrayNode()
      def doc(key: String, v: String): Unit = {
        val body =
          if (cfg.reverseTextIndexKeyValueOrder)
            v + cfg.jsonKeyValueSeparator + key
          else key + cfg.jsonKeyValueSeparator + v
        docs.add(cfg.mergedTextIndexBeginOfDocAnchor + body +
          cfg.mergedTextIndexEndOfDocAnchor)
        if (cfg.optimizeCaseInsensitiveSearch &&
            v.exists(Character.isUpperCase)) {
          val lb =
            if (cfg.reverseTextIndexKeyValueOrder)
              v.toLowerCase(java.util.Locale.ENGLISH) +
                cfg.jsonKeyValueSeparator + key
            else key + cfg.jsonKeyValueSeparator +
              v.toLowerCase(java.util.Locale.ENGLISH)
          docs.add(cfg.mergedTextIndexBeginOfDocAnchor + lb +
            cfg.mergedTextIndexEndOfDocAnchor)
        }
      }
      merged.entrySet().asScala
        .filter(kv => !cfg.mergedTextIndexPathToExclude.contains(kv.getKey))
        .filter(kv => !cfg.mergedTextIndexPrefixToExclude
          .exists(kv.getKey.startsWith))
        .filter(kv => !SuffixToExclude.exists(kv.getKey.endsWith))
        .filter(kv => !base64Filter(scalarText(kv.getValue),
          cfg.mergedTextIndexBinaryDocumentDetectionMinLength))
        .foreach { kv =>
          kv.getValue match {
            case a: ArrayNode =>
              // whole-array JSON, then one doc per element (JSON-rendered)
              doc(kv.getKey, a.toString)
              a.elements().asScala.foreach(el => doc(kv.getKey, el.toString))
            case v => doc(kv.getKey, scalarText(v))
          }
        }
      out.set[com.fasterxml.jackson.databind.JsonNode](f, docs)
    }
    UTF8String.fromString(mapper.writeValueAsString(out))
  }

  private def scalarText(v: JsonNode): String =
    if (v.isTextual) v.asText() else v.toString

  /** Column form: one conformed JSON object per row — `from_json` it
    * with the output schema. */
  def conform(jsonCol: Column, declared: Map[String, Boolean],
      cfg: Config): Column =
    ColumnBridge.column(StaticInvoke(
      // the companion CLASS carries the static forwarders codegen calls
      Class.forName("graft.sources.SchemaConforming"), StringType, "conformRow",
      Seq(ColumnBridge.expression(jsonCol), ColumnBridge.expression(
        org.apache.spark.sql.functions.lit(specJson(declared, cfg)))),
      returnNullable = true))

  /** DataFrame form used by ingest jobs. */
  def transform(df: DataFrame, jsonCol: String, declared: Map[String, Boolean],
      cfg: Config = Config()): DataFrame =
    df.withColumn("__conformed",
      conform(org.apache.spark.sql.functions.col(jsonCol), declared, cfg))
}
