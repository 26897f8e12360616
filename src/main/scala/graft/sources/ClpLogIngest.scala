package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ClpFunctions

/** Config-driven CLP-log ingestion — the analog of the reference's
  * `pinot-plugins/pinot-input-format/pinot-clp-log` plugin
  * (`CLPLogRecordExtractor.java:107-263`,
  * `CLPLogRecordExtractorConfig.java:41-127`): each configured message
  * field is CLP-encoded at ingest into three sibling columns
  * `<f>_logtype` / `<f>_dictionaryVars` / `<f>_encodedVars`
  * (`ClpRewriter.java:95-97` suffixes), so raw JSON logs land directly
  * in the compressed-log layout `plans/ClpExpressions.scala` serves —
  * no hand-written `clpEncode` projections.
  *
  * Contract carried over from the reference extractor:
  *  - non-string values are JSON-rendered before encoding
  *    (`CLPLogRecordExtractor.java:198-212` JsonUtils.objectToString);
  *  - a field whose encoding exceeds MAX_VARIABLES_PER_CELL (1000,
  *    `ForwardIndexType.MAX_MULTI_VALUES_PER_ROW`) is "unencodable":
  *    its original value lands in `<f><unencodableFieldSuffix>` when
  *    that suffix is configured, and the triple holds the encoding of
  *    `unencodableFieldError` when configured, else nulls
  *    (`CLPLogRecordExtractor.java:237-253`);
  *  - `removeProcessedFields=true` drops the original field
  *    (`:260-262`); default keeps it;
  *  - `topicNameDestinationColumn` stamps the source topic/path on
  *    every row (`:111-114`);
  *  - a configured field absent from the input yields null triples
  *    (the reference's `from.get` miss), never an error;
  *  - null values yield null triples (`:190-194`).
  *
  * Everything is column-level Catalyst (the fused ClpEncode native
  * expression) — one projection, scan-parallel, no UDFs; at 100 TB the
  * encode rides the ingest write job like any derived column.
  */
object ClpLogIngest {

  /** `ForwardIndexType.MAX_MULTI_VALUES_PER_ROW` — cells past this
    * variable count are unencodable in the reference's forward index. */
  val MaxVariablesPerCell = 1000

  val LogtypeSuffix = "_logtype"
  val DictionaryVarsSuffix = "_dictionaryVars"
  val EncodedVarsSuffix = "_encodedVars"

  final case class Config(
      fieldsForClpEncoding: Seq[String],
      removeProcessedFields: Boolean = false,
      unencodableFieldSuffix: Option[String] = None,
      unencodableFieldError: Option[String] = None,
      topicNameDestinationColumn: Option[String] = None)

  /** Parse the reference's decoder-prop surface
    * (`stream.kafka.decoder.prop.<key>` in streamConfigs, or the bare
    * keys): empty values are ignored exactly like
    * `CLPLogRecordExtractorConfig.init`. */
  def fromProps(props: Map[String, String]): Config = {
    val p = props.map { case (k, v) =>
      k.stripPrefix("stream.kafka.decoder.prop.") -> v
    }
    def nonEmpty(key: String): Option[String] =
      p.get(key).filter(_.nonEmpty)
    Config(
      fieldsForClpEncoding = p.get("fieldsForClpEncoding").toSeq
        .flatMap(_.split(",")).filter(_.nonEmpty),
      removeProcessedFields =
        p.get("removeProcessedFields").exists(_.equalsIgnoreCase("true")),
      unencodableFieldSuffix = nonEmpty("unencodableFieldSuffix"),
      unencodableFieldError = nonEmpty("unencodableFieldError"),
      topicNameDestinationColumn = nonEmpty("topicNameDestinationColumn"))
  }

  /** The reference's value-as-string step: strings pass through,
    * complex types JSON-render, scalars render as their JSON literal
    * (CAST to string matches Jackson's rendering for long/boolean). */
  private def asMessage(df: DataFrame, field: String): Column =
    df.schema.fields.find(_.name.equalsIgnoreCase(field)).map(_.dataType) match {
      case Some(StringType) => col(field)
      case Some(_: StructType) | Some(_: MapType) | Some(_: ArrayType) =>
        to_json(col(field))
      case Some(_) => col(field).cast(StringType)
      case None => lit(null).cast(StringType) // absent input field
    }

  /** Apply the extractor: one projection adding the three CLP columns
    * per configured field (plus the optional unencodable/topic
    * columns), dropping originals when configured. */
  def extract(df: DataFrame, config: Config,
      topicName: Option[String] = None): DataFrame = {
    val withTopic = config.topicNameDestinationColumn match {
      case Some(dest) => df.withColumn(dest,
        topicName.map(lit(_)).getOrElse(lit(null).cast(StringType)))
      case None => df
    }
    val out = config.fieldsForClpEncoding.foldLeft(withTopic) { (d, f) =>
      val enc = ClpFunctions.clpEncode(asMessage(d, f))
      val tooMany =
        coalesce(size(enc.getField("dict_vars")), lit(0))
          .gt(lit(MaxVariablesPerCell))
          .or(coalesce(size(enc.getField("encoded_vars")), lit(0))
            .gt(lit(MaxVariablesPerCell)))
      // unencodable fallback triple: the configured error message's
      // own encoding, or nulls (CLPLogRecordExtractor.java:244-252)
      val (fbLog, fbDict, fbEnc) = config.unencodableFieldError match {
        case Some(err) =>
          val e = ClpFunctions.clpEncode(lit(err))
          (e.getField("logtype"), e.getField("dict_vars"),
            e.getField("encoded_vars"))
        case None =>
          (lit(null).cast(StringType),
            lit(null).cast(ArrayType(StringType)),
            lit(null).cast(ArrayType(LongType)))
      }
      val d2 = d
        .withColumn(f + LogtypeSuffix,
          when(tooMany, fbLog).otherwise(enc.getField("logtype")))
        .withColumn(f + DictionaryVarsSuffix,
          when(tooMany, fbDict).otherwise(enc.getField("dict_vars")))
        .withColumn(f + EncodedVarsSuffix,
          when(tooMany, fbEnc).otherwise(enc.getField("encoded_vars")))
      val d3 = config.unencodableFieldSuffix match {
        case Some(suffix) if d.columns.exists(_.equalsIgnoreCase(f)) =>
          d2.withColumn(f + suffix, when(tooMany, col(f)))
        case _ => d2
      }
      if (config.removeProcessedFields) d3.drop(f) else d3
    }
    out
  }

  /** [[extract]], persisted: the encoded layout is written once as a
    * parquet [[IndexStore]] artifact (fingerprint-keyed, atomic
    * commit) and re-read thereafter — the corpus CLP encode is a
    * register-time index build like TextIndex/RegexpIndex, not a
    * per-query projection. Reading the triple back from parquet also
    * makes the clpMatch logtype prefilter land on a real column scan
    * instead of a derived projection. Falls back to the inline
    * projection when the corpus has no stable file fingerprint. */
  def extractDurable(df: DataFrame, config: Config,
      topicName: Option[String] = None): DataFrame = {
    val colKey = config.fieldsForClpEncoding.mkString(",")
    val params = Seq("clp_extract_v1", colKey,
      config.removeProcessedFields.toString,
      config.unencodableFieldSuffix.getOrElse(""),
      config.unencodableFieldError.getOrElse(""),
      config.topicNameDestinationColumn.getOrElse(""),
      topicName.getOrElse(""))
    IndexStore.getOrBuild(df, "clp", colKey, params) { dir =>
      extract(df, config, topicName)
        .write.mode("overwrite").parquet(dir + "/data")
    } match {
      case Some(located) =>
        df.sparkSession.read.parquet(located.dir + "/data")
      case None => extract(df, config, topicName)
    }
  }
}
