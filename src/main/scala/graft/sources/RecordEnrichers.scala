package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import scala.jdk.CollectionConverters._
import graft.functions.ClpFunctions

/** Record-enricher SPI analog — the reference's
  * `pinot-spi/.../recordtransformer/enricher/{RecordEnricher,
  * RecordEnricherRegistry}.java` with its two shipped factories
  * (`CLPEncodingEnricherFactory.java:32` type "clpEnricher",
  * `CustomFunctionEnricherFactory.java:33` type "generateColumn") and
  * the `EnrichmentConfig {enricherType, properties,
  * preComplexTypeTransform}` table-config surface.
  *
  * This is deliberately thin config plumbing over pieces graft already
  * has: "generateColumn" routes each fieldToFunctionMap entry to a
  * derived expression column in map order (`CustomFunctionEnricher
  * .java:44-52`; the reference's own TODO merges it with
  * ExpressionTransformer), and "clpEnricher" adds the
  * logtype/dictionaryVars/encodedVars triple per configured field
  * (`CLPEncodingEnricher.java:72-97`: string values CLP-encode,
  * non-string values yield a null triple, the original field is always
  * kept — unlike [[ClpLogIngest]]'s extractor there is no
  * removeProcessedFields / unencodable-suffix surface).
  *
  * Ordering contract (`RecordTransformerUtils.java:44-70`, "DO NOT
  * CHANGE THE ORDER"): enrichers with preComplexTypeTransform run
  * BEFORE the complex-type flatten, the rest run after it and before
  * expression/filter transforms — [[applyAll]] implements exactly that
  * spine. Everything is per-row column projection: scan-parallel, no
  * shuffles. */
object RecordEnrichers {

  final case class Enrichment(enricherType: String, properties: JsonNode,
      preComplexTypeTransform: Boolean)

  private val mapper = new ObjectMapper()

  /** Parse a table config's `ingestionConfig.enrichmentConfigs` JSON
    * (the array, or a single object). */
  def parse(json: String): Seq[Enrichment] = {
    val node = mapper.readTree(json)
    (if (node.isArray) node.asScala.toSeq else Seq(node)).map { e =>
      Enrichment(
        e.path("enricherType").asText(""),
        e.path("properties"),
        e.path("preComplexTypeTransform").asBoolean(false))
    }
  }

  /** Apply one enrichment. Unknown types fail like the registry's
    * validation path (`RecordEnricherRegistry.java`: "No record
    * enricher found for type"). */
  def enrich(df: DataFrame, e: Enrichment): DataFrame = e.enricherType match {
    case "generateColumn" =>
      e.properties.path("fieldToFunctionMap").fields().asScala
        .foldLeft(df) { (d, ent) =>
          d.withColumn(ent.getKey, expr(ent.getValue.asText))
        }
    case "clpEnricher" =>
      val fields = e.properties.path("fields").asScala.map(_.asText).toSeq
      fields.foldLeft(df) { (d, f) =>
        val isString = d.schema.fields.find(_.name == f)
          .map(_.dataType).contains(StringType)
        if (isString) {
          val enc = ClpFunctions.clpEncode(col(f))
          d.withColumn(f + ClpLogIngest.LogtypeSuffix,
              enc.getField("logtype"))
            .withColumn(f + ClpLogIngest.DictionaryVarsSuffix,
              enc.getField("dict_vars"))
            .withColumn(f + ClpLogIngest.EncodedVarsSuffix,
              enc.getField("encoded_vars"))
        } else {
          // non-string (or absent) source: the reference logs and puts
          // the null triple (CLPEncodingEnricher.java:88-96)
          d.withColumn(f + ClpLogIngest.LogtypeSuffix,
              lit(null).cast(StringType))
            .withColumn(f + ClpLogIngest.DictionaryVarsSuffix,
              lit(null).cast(ArrayType(StringType)))
            .withColumn(f + ClpLogIngest.EncodedVarsSuffix,
              lit(null).cast(ArrayType(LongType)))
        }
      }
    case other => throw new IllegalArgumentException(
      s"No record enricher found for type: $other")
  }

  /** The enricher spine around complex-type flattening:
    * preComplexTypeTransform enrichers, then the flatten (when
    * configured), then the post enrichers — the order
    * `RecordTransformerUtils.getTransformers` builds. */
  def applyAll(df: DataFrame, enrichments: Seq[Enrichment],
      flatten: Option[BatchIngest.FlattenComplex] = None): DataFrame = {
    val (pre, post) = enrichments.partition(_.preComplexTypeTransform)
    val d1 = pre.foldLeft(df)(enrich)
    val d2 = flatten.map(f => BatchIngest.applyTransforms(d1, Seq(f)))
      .getOrElse(d1)
    post.foldLeft(d2)(enrich)
  }
}
