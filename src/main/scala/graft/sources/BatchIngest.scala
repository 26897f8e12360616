package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingestion: read → record transforms → partitioned columnar
  * write, the Spark analog of Pinot's segment build pipeline.
  *
  * Reference: apache/pinot record transformers
  * (`pinot-segment-local/.../recordtransformer/ExpressionTransformer.java`,
  * `FilterTransformer.java`, `ComplexTypeTransformer.java`,
  * `TimeValidationTransformer.java`, `SanitizationTransformer.java`) and
  * the batch-ingestion plugins (`pinot-plugins/pinot-batch-ingestion`).
  *
  * Scale design: the output layout IS the index. Partitioning by a
  * time/shard column gives partition pruning (Pinot's time segment
  * pruner); sortWithinPartitions on high-selectivity columns gives
  * parquet row-group min/max skipping (Pinot's sorted + range index);
  * both are declared here at write time so every later scan benefits.
  */
object BatchIngest {

  sealed trait Transform
  /** ExpressionTransformer: derive/overwrite a column. */
  final case class Derive(name: String, expr: Column) extends Transform
  /** FilterTransformer: drop rows matching the filter. */
  final case class DropWhere(cond: Column) extends Transform
  /** ComplexTypeTransformer: unnest an array column into rows. */
  final case class Unnest(column: String) extends Transform
  /** SanitizationTransformer: trim + length-cap a string column
    * (FieldSpec maxLength, default 512). */
  final case class Sanitize(column: String, maxLength: Int = 512) extends Transform
  /** TimeValidationTransformer: null out timestamps outside valid range. */
  final case class ValidTime(column: String, min: String, max: String) extends Transform

  def applyTransforms(df: DataFrame, transforms: Seq[Transform]): DataFrame =
    transforms.foldLeft(df) {
      case (d, Derive(n, e)) => d.withColumn(n, e)
      case (d, DropWhere(c)) => d.filter(!coalesce(c, lit(false)))
      case (d, Unnest(c)) => d.withColumn(c, explode_outer(col(c)))
      case (d, Sanitize(c, max)) => d.withColumn(c, substring(trim(col(c)), 1, max))
      case (d, ValidTime(c, lo, hi)) => d.withColumn(c,
        when(col(c).between(lit(lo).cast("timestamp"), lit(hi).cast("timestamp")),
          col(c)))
    }

  /** Read a batch input in any supported format (reference batch-
    * ingestion plugins: `pinot-batch-ingestion` + input-format plugins
    * csv/json/avro/orc/parquet). csv/json take an explicit schema DDL
    * (Pinot schemas are always explicit — no inference drift); orc and
    * parquet carry their own schema. Avro needs the spark-avro
    * connector jar, absent in this container — the call shape is the
    * same `format("avro")` when present. */
  def readAny(
      spark: SparkSession,
      path: String,
      format: String,
      schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    format.toLowerCase match {
      case "parquet" => r.parquet(path)
      case "orc" => r.orc(path)
      case "csv" =>
        schemaDdl.fold(r.option("header", "true"))(s =>
          r.option("header", "true").schema(s)).csv(path)
      case "json" =>
        schemaDdl.fold(r)(s => r.schema(s)).json(path)
      case "bson" => // framed mongodump layout; schema is required
        WireBson.read(spark, path,
          org.apache.spark.sql.types.StructType.fromDDL(schemaDdl.getOrElse(
            throw new IllegalArgumentException("bson needs an explicit schema"))))
      case "arrow" => ArrowIngest.read(spark, path)
      case "avro" => AvroJsonIngest.read(spark, path, Set.empty)
      // protobuf / thrift need a descriptor set / struct schema beyond a
      // DDL string — use WireProto.read / WireThrift.read directly;
      // avro with JSON destination columns → AvroJsonIngest.read
      case other => r.format(other).load(path)
    }
  }

  /** Ingest files → transformed, partitioned, sorted parquet "segments". */
  def ingest(
      spark: SparkSession,
      input: DataFrame,
      outPath: String,
      transforms: Seq[Transform] = Nil,
      partitionBy: Seq[String] = Nil,
      sortBy: Seq[String] = Nil): Unit = {
    val transformed = applyTransforms(input, transforms)
    val sorted =
      if (sortBy.nonEmpty)
        transformed.repartition(partitionBy.map(col): _*)
          .sortWithinPartitions((partitionBy ++ sortBy).map(col): _*)
      else transformed
    val writer = sorted.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(outPath)
  }
}
