package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, MapType,
  StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

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
  /** ComplexTypeTransformer (`ComplexTypeTransformerTest` contract):
    * struct columns flatten recursively to `parent<delim>child` names;
    * arrays named in `fieldsToUnnest` explode (struct elements flatten
    * to dotted columns with the ORIGINAL array kept, primitive elements
    * replace the column; sibling unnests cross-product; nested names
    * like `a.b` unnest after their parent); arrays NOT unnested follow
    * `collectionNotUnnestedToJson`: NON_PRIMITIVE (default) renders
    * arrays of structs as JSON strings, ALL renders every array, NONE
    * leaves them. MapType columns (per-row dynamic keys) stay maps —
    * the per-key shred analog is [[MapShred]]. */
  final case class FlattenComplex(
      fieldsToUnnest: Seq[String] = Nil,
      delimiter: String = ".",
      collectionNotUnnestedToJson: String = "NON_PRIMITIVE",
      prefixesToRename: Map[String, String] = Map.empty) extends Transform
  /** SpecialValueTransformer analog
    * (`recordtransformer/SpecialValueTransformer.java:30-40`,
    * `utils/SpecialValueTransformerUtils.java:77-105`): for FLOAT and
    * DOUBLE, −0.0 → 0.0 and NaN → null (default-null), so every stored
    * value equals itself and ordering is consistent with equals — the
    * property sorted structures and binary search need. MV arrays drop
    * NaN elements and normalize −0.0; an array whose elements ALL
    * vanish becomes null, while genuinely empty input arrays stay
    * empty (the reference only nulls a transformed-to-empty array).
    * DECIMAL trailing-zero stripping is a no-op for Spark DecimalType
    * (schema-fixed scale already makes equality/ordering consistent);
    * decimal-as-STRING columns listed in `decimalStringColumns` strip
    * via java.math.BigDecimal.stripTrailingZeros — the same JDK method
    * the reference calls, so `0E-18` → `0` and `600.0` → `6E+2`
    * exactly. Empty `columns` applies to every FLOAT/DOUBLE scalar or
    * array column, mirroring the reference deriving the column set
    * from the schema's field specs. */
  final case class SpecialValues(columns: Seq[String] = Nil,
      decimalStringColumns: Seq[String] = Nil) extends Transform

  def applyTransforms(df: DataFrame, transforms: Seq[Transform]): DataFrame =
    transforms.foldLeft(df) {
      case (d, Derive(n, e)) => d.withColumn(n, e)
      case (d, DropWhere(c)) => d.filter(!coalesce(c, lit(false)))
      case (d, Unnest(c)) => d.withColumn(c, explode_outer(col(c)))
      case (d, Sanitize(c, max)) => d.withColumn(c, substring(trim(col(c)), 1, max))
      case (d, ValidTime(c, lo, hi)) => d.withColumn(c,
        when(col(c).between(lit(lo).cast("timestamp"), lit(hi).cast("timestamp")),
          col(c)))
      case (d, f: FlattenComplex) => flattenComplex(d, f)
      case (d, s: SpecialValues) => specialValues(d, s)
    }

  /** One select over the frame — every eligible column rewrites in the
    * same projection (scan-parallel, codegen'd, no shuffles). */
  private[sources] def specialValues(df: DataFrame,
      cfg: SpecialValues): DataFrame = {
    val want = cfg.columns.toSet
    val decs = cfg.decimalStringColumns.toSet
    val sel = df.schema.fields.toSeq.map { f =>
      val c = bq(f.name)
      def out(e: Column) = e.as(f.name)
      f.dataType match {
        case _ if want.nonEmpty && !want(f.name) && !decs(f.name) => c
        // x + 0.0 is the IEEE-754 −0.0 normalizer (−0.0 + 0.0 = +0.0);
        // NaN is caught first so the addition never sees it
        case FloatType =>
          out(when(isnan(c), lit(null).cast(FloatType))
            .otherwise(c + lit(0.0f)))
        case DoubleType =>
          out(when(isnan(c), lit(null).cast(DoubleType))
            .otherwise(c + lit(0.0d)))
        // NaN-only removal: a bare !isnan(x) predicate evaluates to
        // null for a NULL element, which filter() treats as drop —
        // keep nulls explicitly (the reference removes only NaN).
        case ArrayType(FloatType, _) =>
          val cleaned = transform(filter(c, x => x.isNull || !isnan(x)),
            x => x + lit(0.0f))
          out(when(size(c) > 0 && size(cleaned) === 0,
            lit(null)).otherwise(cleaned))
        case ArrayType(DoubleType, _) =>
          val cleaned = transform(filter(c, x => x.isNull || !isnan(x)),
            x => x + lit(0.0d))
          out(when(size(c) > 0 && size(cleaned) === 0,
            lit(null)).otherwise(cleaned))
        case StringType if decs(f.name) =>
          out(ColumnBridge.column(StaticInvoke(
            // the companion CLASS carries the static forwarder codegen calls
            Class.forName("graft.sources.BatchIngest"), StringType,
            "stripTrailingZeros", Seq(ColumnBridge.expression(c)),
            returnNullable = true)))
        case _ => c
      }
    }
    df.select(sel: _*)
  }

  /** Exact JDK `BigDecimal.stripTrailingZeros` rendering — the method
    * the reference's transformer delegates to. Unparsable text passes
    * through untouched (ingest transforms never throw on dirty rows). */
  def stripTrailingZeros(s: UTF8String): UTF8String = {
    if (s == null) return null
    try UTF8String.fromString(
      new java.math.BigDecimal(s.toString.trim).stripTrailingZeros().toString)
    catch { case _: NumberFormatException => s }
  }

  private def bq(name: String) = col(s"`$name`")

  /** One pass of recursive struct flattening: every StructType column
    * explodes into `name<delim>field` columns (the struct column is
    * consumed); repeats until no struct columns remain. */
  private def flattenStructs(df0: DataFrame, delim: String): DataFrame = {
    var df = df0
    while (df.schema.fields.exists(_.dataType.isInstanceOf[StructType])) {
      val sel = df.schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case st: StructType => st.fields.toSeq.map(sf =>
            bq(f.name).getField(sf.name).as(f.name + delim + sf.name))
          case _ => Seq(bq(f.name))
        }
      }
      df = df.select(sel: _*)
    }
    df
  }

  private[sources] def flattenComplex(df0: DataFrame,
      cfg: FlattenComplex): DataFrame = {
    var df = flattenStructs(df0, cfg.delimiter)
    // unnest in declaration order: a nested name (`a.b`) only exists
    // after its parent's explode+flatten, so re-resolve per step
    cfg.fieldsToUnnest.foreach { name =>
      df.schema.fields.find(_.name == name).map(_.dataType) match {
        case Some(ArrayType(et: StructType, _)) =>
          // struct elements: keep the original array, add the exploded
          // element's fields as dotted columns
          val keep = df.columns.map(bq).toIndexedSeq
          df = df.withColumn("__ctt_unnest", explode_outer(bq(name)))
            .select(keep ++ et.fields.map(sf =>
              col("__ctt_unnest").getField(sf.name)
                .as(name + cfg.delimiter + sf.name)): _*)
          df = flattenStructs(df, cfg.delimiter)
        case Some(_: ArrayType) =>
          // primitive elements replace the column under the same name
          df = df.withColumn(name, explode_outer(bq(name)))
        case _ => () // absent or not an array: no-op
      }
    }
    // collectionNotUnnestedToJson over the remaining arrays
    val unnested = cfg.fieldsToUnnest.toSet
    val mode = cfg.collectionNotUnnestedToJson.toUpperCase
    if (mode != "NONE") {
      val sel = df.schema.fields.map { f =>
        f.dataType match {
          case ArrayType(et, _) if !unnested.contains(f.name) &&
              (mode == "ALL" || et.isInstanceOf[StructType] ||
                et.isInstanceOf[MapType] || et.isInstanceOf[ArrayType]) =>
            to_json(bq(f.name)).as(f.name)
          case _ => bq(f.name)
        }
      }
      df = df.select(sel.toIndexedSeq: _*)
    }
    // prefixesToRename (renamePrefixes): longest-prefix rename pass;
    // a rename that collides with an existing column is an error, as
    // upstream
    if (cfg.prefixesToRename.nonEmpty) {
      val byLen = cfg.prefixesToRename.toSeq.sortBy(-_._1.length)
      val renamed = df.columns.map { c =>
        byLen.find { case (p, _) => c.startsWith(p) } match {
          case Some((p, r)) => r + c.substring(p.length)
          case None => c
        }
      }
      require(renamed.distinct.length == renamed.length,
        s"prefixesToRename produces duplicate column names: " +
          renamed.diff(renamed.distinct).mkString(", "))
      df = df.toDF(renamed.toIndexedSeq: _*)
    }
    df
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
