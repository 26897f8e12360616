package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinot-style table schema: field specs with roles and the per-type
  * default null values that drive Pinot's DEFAULT null-handling mode.
  *
  * Reference: apache/pinot `pinot-spi/.../data/FieldSpec.java` — field
  * categories DIMENSION / METRIC / TIME / DATE_TIME (`:70-77`), per-type
  * default null values (`:80+`, e.g. Integer.MIN_VALUE for dimension
  * INT, 0 for metric INT), and `Schema.java:71` (JSON declaration).
  * Null handling is opt-in per query in the reference
  * (`QueryContext.java:500-505`); Spark is SQL-null-compliant by
  * default, so the compliant mode is plain Spark and the DEFAULT mode
  * is [[withDefaultNulls]].
  */
object PinotSchema {

  sealed trait Role
  case object Dimension extends Role
  case object Metric extends Role
  case object DateTime extends Role

  final case class Field(name: String, dataType: DataType, role: Role,
      singleValue: Boolean = true)

  final case class Schema(name: String, fields: Seq[Field]) {

    /** Spark StructType; MV fields become ArrayType (SURVEY §1.2);
      * role is preserved in field metadata so downstream layout choices
      * (partition/sort columns) can read it. */
    def toStructType: StructType = StructType(fields.map { f =>
      val t = if (f.singleValue) f.dataType else ArrayType(f.dataType)
      val md = new MetadataBuilder().putString("pinotRole",
        f.role.toString.toUpperCase).build()
      StructField(f.name, t, nullable = true, md)
    })

    /** Default null value per FieldSpec.java: dimensions get type
      * MIN_VALUE ("null" for strings), metrics get 0. */
    def defaultNullValue(f: Field): Any = (f.role, f.dataType) match {
      case (Metric, IntegerType) => 0
      case (Metric, LongType) => 0L
      case (Metric, FloatType) => 0.0f
      case (Metric, DoubleType) => 0.0
      case (_, IntegerType) => Int.MinValue
      case (_, LongType) => Long.MinValue
      case (_, FloatType) => Float.NegativeInfinity
      case (_, DoubleType) => Double.NegativeInfinity
      case (_, StringType) => "null"
      case _ => null
    }

    /** Pinot DEFAULT null mode: substitute the per-field default for
      * SQL NULLs (what Pinot does at ingest; `nullHandlingEnabled=false`
      * query behavior). */
    def withDefaultNulls(df: DataFrame): DataFrame =
      fields.filter(_.singleValue).foldLeft(df) { (d, f) =>
        if (!d.columns.contains(f.name)) d
        else Option(defaultNullValue(f)) match {
          case Some(v) => d.withColumn(f.name,
            coalesce(col(f.name), lit(v).cast(f.dataType)))
          case None => d
        }
      }

    /** Schema evolution — the reference's default-column backfill
      * (`pinot-segment-local/.../index/loader/defaultcolumn/
      * BaseDefaultColumnHandler.java`): reading an OLD stored table
      * through an evolved schema materializes newly-added columns with
      * the field's default value (MV fields get a one-element array of
      * the default, mirroring the handler's `new Integer[]
      * {defaultNullValue}`), drops stored columns the schema no longer
      * declares, casts retained columns to the schema type, and emits
      * columns in schema order. Pure projection: at any scale this is
      * map-only over the scan, and Parquet never rewrites. */
    def evolve(df: DataFrame): DataFrame = {
      val existing = df.columns.toSet
      val cols = fields.map { f =>
        val t = if (f.singleValue) f.dataType else ArrayType(f.dataType)
        if (existing.contains(f.name)) col(f.name).cast(t).as(f.name)
        else {
          val dv = defaultNullValue(f)
          val c =
            if (f.singleValue) lit(dv).cast(f.dataType)
            else array(lit(dv).cast(f.dataType))
          c.as(f.name)
        }
      }
      df.select(cols: _*)
    }
  }

  /** Parse the reference's JSON schema shape:
    * {"schemaName": …, "dimensionFieldSpecs": [{"name","dataType",
    * "singleValueField"?}], "metricFieldSpecs": […],
    * "dateTimeFieldSpecs": […]} (Schema.java:71). Minimal parser — no
    * external JSON dep — for the subset the tests exercise. */
  def fromJson(json: String): Schema = {
    def section(key: String): Seq[Map[String, String]] = {
      val i = json.indexOf("\"" + key + "\"")
      if (i < 0) return Nil
      val start = json.indexOf('[', i)
      var depth = 0; var end = start
      do {
        json(end) match { case '[' => depth += 1 case ']' => depth -= 1 case _ => }
        end += 1
      } while (depth > 0)
      val body = json.substring(start + 1, end - 1)
      """\{[^}]*\}""".r.findAllIn(body).map { obj =>
        """"(\w+)"\s*:\s*("([^"]*)"|true|false)""".r.findAllMatchIn(obj).map { m =>
          m.group(1) -> Option(m.group(3)).getOrElse(m.group(2))
        }.toMap
      }.toSeq
    }
    def dt(s: String): DataType = s.toUpperCase match {
      case "INT" => IntegerType
      case "LONG" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "BIG_DECIMAL" => DecimalType(38, 18)
      case "BOOLEAN" => BooleanType
      case "TIMESTAMP" => TimestampType
      case "STRING" | "JSON" => StringType
      case "BYTES" => BinaryType
      case other => throw new IllegalArgumentException(s"type $other")
    }
    def mk(ms: Seq[Map[String, String]], role: Role): Seq[Field] = ms.map { m =>
      Field(m("name"), dt(m("dataType")), role,
        singleValue = m.getOrElse("singleValueField", "true").toBoolean)
    }
    val name = """"schemaName"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("table")
    Schema(name,
      mk(section("dimensionFieldSpecs"), Dimension) ++
        mk(section("metricFieldSpecs"), Metric) ++
        mk(section("dateTimeFieldSpecs"), DateTime))
  }
}
