package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OPEN_STRUCT ingestion — the reference's schemaless-map column
  * family mapped onto Spark's schema-merge read
  * (`OpenStructTypeInference.java`, `OpenStructNaming.java`,
  * `OpenStructColumnSplitter.java`, `OpenStructIndexConfig.java`):
  * a map-shaped column whose keys are not (all) declared in the schema
  * is split at ingest into
  *
  *  - DENSE keys — materialized as typed top-level columns named
  *    `<parent>$<key>` (OpenStructNaming.SEPARATOR), chosen by
  *    configured dense keys first, then fill-rate ranking (desc,
  *    name asc) subject to `maxDenseKeys` (-1 = unlimited) and
  *    `denseKeyMinFillRate` (default 0.5) — the splitter's
  *    `classify()` order;
  *  - SPARSE keys — folded into one JSON column
  *    `<parent>$__sparse__` holding only the keys present per row.
  *
  * Key types come from the declared child field-spec when present,
  * else from inference with the open-struct policy: TIMESTAMP kept,
  * DATE/TIME/UUID folded to STRING, BYTE/CHAR/SHORT widened to INT,
  * unrepresentable values folded to STRING (the splitter's
  * `inferred != null ? inferred : STRING`). Values that fail coercion
  * to the resolved type become null — the reference drops the presence
  * bit and counts `OPEN_STRUCT_TYPE_COERCION_FAILURES`.
  *
  * Spark-first shape: `spark.read.json` / `mergeSchema` already
  * union the keys of divergent-schema file sets into one struct with
  * per-file-absent keys as null — exactly the presence semantics the
  * splitter's bitmaps encode — so the split is a single projection
  * over the merged struct plus one aggregate pass for fill rates.
  */
object OpenStruct {

  val Separator = "$"
  val SparseSuffix = "__sparse__"

  def materializedColumnName(parent: String, key: String): String =
    parent + Separator + key

  def sparseColumnName(parent: String): String =
    parent + Separator + SparseSuffix

  final case class Config(
      denseKeys: Seq[String] = Nil,
      maxDenseKeys: Int = -1, // -1 = unlimited
      denseKeyMinFillRate: Double = 0.5,
      childSpecs: Map[String, DataType] = Map.empty)

  /** The per-value inference policy (`OpenStructTypeInference
    * .inferDataType`): None = not representable as a stored column
    * type (callers fold to STRING or drop). */
  def inferDataType(raw: Any): Option[DataType] = raw match {
    case _: Byte | _: Char | _: Short | _: Int => Some(IntegerType)
    case _: Long => Some(LongType)
    case _: Float => Some(FloatType)
    case _: Double => Some(DoubleType)
    case _: java.math.BigDecimal => Some(DecimalType(38, 18))
    case _: scala.math.BigDecimal => Some(DecimalType(38, 18))
    case _: Boolean => Some(BooleanType)
    case _: java.sql.Timestamp | _: java.time.Instant => Some(TimestampType)
    case _: String | _: java.sql.Date | _: java.sql.Time |
        _: java.time.LocalDate | _: java.util.UUID => Some(StringType)
    case _: Array[Byte] => Some(BinaryType)
    case _ => None
  }

  /** The merge-read inference: the Spark type the schema-merge union
    * assigned to a key, folded through the open-struct policy. */
  private def resolveType(sparkType: DataType): DataType = sparkType match {
    case ByteType | ShortType | IntegerType => IntegerType
    case LongType => LongType
    case FloatType => FloatType
    case DoubleType => DoubleType
    case d: DecimalType => d
    case BooleanType => BooleanType
    case TimestampType | TimestampNTZType => sparkType // TIMESTAMP kept
    case DateType => StringType // DATE folds to STRING
    case StringType => StringType
    case BinaryType => BinaryType
    case _ => StringType // nested struct/array/map → JSON string
  }

  /** Fill rate per key of a struct column: one aggregate pass. */
  def fillRates(df: DataFrame, parent: String): Map[String, Double] = {
    val st = df.schema(parent).dataType.asInstanceOf[StructType]
    if (st.isEmpty) return Map.empty
    val aggs = st.fields.map(f =>
      (count(col(s"`$parent`.`${f.name}`")).cast(DoubleType) /
        count(lit(1))).as(f.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    st.fields.zipWithIndex.map { case (f, i) =>
      f.name -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i))
    }.toMap
  }

  /** The splitter's `classify()`: configured dense keys first (config
    * order), then fill-rate desc / name asc, both capped by
    * maxDenseKeys; ranked keys must also clear denseKeyMinFillRate. */
  def classify(rates: Map[String, Double], cfg: Config): Seq[String] = {
    if (rates.isEmpty) return Nil
    val resolved = scala.collection.mutable.LinkedHashSet[String]()
    def room: Boolean = cfg.maxDenseKeys < 0 || resolved.size < cfg.maxDenseKeys
    cfg.denseKeys.foreach(k => if (rates.contains(k) && room) resolved += k)
    rates.toSeq.sortBy { case (k, r) => (-r, k) }.foreach { case (k, r) =>
      if (!resolved.contains(k) && room && r >= cfg.denseKeyMinFillRate)
        resolved += k
    }
    resolved.toSeq
  }

  /** Split `parent` (a struct column from a schema-merged read) into
    * dense typed columns + one sparse JSON column; the parent column
    * is replaced. */
  def split(df: DataFrame, parent: String,
      cfg: Config = Config()): DataFrame = {
    val st = df.schema(parent).dataType.asInstanceOf[StructType]
    val dense = classify(fillRates(df, parent), cfg)
    val sparseKeys = st.fieldNames.filterNot(dense.contains).toSeq

    def valueCol(key: String): Column = {
      val raw = col(s"`$parent`.`$key`")
      val sparkType = st(key).dataType
      cfg.childSpecs.get(key) match {
        case Some(want) =>
          // declared field-spec coercion; failures → null (the
          // reference's dropped presence bit)
          expr(s"try_cast(`$parent`.`$key` as ${want.sql})")
        case None => sparkType match {
          case _: StructType | _: ArrayType | _: MapType =>
            to_json(raw) // unrepresentable → JSON string
          case _ => raw.cast(resolveType(sparkType))
        }
      }
    }

    val denseCols = dense.map(k =>
      valueCol(k).as(materializedColumnName(parent, k)))
    val sparseCol =
      if (sparseKeys.isEmpty) Nil
      else {
        val kept = struct(sparseKeys.map(k =>
          col(s"`$parent`.`$k`").as(k)): _*)
        val anyPresent = sparseKeys.map(k =>
          col(s"`$parent`.`$k`").isNotNull).reduce(_ || _)
        Seq(when(anyPresent, to_json(kept))
          .as(sparseColumnName(parent)))
      }
    val others = df.columns.filterNot(_ == parent).map(c => col(s"`$c`"))
    df.select(others.toSeq ++ denseCols ++ sparseCol: _*)
  }
}
