package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** WKB (well-known binary) point encode/decode — the reference's
  * `ST_AsBinary` / `ST_GeomFromWKB` / `ST_GeogFromWKB` surface
  * (`TransformFunctionType.java` ST_AS_BINARY / ST_GEOM_FROM_WKB;
  * impls under `pinot-core/.../geospatial/transform/function/`).
  *
  * Format: standard OGC WKB point — 1 byte order (1 = little-endian),
  * uint32 geometry type (1 = Point), two IEEE-754 doubles. The decoder
  * accepts both endianness markers. POINT subset, matching the engine's
  * struct(x,y) geometry representation; polygons travel as WKT.
  *
  * Scalar byte-twiddling per row: implemented with `nullSafeEval` +
  * `doGenCode` via the standard codegen helpers so the expressions stay
  * inside whole-stage codegen.
  */
case class WkbFromPoint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_as_binary"

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    WkbFromPoint.encode(row.getDouble(0), row.getDouble(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WkbFromPoint.encode($c.getDouble(0), $c.getDouble(1))")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object WkbFromPoint {
  def encode(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    bb.array()
  }
}

case class WkbToPoint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    Seq(StructField("x", DoubleType), StructField("y", DoubleType)))
  override def prettyName: String = "st_geom_from_wkb"

  override protected def nullSafeEval(input: Any): Any =
    WkbToPoint.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WkbToPoint.decodeRow($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object WkbToPoint {
  /** Decode WKB point → InternalRow(x, y); accepts LE and BE markers. */
  def decodeRow(bytes: Array[Byte]): InternalRow = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val order = if (bytes(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
                else java.nio.ByteOrder.BIG_ENDIAN
    bb.order(order).position(5)
    InternalRow(bb.getDouble, bb.getDouble)
  }
}

object GeoBinary {
  import org.apache.spark.sql.functions._

  def stAsBinary(p: Column): Column =
    ColumnBridge.column(WkbFromPoint(ColumnBridge.expression(p)))

  def stGeomFromWkb(b: Column): Column =
    ColumnBridge.column(WkbToPoint(ColumnBridge.expression(b)))

  /** GeoJSON of a point struct (ST_AsGeoJSON point subset). */
  def stAsGeoJson(p: Column): Column =
    concat(lit("""{"type":"Point","coordinates":["""),
      p.getField("x").cast(StringType), lit(","),
      p.getField("y").cast(StringType), lit("]}"))

  /** Parse GeoJSON point → struct(x,y) (ST_GeomFromGeoJSON subset). */
  def stGeomFromGeoJson(j: Column): Column = {
    val coords = from_json(get_json_object(j, "$.coordinates"),
      ArrayType(DoubleType))
    struct(element_at(coords, 1).as("x"), element_at(coords, 2).as("y"))
  }

  /** ST_GeometryType: plan-time dispatch on the expression's type —
    * struct(x,y) → Point, array of points (polygon rep) → Polygon;
    * mirrors reference StGeometryTypeFunction output names. */
  def stGeometryType(g: Column): Column =
    ColumnBridge.expression(g).dataType match {
      case _: StructType => lit("Point")
      case _: ArrayType  => lit("Polygon")
      case _: BinaryType => lit("Point") // WKB path carries points only
      case _             => lit("Point")
    }

  /** ST_Equals on the point subset: null-safe coordinate equality. */
  def stEquals(a: Column, b: Column): Column =
    (a.getField("x") <=> b.getField("x")) &&
      (a.getField("y") <=> b.getField("y"))
}
