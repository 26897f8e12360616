package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pinot's hash scalar surface
  * (`scalar/HashFunctions.java:102-287`) as a native Catalyst
  * expression: `murmurHash2[Bit64]`, `murmurHash3Bit{32,64,128}`,
  * `fnv1[a]Hash{32,64}`, `adler32`, `crc32c`, `md2`. One expression
  * class parameterized by algorithm; `doGenCode` emits a direct static
  * call into [[graft.functions.HashAlgos]], so the hash stays inside
  * whole-stage codegen (no UDF boxing) on a 100 TB scan.
  *
  * The seed-taking murmur3 variants keep the seed as a literal int —
  * the same shape as the reference, where the seed is a query literal.
  */
case class HashExpr(child: Expression, algo: String, seed: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$algo expects binary input, got ${child.dataType}")

  override def dataType: DataType = algo match {
    case "murmur2" | "murmur3_32" | "fnv1_32" | "fnv1a_32" | "adler32" |
         "crc32c" => IntegerType
    case "murmur2_64" | "murmur3_64" | "fnv1_64" | "fnv1a_64" => LongType
    case "murmur3_128" => BinaryType
    case "md2" => StringType
    case _ => throw new IllegalArgumentException(s"unknown hash algo: $algo")
  }

  private def call(arg: String): String = {
    val h = "graft.functions.HashAlgos"
    algo match {
      case "murmur2" => s"$h.murmur2($arg)"
      case "murmur2_64" => s"$h.murmur2Bit64($arg, $seed)"
      case "murmur3_32" => s"$h.murmur3Bit32($arg, $seed)"
      case "murmur3_64" => s"$h.murmur3Bit64($arg, $seed)"
      case "murmur3_128" => s"$h.murmur3Bit128($arg, $seed)"
      case "fnv1_32" => s"$h.fnv1Hash32($arg)"
      case "fnv1a_32" => s"$h.fnv1aHash32($arg)"
      case "fnv1_64" => s"$h.fnv1Hash64($arg)"
      case "fnv1a_64" => s"$h.fnv1aHash64($arg)"
      case "adler32" => s"$h.adler32($arg)"
      case "crc32c" => s"$h.crc32c($arg)"
      case "md2" =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString($h.md2Hex($arg))"
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Array[Byte]]
    import graft.functions.{HashAlgos => H}
    algo match {
      case "murmur2" => H.murmur2(d)
      case "murmur2_64" => H.murmur2Bit64(d, seed)
      case "murmur3_32" => H.murmur3Bit32(d, seed)
      case "murmur3_64" => H.murmur3Bit64(d, seed)
      case "murmur3_128" => H.murmur3Bit128(d, seed)
      case "fnv1_32" => H.fnv1Hash32(d)
      case "fnv1a_32" => H.fnv1aHash32(d)
      case "fnv1_64" => H.fnv1Hash64(d)
      case "fnv1a_64" => H.fnv1aHash64(d)
      case "adler32" => H.adler32(d)
      case "crc32c" => H.crc32c(d)
      case "md2" => UTF8String.fromString(H.md2Hex(d))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => call(c))

  override protected def withNewChildInternal(newChild: Expression): HashExpr =
    copy(child = newChild)
}

object HashExpr {
  /** Column-level constructor; encodes strings to UTF-8 first (the
    * reference's `…UTF8` variants do `input.getBytes(UTF_8)`). */
  def apply(c: Column, algo: String, seed: Int): Column =
    ColumnBridge.column(HashExpr(ColumnBridge.expression(c), algo, seed))
}

/** CityHash + MurmurHash3-x64 scalar surface
  * (`scalar/HashFunctions.java:161-328`): algorithms whose seeds are
  * longs (cityHash64WithSeed/WithSeeds) or that return the reference's
  * x64 quirk types. Same codegen shape as [[HashExpr]]: a direct
  * static call into graft.functions.{CityHash,HashAlgos}. */
case class CityHashExpr(child: Expression, algo: String,
    seeds: Seq[Long] = Nil) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$algo expects binary input, got ${child.dataType}")

  override def dataType: DataType = algo match {
    case "city_32" | "city_64" => LongType // reference returns long for both
    case "mm3x64_32" => IntegerType
    case "mm3x64_64" => LongType
    case "city_128" | "mm3x64_128" => BinaryType
    case _ => throw new IllegalArgumentException(s"unknown hash algo: $algo")
  }

  private def call(arg: String): String = {
    val ch = "graft.functions.CityHash"
    val ha = "graft.functions.HashAlgos"
    val s0 = seeds.headOption.getOrElse(0L)
    val s1 = seeds.drop(1).headOption.getOrElse(0L)
    algo match {
      case "city_32" => s"(long) $ch.cityHash32($arg)"
      case "city_64" => seeds.size match {
        case 0 => s"$ch.cityHash64($arg)"
        case 1 => s"$ch.cityHash64WithSeed($arg, ${s0}L)"
        case _ => s"$ch.cityHash64WithSeeds($arg, ${s0}L, ${s1}L)"
      }
      case "city_128" => s"$ch.cityHash128($arg)"
      case "mm3x64_32" => s"$ha.murmur3X64Bit32($arg, ${s0.toInt})"
      case "mm3x64_64" => s"$ha.murmur3X64Bit64($arg, ${s0.toInt})"
      case "mm3x64_128" => s"$ha.murmur3X64Bit128($arg, ${s0.toInt})"
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Array[Byte]]
    import graft.functions.{CityHash => C, HashAlgos => H}
    val s0 = seeds.headOption.getOrElse(0L)
    val s1 = seeds.drop(1).headOption.getOrElse(0L)
    algo match {
      case "city_32" => C.cityHash32(d).toLong
      case "city_64" => seeds.size match {
        case 0 => C.cityHash64(d)
        case 1 => C.cityHash64WithSeed(d, s0)
        case _ => C.cityHash64WithSeeds(d, s0, s1)
      }
      case "city_128" => C.cityHash128(d)
      case "mm3x64_32" => H.murmur3X64Bit32(d, s0.toInt)
      case "mm3x64_64" => H.murmur3X64Bit64(d, s0.toInt)
      case "mm3x64_128" => H.murmur3X64Bit128(d, s0.toInt)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => call(c))

  override protected def withNewChildInternal(newChild: Expression): CityHashExpr =
    copy(child = newChild)
}

object CityHashExpr {
  def apply(c: Column, algo: String, seeds: Seq[Long]): Column =
    ColumnBridge.column(CityHashExpr(ColumnBridge.expression(c), algo, seeds))
}
