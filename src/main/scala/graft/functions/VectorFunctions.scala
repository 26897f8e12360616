package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions over `array<float|double>` columns.
  *
  * Reference surface: apache/pinot
  * `pinot-common/.../function/scalar/VectorFunctions.java` and
  * `TransformFunctionType.java:233-239` (cosineDistance, innerProduct,
  * l1Distance, l2Distance, vectorDims, vectorNorm).
  *
  * Built entirely from higher-order functions (`zip_with`, `aggregate`,
  * `transform`) so everything stays inside whole-stage codegen — no UDFs,
  * no serialization boundary. All math in double regardless of the input
  * element type (the testdata embeddings are float32).
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sum of elementwise products (inner product). */
  def innerProduct(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sum of squares of a vector. */
  private def sumSq(a: Column): Column =
    aggregate(d(a), lit(0.0), (acc, x) => acc + x * x)

  /** Euclidean norm. */
  def vectorNorm(a: Column): Column = sqrt(sumSq(a))

  /** Number of dimensions. */
  def vectorDims(a: Column): Column = size(a)

  /** Cosine similarity in [-1, 1]. */
  def cosineSimilarity(a: Column, b: Column): Column =
    innerProduct(a, b) / (vectorNorm(a) * vectorNorm(b))

  /** Cosine distance = 1 - cosine similarity (Pinot's cosineDistance). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** L2 (Euclidean) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** L1 (Manhattan) distance. */
  def l1Distance(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => abs(x - y)), lit(0.0), (acc, x) => acc + x)

  /** L2-normalize a vector (unit length); zero vectors pass through. */
  def normalize(a: Column): Column = {
    val n = vectorNorm(a)
    when(n === 0.0, d(a)).otherwise(transform(d(a), x => x / n))
  }

  /** Symmetric int8 quantization: round(x / scale) clamped to [-127,127]
    * with scale = maxAbs/127 — 4x smaller embeddings for the 100 TB
    * storage path; pair with [[dequantize]]. Returns
    * struct(codes: array<tinyint>, scale: double). */
  def quantizeInt8(a: Column): Column = {
    val maxAbs = aggregate(d(a), lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    struct(
      transform(d(a), x => round(x / scale).cast("tinyint")).as("codes"),
      scale.as("scale"))
  }

  /** Inverse of [[quantizeInt8]]. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))
}
