package graft.operators

import org.apache.spark.sql.Column
import graft.plans.VectorExpressions

/** The reference's vector distance-function surface
  * (`VectorIndexConfig.java:216`: `COSINE, INNER_PRODUCT, EUCLIDEAN,
  * DOT_PRODUCT, L2` — L2 is an alias for EUCLIDEAN).
  *
  * Every metric exposes a SCORE with "higher = closer" orientation so
  * all search paths (brute force, HNSW, facade predicates) share one
  * top-k ordering: Euclidean scores are NEGATED distances. Over
  * unnormalized vectors the metrics produce genuinely different top-k
  * sets — cosine ignores magnitude, inner product rewards it, and
  * Euclidean penalizes displacement — which is why "dot = cosine on
  * L2-normalized vectors" (the pre-round-6 shortcut) could not express
  * EUCLIDEAN or DOT_PRODUCT search. */
object VectorDistance {

  sealed trait Metric {
    def name: String
    /** Score column, higher = closer. */
    def score(a: Column, b: Column): Column
    /** Whether index builds may L2-normalize stored vectors (only
      * sound when the metric is scale-invariant). */
    def normalizeAtBuild: Boolean
  }

  // scores route through the CODEGEN'd Catalyst expressions
  // (plans/VectorExpressions), not the higher-order-function forms —
  // over a corpus-scale scan the fused loop is ~5× the interpreted
  // zip_with/aggregate chain

  case object Cosine extends Metric {
    val name = "COSINE"
    def score(a: Column, b: Column): Column =
      VectorExpressions.cosineSimilarity(a, b)
    val normalizeAtBuild = true
  }

  case object InnerProduct extends Metric {
    val name = "INNER_PRODUCT"
    def score(a: Column, b: Column): Column =
      VectorExpressions.innerProduct(a, b)
    val normalizeAtBuild = false
  }

  /** DOT_PRODUCT scores identically to INNER_PRODUCT over raw vectors;
    * the reference declares both names. */
  case object DotProduct extends Metric {
    val name = "DOT_PRODUCT"
    def score(a: Column, b: Column): Column =
      VectorExpressions.innerProduct(a, b)
    val normalizeAtBuild = false
  }

  case object Euclidean extends Metric {
    val name = "EUCLIDEAN"
    def score(a: Column, b: Column): Column =
      org.apache.spark.sql.functions.negate(
        VectorExpressions.l2Distance(a, b))
    val normalizeAtBuild = false
  }

  def fromName(s: String): Metric = s.trim.toUpperCase match {
    case "COSINE" => Cosine
    case "INNER_PRODUCT" => InnerProduct
    case "DOT_PRODUCT" => DotProduct
    case "EUCLIDEAN" | "L2" => Euclidean
    case other => throw new IllegalArgumentException(
      s"unknown vector distance function '$other' " +
        "(COSINE, INNER_PRODUCT, EUCLIDEAN, DOT_PRODUCT, L2)")
  }

  /** Stable id for blob headers. */
  def id(m: Metric): Byte = m match {
    case Cosine => 0
    case InnerProduct | DotProduct => 1
    case Euclidean => 2
  }

  def fromId(b: Byte): Metric = b match {
    case 0 => Cosine
    case 1 => InnerProduct
    case 2 => Euclidean
    case other =>
      throw new IllegalArgumentException(s"unknown metric id $other")
  }
}
