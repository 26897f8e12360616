package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Reference surface: apache/pinot vector predicates
  * (`VectorSimilarityFilterOperator.java:69`, `VectorFunctions.java`) —
  * top-k / radius search against an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact: score every row, TakeOrderedAndProject.
  *    The right baseline, and at 100 TB still a single scan + top-k
  *    (no shuffle of the data, only of k rows per partition).
  *  - [[lshTopK]] — approximate: random-hyperplane LSH buckets computed
  *    from deterministic seeded hashes; probes only matching buckets,
  *    cutting the scan to a bucket subset. The 100 TB path when the
  *    corpus is pre-bucketed (bucket id as a partition column).
  */
object Similarity {

  /** Exact top-k nearest by cosine similarity to one probe vector.
    * Probe is a local Seq (tiny) — becomes a literal in the plan, so the
    * scan stays a single pass with no join. */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Seq[Double],
      k: Int): DataFrame =
    bruteForceTopK(corpus, idCol, vecCol, probe, k, VectorDistance.Cosine)

  /** Exact top-k under any of the reference's distance functions
    * (`VectorIndexConfig.VectorDistanceFunction`): the `sim` column is
    * the metric's score, higher = closer (Euclidean scores are negated
    * distances, so `-sim` is the L2 distance). Same single-scan
    * TakeOrderedAndProject shape for every metric. */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Seq[Double],
      k: Int,
      metric: VectorDistance.Metric): DataFrame = {
    val p = array(probe.map(lit): _*)
    corpus
      .withColumn("sim", metric.score(col(vecCol), p))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact top-k for EVERY probe row against the corpus (k-NN join),
    * grouped per probe. Corpus side is broadcast when small; otherwise
    * this is the classic block nested-loop — use [[lshTopK]] at scale. */
  def knnJoin(
      probes: DataFrame,
      corpus: DataFrame,
      probeId: String,
      corpusId: String,
      vecCol: String,
      k: Int): DataFrame = {
    val p = probes.select(col(probeId).as("probe_id"), col(vecCol).as("__pv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = p.crossJoin(broadcast(c))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.plans.VectorExpressions
        .cosineSimilarity(col("__pv"), col("__cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Random-hyperplane signature: bit i = sign(<v, h_i>) where h_i is a
    * deterministic pseudo-random hyperplane derived from xxhash64(j, i).
    * Hyperplane components in {-1,+1} (Rademacher), which preserves cosine
    * locality like Gaussian planes and needs no stored model.
    *
    * Computed by the fused [[graft.plans.HyperplaneSignature]] expression:
    * one codegen'd pass per row, SHUFFLE-FREE (the previous
    * posexplode → bits-wide aggregate → join-back shape cost one exchange
    * of all vector components plus a join carrying the vectors — at
    * corpus scale the join dominates). Adds column `__sig`. */
  def withHyperplaneSignature(df: DataFrame, idCol: String, vecCol: String,
      bits: Int): DataFrame =
    df.withColumn("__sig",
      graft.plans.VectorExpressions.hyperplaneSignature(col(vecCol), bits))

  /** Approximate top-k per probe: candidates = corpus rows agreeing with
    * the probe on at least one LSH band, re-ranked by exact cosine. */
  def lshTopK(
      probes: DataFrame,
      corpus: DataFrame,
      probeId: String,
      corpusId: String,
      vecCol: String,
      k: Int,
      bits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    def banded(df: DataFrame, id: String, as: String, vecAs: String) = {
      val bandKeys = array((0 until bands).map { b =>
        shiftrightunsigned(col("__sig"), b * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)
      withHyperplaneSignature(df.select(col(id).as(as), col(vecCol).as(vecAs)),
          as, vecAs, bits)
        .select(col(as), col(vecAs), posexplode(bandKeys).as(Seq("band", "key")))
    }
    val p = banded(probes, probeId, "probe_id", "__pv")
    val c = banded(corpus, corpusId, "neighbor_id", "__cv")
    // sim is computed BEFORE the candidate-dedup: a pair agreeing on
    // several bands recomputes the (codegen'd) cosine at most `bands`
    // times, but the distinct's exchange then carries 3 scalars per
    // candidate instead of two full embedding vectors.
    val cand = p.join(c, Seq("band", "key"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.plans.VectorExpressions
        .cosineSimilarity(col("__pv"), col("__cv")))
      .select(col("probe_id"), col("neighbor_id"), col("sim")).distinct()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
