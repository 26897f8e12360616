package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Fully distributed Lloyd's k-means over an embedding column.
  *
  * This is the corpus-scale complement to the bounded-sample quantizer
  * training used by [[IvfIndex.build]] and SemDeDup: there the driver
  * holds a fixed 65,536-vector sample (the FAISS recipe); here NO
  * vector ever reaches the driver — each iteration is ONE distributed
  * pass:
  *
  *   broadcast the k centroids, per-row argmin (map-side min-struct
  *   aggregate), posexplode the assigned vectors, and reduce to
  *   per-(cell, dim) (count, sum x, sum x²) — a hash aggregate with
  *   map-side partials whose shuffle volume is k×dim×partitions
  *   triples, independent of corpus row count.
  *
  * The driver turns the k×dim moment matrix into the next centroids
  * (mean = Σx/n) AND the exact within-cluster SSE against the CURRENT
  * centroids (Σx² − 2cΣx + nc² summed over dims) — so Lloyd's monotone
  * convergence is observable for free, without a second pass. Use this
  * when cluster structure genuinely needs the full corpus (e.g.
  * balancing IVF cells against a skewed embedding distribution); use
  * the sampled trainer when a representative subsample suffices.
  *
  * Deterministic: init = vectors of the k smallest ids, fixed iteration
  * count; centroid arithmetic happens on the driver from exact
  * per-(cell,dim) sums, so results do not depend on partitioning.
  */
object Clustering {

  /** assignments (id, vec, cell, dist); centroids (cell, cvec); exact
    * within-cluster SSE measured against the centroids of each
    * iteration (length = iterations, non-increasing by Lloyd). */
  final case class Model(
      assignments: DataFrame,
      centroids: DataFrame,
      sseByIteration: Seq[Double])

  def kmeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 3): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
      // iterated over `iterations` times — pay the scan once.
      // (r14 measured: per-iteration wall here is driver/stage fixed
      // cost, not task count — a data-derived repartition before the
      // checkpoint bought nothing and added a count + shuffle job.)
      // r15 scale audit: rows × dim × 8 B ≈ 1× the embedding corpus
      // on executor-local disk, read `iterations`+2 times — the one
      // checkpoint whose reuse count justifies it outright; executor
      // loss fails the job (documented trade vs re-scanning parquet
      // per iteration).
      .localCheckpoint()

    // deterministic seed centroids: the k smallest ids (k×dim to driver)
    var centroids: Array[Array[Double]] = base.orderBy(col("id")).limit(k)
      .orderBy(col("id"))
      .select(col("vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(centroids.length == k, s"k-means needs >= $k input rows")
    val dim = centroids.head.length
    val sse = Seq.newBuilder[Double]

    for (_ <- 0 until iterations) {
      // one pass: assign + per-(cell,dim) moments
      val moments = assignByArrays(base, centroids)
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sx2"))
        .collect()
      var iterSse = 0.0
      val next = centroids.map(_.clone())
      moments.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        val n = r.getLong(2); val sx = r.getDouble(3); val sx2 = r.getDouble(4)
        val cv = centroids(c)(d)
        iterSse += sx2 - 2 * cv * sx + n * cv * cv
        next(c)(d) = sx / n // empty cells keep their seed coordinate
      }
      sse += iterSse
      centroids = next
    }
    // final assignment against the post-update centroids
    val cdf = toDf(spark, centroids)
    Model(assignByArrays(base, centroids), cdf, sse.result())
  }

  private def toDf(
      spark: org.apache.spark.sql.SparkSession,
      cs: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cs.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "cvec")
  }

  /** Nearest centroid per row, fully MAP-SIDE (r15, guide §2.4):
    * the k centroids are known driver-side every iteration, so they
    * ride as a LITERAL array-of-arrays and the argmin is a per-row
    * `transform` + `array_min` + first-position lookup — no k×
    * crossJoin expansion and, crucially, no groupBy(id) exchange
    * (the r14 shape shuffled ~(rows × vec) bytes by id once per
    * iteration just to reduce the k candidates back to one row).
    * Tie-break: array_position returns the FIRST index achieving the
    * min, i.e. the lowest cell — identical to the old
    * min(struct(dist, cell)). The distances are the same
    * l2Distance expression over the same doubles, so every (cell,
    * dist) is bit-identical to the join-based form. */
  private def assignByArrays(base: DataFrame,
      cs: Array[Array[Double]]): DataFrame = {
    val carr = array(cs.map(c => lit(c)).toSeq: _*)
    base
      .withColumn("__ds", transform(carr, c => l2Distance(col("vec"), c)))
      .withColumn("dist", array_min(col("__ds")))
      .withColumn("cell",
        (array_position(col("__ds"), col("dist")) - 1).cast("int"))
      .select(col("id"), col("vec"), col("cell"), col("dist"))
  }
}
