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
      val moments = assign(base, toDf(spark, centroids))
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
    Model(assign(base, cdf), cdf, sse.result())
  }

  private def toDf(
      spark: org.apache.spark.sql.SparkSession,
      cs: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cs.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "cvec")
  }

  /** Nearest centroid per row: broadcast cross join + min-struct
    * aggregate (identical plan shape to IvfIndex's assignment — the
    * id×k expansion never shuffles, the argmin happens map-side). */
  private def assign(base: DataFrame, centroids: DataFrame): DataFrame =
    base.crossJoin(broadcast(centroids))
      .withColumn("__d", l2Distance(col("vec"), col("cvec")))
      .groupBy(col("id"))
      .agg(min(struct(col("__d"), col("cell"))).as("__m"),
        first(col("vec")).as("vec"))
      .select(col("id"), col("vec"), col("__m.cell").as("cell"),
        col("__m.__d").as("dist"))
}
