package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into cells; a query probes only the
  * `nprobe` nearest cells and re-ranks exactly inside them.
  *
  * Complements [[Similarity.lshTopK]] as the second scale path for the
  * north-star ANN requirement: at 100 TB the cell id becomes a partition
  * column of the embedding table, so a query reads nprobe/k of the data.
  *
  * Training is deterministic (centroid init = k smallest ids, fixed
  * Lloyd iterations) and fully distributed: assignment is a broadcast
  * cross join against k centroids; centroid recomputation is
  * posexplode + per-(cell, dim) mean — never collects vectors to the
  * driver (only the k centroid arrays).
  */
object IvfIndex {

  /** (cell assignments, centroids) — both plain DataFrames:
    * assignments (id, vec, cell), centroids (cell, cvec). */
  final case class Model(assignments: DataFrame, centroids: DataFrame)

  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 2): Model = {
    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))

    var centroids = base.orderBy(col("id")).limit(k)
      .select((row_number().over(Window.orderBy(col("id"))) - 1).as("cell"),
        col("vec").as("cvec"))

    var assigned: DataFrame = null
    for (_ <- 0 until iterations) {
      assigned = assign(base, centroids)
      // new centroid = per-dimension mean over the cell's members
      val dims = assigned.select(col("cell"), posexplode(col("vec")).as(Seq("i", "x")))
      centroids = dims.groupBy(col("cell"), col("i")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("pairs"))
        .select(col("cell"), transform(col("pairs"), p => p.getField("m")).as("cvec"))
    }
    Model(assign(base, centroids), centroids)
  }

  private def assign(base: DataFrame, centroids: DataFrame): DataFrame =
    // nearest centroid via min-struct aggregate (hash agg, partial
    // map-side) — cheaper than a row_number sort window over the
    // id × k expansion; ties break on cell id through the struct order
    base.crossJoin(broadcast(centroids))
      .withColumn("__d", l2Distance(col("vec"), col("cvec")))
      .groupBy(col("id"))
      .agg(min(struct(col("__d"), col("cell"))).as("__m"),
        first(col("vec")).as("vec"))
      .select(col("id"), col("vec"), col("__m.cell").as("cell"))

  /** Probe the nprobe nearest cells per query vector, exact cosine
    * re-rank, top-k. Returns (probe_id, neighbor_id, sim, rank). */
  def search(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val p = probes.select(col(probeId).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("pvec"))
    val wc = Window.partitionBy(col("probe_id")).orderBy(col("__d").asc, col("cell").asc)
    val probeCells = p.crossJoin(broadcast(model.centroids))
      .withColumn("__d", l2Distance(col("pvec"), col("cvec")))
      .withColumn("__rn", row_number().over(wc))
      .filter(col("__rn") <= nprobe)
      .select(col("probe_id"), col("pvec"), col("cell"))

    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("id").asc)
    probeCells.join(model.assignments, "cell")
      .filter(col("probe_id") =!= col("id"))
      .withColumn("sim", cosineSimilarity(col("pvec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("sim"), col("rank"))
  }
}
