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
    * assignments (id, vec, cell) — or (id, qvec, cell) int8/int4 codes
    * when scalar-quantized (`VectorQuantizerType` SQ8/SQ4: the stored
    * index is 4–8× smaller; searches dequantize on the fly) — and
    * centroids (cell, cvec). */
  final case class Model(assignments: DataFrame, centroids: DataFrame,
      quant: Option[ScalarQuantize.Params] = None)

  /** Train the coarse quantizer on a BOUNDED sample collected to the
    * driver (the standard IVF recipe — FAISS trains its quantizer on
    * ~10^5 sampled vectors regardless of corpus size), then make ONE
    * distributed assignment pass over the full corpus. The driver only
    * ever holds `maxTrainRows` vectors and the k centroids — at 100 TB
    * the sample stays the same size and the assignment pass is the only
    * corpus-scale job (its output is written with `cell` as a partition
    * column so searches read nprobe/k of the table).
    *
    * Deterministic: sample = smallest `maxTrainRows` ids, init = first k
    * of those, fixed Lloyd iterations, fixed per-cell summation order. */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 2,
      maxTrainRows: Int = 65536,
      quantizerBits: Int = 0): Model =
    // index builds are ingest-time artifacts (see IndexCache): memoized
    // on the corpus' canonical plan + build params, deterministic either
    // way, so a hit returns the identical model a fresh build would
    IndexCache.getOrBuild(("ivf", corpus.queryExecution.analyzed.canonicalized,
      idCol, vecCol, k, iterations, maxTrainRows, quantizerBits)) {
      // DURABLE artifact: assignments (cell-partitioned — nprobe
      // searches read nprobe/k of the files), centroids, and the
      // scalar-quantizer params persist under the corpus table's index
      // store; a fresh process re-registering unchanged data loads
      // with no clustering job (the reference reads its IVF pages from
      // the segment, `IvfPqVectorIndexReader.java`).
      val spark = corpus.sparkSession
      // BUILD path serves the in-memory model it just wrote — a
      // read-back of our own write would pin a SECOND checkpoint of
      // assignments/centroids next to buildImpl's (round-8 shipped
      // that; the doubled resident blocks slowed co-resident queries
      // ~30%, DriftAb round-9). Only a LOAD (fresh process) reads
      // parquet — serve from MEMORY after the one-time load (the r7
      // cost profile): the cell join reads assignments per query, and
      // a per-query parquet scan measured 9x slower on the radius path
      // at the 100x replica (22.8x vs 2.5x growth). The durable
      // artifact remains the source of truth; the checkpoint is
      // JVM-lifetime serving state, like the reference's mmap'd pages.
      var built: Option[Model] = None
      val located = graft.sources.IndexStore.getOrBuild(corpus,
        "vector_ivf", vecCol,
        Seq("v1", idCol, k, iterations, maxTrainRows, quantizerBits)) { d =>
        val m = buildImpl(corpus, idCol, vecCol, k, iterations,
          maxTrainRows, quantizerBits)
        m.assignments.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$d/assignments")
        m.centroids.write.mode("overwrite").parquet(s"$d/centroids")
        m.quant.foreach { q =>
          import spark.implicits._
          Seq((q.bits, q.mins, q.maxs)).toDF("bits", "mins", "maxs")
            .write.mode("overwrite").parquet(s"$d/quant")
        }
        built = Some(m)
      }
      (located, built) match {
        case (_, Some(m)) => m
        case (Some(l), None) =>
          val quant =
            if (quantizerBits > 0) {
              val r = spark.read.parquet(s"${l.dir}/quant").head()
              Some(ScalarQuantize.Params(r.getInt(0),
                r.getSeq[Double](1), r.getSeq[Double](2)))
            } else None
          Model(spark.read.parquet(s"${l.dir}/assignments")
              .localCheckpoint(),
            spark.read.parquet(s"${l.dir}/centroids").localCheckpoint(),
            quant)
        case (None, None) =>
          buildImpl(corpus, idCol, vecCol, k, iterations, maxTrainRows,
            quantizerBits)
      }
    }

  private def buildImpl(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int,
      maxTrainRows: Int,
      quantizerBits: Int): Model = {
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))

    val train: Array[Array[Double]] = base.orderBy(col("id")).limit(maxTrainRows)
      .select(col("vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(train.length >= k, s"IVF needs >= $k training vectors")
    val dim = train.head.length
    var centroids: Array[Array[Double]] = train.take(k).map(_.clone())
    for (_ <- 0 until iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      train.foreach { v =>
        var bestC = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; bestC = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(bestC)(i) += v(i); i += 1 }
        counts(bestC) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    import spark.implicits._
    val centroidDf = centroids.zipWithIndex
      .map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "cvec")
    // an index build SHOULD materialize its artifact: at cluster scale
    // the assignments are written out partitioned by cell; locally
    // localCheckpoint gives the same build-once/probe-many behavior
    // instead of re-clustering per downstream consumer
    val assigned = assign(base, centroidDf)
    if (quantizerBits > 0) {
      // SQ8/SQ4 (VectorQuantizerType): store per-dimension codes, not
      // floats — the materialized index shrinks 4–8×
      val p = ScalarQuantize.train(base, "vec", quantizerBits)
      Model(assigned
        .withColumn("qvec", ScalarQuantize.quantize(col("vec"), p))
        .drop("vec")
        .localCheckpoint(), centroidDf, Some(p))
    } else Model(assigned.localCheckpoint(), centroidDf)
  }

  private def assign(base: DataFrame, centroids: DataFrame): DataFrame =
    // nearest centroid via min-struct aggregate (hash agg, partial
    // map-side) — cheaper than a row_number sort window over the
    // id × k expansion; ties break on cell id through the struct order
    base.crossJoin(broadcast(centroids))
      .withColumn("__d", graft.plans.VectorExpressions
        .l2Distance(col("vec"), col("cvec")))
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
      nprobe: Int): DataFrame =
    search(model, probes, probeId, vecCol, k, nprobe,
      VectorDistance.Cosine)

  /** Cell-probed search under any of the reference's distance
    * functions (`VectorIndexConfig.VectorDistanceFunction`): the cells
    * are an L2 Voronoi partition either way (the standard IVF coarse
    * quantizer — FAISS probes L2 cells for IP/L2/cosine alike); only
    * the exact in-cell re-rank scores by `metric`. `sim` is the
    * metric's score, higher = closer (negated distance for
    * EUCLIDEAN). */
  def search(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      metric: VectorDistance.Metric): DataFrame = {
    val p = probes.select(col(probeId).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("pvec"))
    val wc = Window.partitionBy(col("probe_id")).orderBy(col("__d").asc, col("cell").asc)
    val probeCells = p.crossJoin(broadcast(model.centroids))
      .withColumn("__d", graft.plans.VectorExpressions
        .l2Distance(col("pvec"), col("cvec")))
      .withColumn("__rn", row_number().over(wc))
      .filter(col("__rn") <= nprobe)
      .select(col("probe_id"), col("pvec"), col("cell"))

    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("id").asc)
    // a quantized index scores against the on-the-fly reconstruction
    // (error ≤ half a quantization step per dimension)
    val stored = model.quant
      .map(p => ScalarQuantize.dequantize(col("qvec"), p))
      .getOrElse(col("vec"))
    probeCells.join(model.assignments, "cell")
      .filter(col("probe_id") =!= col("id"))
      .withColumn("sim", metric.score(col("pvec"), stored))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("sim"), col("rank"))
  }

  /** Per-cell covering radius (max L2 distance from the centroid to
    * any member), memoized per model: ~nlist rows, one corpus pass —
    * an ingest-time statistic exactly like the centroids themselves. */
  private def cellRadii(model: Model): DataFrame =
    IndexCache.getOrBuild(("ivfradii",
      model.assignments.queryExecution.analyzed.canonicalized)) {
      model.assignments.join(broadcast(model.centroids), "cell")
        .groupBy(col("cell"))
        .agg(max(graft.plans.VectorExpressions
          .l2Distance(col("vec"), col("cvec"))).as("crad"))
        .localCheckpoint(true)
    }

  /** COMPLETE Euclidean radius search: every id whose vector lies
    * within `radius` of the probe — no approximation, no exhaustion
    * signal needed. Cells are pruned by the triangle inequality
    * (`dist(probe, centroid) − coveringRadius(cell) > radius` ⟹ no
    * member can qualify); surviving cells re-verify exactly, so the
    * result is provably the full in-radius set — the contract
    * `VectorRadiusFilterOperator` demands ("a radius predicate must
    * return ALL matching docs"). Quantized models are rejected: the
    * stored codes only reconstruct approximate vectors, which cannot
    * promise the exact-set contract. */
  def searchRadiusL2(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      radius: Double): DataFrame = {
    require(model.quant.isEmpty,
      "L2 radius requires an unquantized IVF_FLAT index (exact-set contract)")
    val p = probes.select(col(probeId).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("pvec"))
    val probeCells = p.crossJoin(broadcast(
        model.centroids.join(cellRadii(model), "cell")))
      .withColumn("__d", graft.plans.VectorExpressions
        .l2Distance(col("pvec"), col("cvec")))
      .filter(col("__d") <= lit(radius) + col("crad"))
      .select(col("probe_id"), col("pvec"), col("cell"))
    probeCells.join(model.assignments, "cell")
      .withColumn("dist", graft.plans.VectorExpressions
        .l2Distance(col("pvec"), col("vec")))
      .filter(col("dist") <= radius)
      .select(col("probe_id"), col("id").as("neighbor_id"),
        negate(col("dist")).as("sim"))
  }
}
