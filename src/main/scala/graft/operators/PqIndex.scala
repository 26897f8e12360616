package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product quantization (PQ) for vector search: split each (L2-
  * normalized) vector into `m` subvectors, k-means each subspace
  * independently, and store per-vector only the m nearest-sub-centroid
  * codes — 64-dim float32 (256 B) compresses to m=8 4-bit codes.
  * Search uses asymmetric distance computation (ADC): the query builds
  * an m×k table of exact subspace distances once, then every corpus
  * vector's distance is m table lookups — no float math per candidate.
  *
  * This is the 100-TB leg of the ANN surface (with [[IvfIndex]] as the
  * cell pre-filter → IVF-PQ, the FAISS/Jegou et al. 2011 design): the
  * code table is ~30× smaller than the raw vectors, so the scan that
  * brute-force cosine cannot afford at scale becomes a cheap
  * integer-indexed pass, and the exact re-rank touches only the top
  * ADC candidates.
  *
  * Determinism mirrors IvfIndex: codebooks train on the smallest
  * `maxTrainRows` ids on the driver (the FAISS bounded-sample recipe),
  * init = first k sample subvectors, fixed Lloyd iterations; encoding
  * ties break on code id through the min-struct order.
  */
object PqIndex {

  /** codes: (id, codes array<int> of length m) — the stored index;
    * codebooks: (sub, code, cvec) broadcastable table. */
  final case class Model(codes: DataFrame, codebooks: DataFrame,
      m: Int, k: Int, dsub: Int,
      metric: VectorDistance.Metric = VectorDistance.Cosine)

  private def subvectors(vec: Column, m: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => slice(vec, j * lit(dsub) + 1, lit(dsub)))

  /** SQUARED L2 — ADC requires squared subspace distances (they sum to
    * the full squared distance; sqrt'd ones don't sum to anything). */
  private def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iterations: Int = 2,
      maxTrainRows: Int = 65536,
      metric: VectorDistance.Metric = VectorDistance.Cosine): Model =
    // ingest-time artifact, memoized like IvfIndex.build (see IndexCache)
    IndexCache.getOrBuild(("pq", corpus.queryExecution.analyzed.canonicalized,
      idCol, vecCol, m, k, iterations, maxTrainRows, metric.name)) {
      buildImpl(corpus, idCol, vecCol, m, k, iterations, maxTrainRows, metric)
    }

  /** Probe/corpus vectors L2-normalize only for scale-invariant
    * metrics (COSINE); EUCLIDEAN/DOT_PRODUCT codebooks train on raw
    * vectors so the ADC sums approximate the raw metric. */
  private def prep(vecCol: Column,
      metric: VectorDistance.Metric): Column =
    if (metric.normalizeAtBuild)
      graft.plans.VectorExpressions.normalize(vecCol)
    else transform(vecCol, x => x.cast("double"))

  /** Per-subspace ADC table entry, oriented so ASCENDING sums are
    * always "closer": squared L2 for COSINE (= 2−2cos on normalized
    * vectors) and EUCLIDEAN; NEGATED sub-dot for DOT/INNER_PRODUCT
    * (subspace dots sum exactly to the full dot product). */
  private def adcEntry(a: Column, b: Column,
      metric: VectorDistance.Metric): Column = metric match {
    case VectorDistance.DotProduct | VectorDistance.InnerProduct =>
      -aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
    case _ => l2Sq(a, b)
  }

  private def buildImpl(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iterations: Int,
      maxTrainRows: Int,
      metric: VectorDistance.Metric): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("id"),
      prep(col(vecCol), metric).as("vec"))

    val train: Array[Array[Double]] = base.orderBy(col("id")).limit(maxTrainRows)
      .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    require(train.length >= k, s"PQ needs >= $k training vectors")
    val dim = train.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m

    // independent Lloyd k-means per subspace, all on the bounded sample
    val books: Seq[(Int, Int, Seq[Double])] = (0 until m).flatMap { sub =>
      val sl = train.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      var cents: Array[Array[Double]] = sl.take(k).map(_.clone())
      for (_ <- 0 until iterations) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        sl.foreach { v =>
          var bestC = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; bestC = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(bestC)(i) += v(i); i += 1 }
          counts(bestC) += 1
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents.zipWithIndex.map { case (cv, code) => (sub, code, cv.toSeq) }
    }
    val codebooks = books.toDF("sub", "code", "cvec")

    // MAP-ONLY encode: the full codebook is tiny (m·k·dsub doubles =
    // the whole model), so it rides into the plan as a literal and
    // each row's m codes are m argmin folds — a pure projection, no
    // explode, no join, no shuffle. The checkpoint of `base` first is
    // load-bearing: without it Catalyst's CollapseProject would
    // re-inline the normalize() subtree into every one of the m·k
    // subspace distances.
    val cbLit = typedLit(
      books.grouped(k).map(_.map(_._3).toSeq).toSeq)
    val baseCp = base.localCheckpoint()
    val codes = baseCp.select(col("id"),
      transform(sequence(lit(0), lit(m - 1)), j => {
        val sv = slice(col("vec"), j * lit(dsub) + 1, lit(dsub))
        aggregate(sequence(lit(0), lit(k - 1)),
          struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
          (acc, c) => {
            val d0 = l2Sq(sv, element_at(element_at(cbLit, j + 1), c + 1))
            when(d0 < acc.getField("d"),
              struct(d0.as("d"), c.as("c"))).otherwise(acc)
          }).getField("c")
      }).as("codes"))
      // an index build materializes its artifact (cluster scale: written
      // out as the PQ-compressed table); localCheckpoint is the local
      // equivalent of build-once/probe-many
      .localCheckpoint()
    Model(codes, codebooks, m, k, dsub, metric)
  }

  /** ADC search: per probe, exact subspace distances to every
    * sub-centroid (an m×k "distance table", assembled into ONE flat
    * array per probe and broadcast), then each corpus vector scores as
    * the sum of m array lookups — a pure per-row expression over the
    * UN-exploded code table. The corpus-scale pass is map-only (scan ×
    * |probes| with no shuffle); the only exchange is the final top-k
    * window. Returns (probe_id, neighbor_id, adc_dist, rank).
    * Distances are squared L2 on normalized vectors = 2 − 2·cosine, so
    * ADC ascending equals cosine descending. */
  def searchAdc(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      topK: Int): DataFrame = {
    val k = model.k
    val p = probes.select(col(probeId).as("probe_id"),
      prep(col(vecCol), model.metric).as("pvec"))
    val psubs = p.select(col("probe_id"),
      posexplode(subvectors(col("pvec"), model.m, model.dsub))
        .as(Seq("sub", "psv")))
    // flat dtab[sub * k + code] per probe (sort_array on (sub, code)
    // structs yields exactly that order)
    val dtabs = psubs.join(model.codebooks, "sub")
      .select(col("probe_id"), col("sub"), col("code"),
        adcEntry(col("psv"), col("cvec"), model.metric).as("pd"))
      .groupBy(col("probe_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("pd")))),
        s => s.getField("pd")).as("dtab"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("id").asc)
    model.codes.crossJoin(broadcast(dtabs))
      .filter(col("id") =!= col("probe_id"))
      .withColumn("adc_dist", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
          (code, i) => element_at(col("dtab"), i * lit(k) + code + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("id").as("neighbor_id"),
        col("adc_dist"), col("rank"))
  }

  /** IVF-PQ: the composed two-level index (FAISS `IVFx,PQy` with
    * by_residual=false) — the IVF coarse quantizer restricts the ADC
    * scan to the `nprobe` nearest cells, PQ codes make that scan a
    * table-lookup pass, and the raw vectors are touched only for the
    * exact re-rank of the shortlist. At 100 TB: cell = partition
    * column of the code table, so a query reads nprobe/k of an
    * already-30×-compressed table.
    *
    * Plan shape: broadcast(centroids) → per-probe cell top-nprobe;
    * broadcast(probe cells + distance tables) joined to the code table
    * filtered by cell — map-side semi-join, no corpus shuffle; one
    * top-k window; rerank join against the raw vectors by id. */
  def searchIvfPq(
      ivf: IvfIndex.Model,
      pq: Model,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probes: DataFrame,
      probeId: String,
      topK: Int,
      nprobe: Int,
      rerankFactor: Int = 4): DataFrame = {
    val k = pq.k
    val p = probes.select(col(probeId).as("probe_id"),
      prep(col(vecCol), pq.metric).as("pvec"))
    // cell selection runs in the IVF's RAW vector space (the quantizer
    // trained un-normalized); only the PQ distance tables use the
    // normalized probe
    val praw0 = probes.select(col(probeId).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("rawv"))
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("__d").asc, col("cell").asc)
    val probeCells = praw0.crossJoin(broadcast(ivf.centroids))
      .withColumn("__d", graft.plans.VectorExpressions
        .l2Distance(col("rawv"), col("cvec")))
      .withColumn("__rn", row_number().over(wc))
      .filter(col("__rn") <= nprobe)
      .select(col("probe_id"), col("cell"))
    val psubs = p.select(col("probe_id"),
      posexplode(subvectors(col("pvec"), pq.m, pq.dsub))
        .as(Seq("sub", "psv")))
    val dtabs = psubs.join(pq.codebooks, "sub")
      .select(col("probe_id"), col("sub"), col("code"),
        adcEntry(col("psv"), col("cvec"), pq.metric).as("pd"))
      .groupBy(col("probe_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("pd")))),
        s => s.getField("pd")).as("dtab"))
    // code table + cell id, restricted to probed cells
    val cells = ivf.assignments.select(col("id"), col("cell"))
    val candidates = pq.codes.join(cells, "id")
      .join(broadcast(probeCells), "cell")
      .filter(col("id") =!= col("probe_id"))
    val wa = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("id").asc)
    val shortlist = candidates.join(broadcast(dtabs), "probe_id")
      .withColumn("adc_dist", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(pq.m - 1)),
          (code, i) => element_at(col("dtab"), i * lit(k) + code + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("__rn", row_number().over(wa))
      .filter(col("__rn") <= topK * rerankFactor)
      .select(col("probe_id"), col("id").as("neighbor_id"))
    val praw = probes.select(col(probeId).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("pvec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("nvec"))
    val wr = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    shortlist.join(cv, "neighbor_id").join(broadcast(praw), "probe_id")
      .withColumn("sim", pq.metric.score(col("pvec"), col("nvec")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** ADC shortlist (rerankFactor × topK candidates) then exact cosine
    * re-rank against the raw vectors — the standard two-stage PQ
    * pipeline: the full corpus is touched only through its codes; raw
    * vectors are fetched for the shortlist alone. */
  def searchRerank(
      model: Model,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probes: DataFrame,
      probeId: String,
      topK: Int,
      rerankFactor: Int = 4): DataFrame = {
    val shortlist = searchAdc(model, probes, probeId, vecCol,
      topK * rerankFactor)
    val p = probes.select(col(probeId).as("probe_id"),
      transform(col(vecCol), x => x.cast("double")).as("pvec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("nvec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    shortlist.join(cv, "neighbor_id").join(broadcast(p), "probe_id")
      .withColumn("sim", model.metric.score(col("pvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
