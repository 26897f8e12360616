package graft.operators

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW (Hierarchical Navigable Small World, Malkov & Yashunin 2016)
  * graph ANN — the industry-standard recall/latency profile the
  * reference builds per segment at ingest
  * (`pinot-segment-local/.../creator/impl/vector/HnswVectorIndexCreator.java`,
  * queried by `VectorSimilarityFilterOperator.java`). The Spark-native
  * shape mirrors the reference's per-SEGMENT graphs exactly: the
  * corpus is hash-sharded, ONE graph is built per shard executor-side
  * (`mapGroups` — vectors never visit the driver), each graph is
  * serialized to a blob row and the artifact is an ingest-time
  * memoized DataFrame ([[IndexCache]] pattern, localCheckpoint'd).
  * A query fans out to every shard (exactly like Lucene searching
  * every segment's HNSW), runs an O(ef·log n) beam search inside each
  * blob, and merges per-shard candidates with one top-k window — at
  * 100 TB the shard count scales with the corpus, each graph stays
  * executor-sized, and query wall grows with shard COUNT, not corpus
  * size, i.e. sub-linear per shard.
  *
  * Determinism: insertion order is ascending id within a shard and
  * node levels derive from a splitmix of the id — a rebuilt index is
  * byte-identical, so recall verdicts are stable across runs.
  * COSINE indexes L2-normalize at build (similarity = dot);
  * INNER_PRODUCT/DOT_PRODUCT score raw dot products and EUCLIDEAN
  * negated L2 distances (`VectorIndexConfig.VectorDistanceFunction`),
  * so unnormalized-vector top-k sets are expressible per metric.
  */
object HnswIndex {

  /** (shard, blob) rows — the ingest-time artifact. */
  final case class Model(shards: DataFrame, m: Int, efConstruction: Int,
      metric: VectorDistance.Metric = VectorDistance.Cosine)

  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 16,
      efConstruction: Int = 100,
      nShards: Int = 8,
      metric: VectorDistance.Metric = VectorDistance.Cosine): Model =
    IndexCache.getOrBuild(("hnsw",
      corpus.queryExecution.analyzed.canonicalized,
      idCol, vecCol, m, efConstruction, nShards, metric.name)) {
      // DURABLE shard blobs (the reference persists the HNSW graph in
      // the segment at ingest, `HnswVectorIndexCreator.java`, and only
      // reads it at query time): graph construction is the expensive
      // step, so a fresh process re-registering unchanged data loads
      // the byte-exact blobs with no build. Derived corpora without a
      // file fingerprint keep the JVM-lifetime localCheckpoint.
      // The BUILD path serves the in-memory model it just wrote (the
      // artifact is a byte-copy of it) instead of reading its own
      // write back: a read-back would pin a SECOND checkpoint of every
      // blob next to buildImpl's — round-8 shipped that double
      // residency and its leaked build-side blocks measurably slowed
      // CO-RESIDENT queries (bm25/classifier +30% in a shared session,
      // DriftAb round-9). Only a LOAD (fresh process, artifact hit)
      // reads parquet, and pins exactly one copy.
      var built: Option[Model] = None
      val located = graft.sources.IndexStore.getOrBuild(corpus,
        "vector_hnsw", vecCol,
        Seq("v1", idCol, m, efConstruction, nShards, metric.name)) { d =>
        val mm = buildImpl(corpus, idCol, vecCol, m, efConstruction,
          nShards, metric)
        mm.shards.write.mode("overwrite").parquet(s"$d/shards")
        built = Some(mm)
      }
      (located, built) match {
        case (_, Some(mm)) => mm
        case (Some(l), None) =>
          // blob rows are shard-count-sized; pin them in memory so
          // every query joins against blocks, not the filesystem
          Model(corpus.sparkSession.read.parquet(s"${l.dir}/shards")
              .localCheckpoint(),
            m, efConstruction, metric)
        case (None, None) =>
          buildImpl(corpus, idCol, vecCol, m, efConstruction, nShards,
            metric)
      }
    }

  private def buildImpl(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      efConstruction: Int,
      nShards: Int,
      metric: VectorDistance.Metric): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val metricId = VectorDistance.id(metric)
    val base = corpus.select(
      col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("float")).as("vec"),
      pmod(xxhash64(col(idCol)), lit(nShards)).cast("int").as("shard"))
      .as[(Long, Seq[Float], Int)]
    val blobs = base.groupByKey(_._3)
      .mapGroups { (shard, rows) =>
        // a shard is one segment's worth of vectors — executor-sized
        // by construction (nShards scales with the corpus)
        val sorted = rows.map(r => (r._1, r._2.toArray)).toArray
          .sortBy(_._1)
        val g = new HnswGraph(sorted.head._2.length, m, efConstruction,
          metricId)
        sorted.foreach { case (id, v) => g.add(id, v) }
        (shard, g.toBytes)
      }(Encoders.tuple(Encoders.scalaInt, Encoders.BINARY))
      .toDF("shard", "blob")
    Model(blobs.localCheckpoint(), m, efConstruction, metric)
  }

  /** A same-id candidate counts as "self" only when it is also
    * vector-IDENTICAL to the probe (normalized dot ≈ 1): an in-corpus
    * probe's own row clears this, an out-of-corpus probe that merely
    * shares a corpus id does not — its same-id nearest neighbor has
    * sim < 1 and is kept. Float-dot error is ~dim·1e-7, far below
    * this margin. */
  private val SelfSimFloor = 1.0 - 1e-4

  /** Beam-search every shard graph for each probe, merge to global
    * top-k. Returns (probe_id, neighbor_id, sim, rank). */
  /** @param excludeSelf drop the candidate that IS the probe's own row —
    *   same id AND vector-identical (sim ≈ 1). Safe for out-of-corpus
    *   probes whose id space overlaps corpus ids: a same-id candidate
    *   with a different vector is a legitimate neighbor and is kept. */
  def search(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      k: Int,
      ef: Int = 64,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val p = probes.select(col(probeId).cast("long").as("probe_id"),
      transform(col(vecCol), x => x.cast("float")).as("pvec"))
    // bounded probe side broadcast against the S shard-blob rows; rows
    // arrive blob-major so each task decodes a graph once per run of
    // identical blobs (per-task memo)
    val candidates = model.shards.crossJoin(broadcast(p))
      .select(col("shard"), col("blob"), col("probe_id"), col("pvec"))
      .as[(Int, Array[Byte], Long, Seq[Float])]
      .mapPartitions { it =>
        var lastShard = Int.MinValue
        var graph: HnswGraph = null
        it.flatMap { case (shard, blob, pid, pvec) =>
          if (shard != lastShard || graph == null) {
            graph = HnswGraph.fromBytes(blob)
            lastShard = shard
          }
          // k+1 per shard when excluding self: an in-corpus probe finds
          // itself at rank 1 and the filter below must not short the count
          val kk = if (excludeSelf) k + 1 else k
          graph.search(pvec.toArray, kk, math.max(ef, kk))
            .map { case (nid, sim) => (pid, nid, sim.toDouble) }
        }
      }
      .toDF("probe_id", "neighbor_id", "sim")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val kept =
      if (excludeSelf) {
        // the vector-identity refinement (self-score ≈ 1) only holds
        // for cosine; other metrics' self-scores are row-dependent, so
        // they exclude by id alone
        if (model.metric == VectorDistance.Cosine)
          candidates.filter(col("probe_id") =!= col("neighbor_id") ||
            col("sim") < lit(SelfSimFloor))
        else candidates.filter(col("probe_id") =!= col("neighbor_id"))
      } else candidates
    kept
      .withColumn("sim", round(col("sim"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Distributed approximate radius search: every shard graph expands
    * within the similarity threshold, results union across shards
    * (no global top-k exchange — a radius result is a SET). Sims are
    * exact, unrounded. Returns (probe_id, neighbor_id, sim). */
  def searchRadius(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      minSim: Double,
      limitPerShard: Int): DataFrame =
    searchRadiusWithStatus(model, probes, probeId, vecCol, minSim,
      limitPerShard)
      .filter(col("neighbor_id").isNotNull)
      .select(col("probe_id"), col("neighbor_id"), col("sim"))

  /** [[searchRadius]] plus a per-(shard, probe) completeness signal:
    * `exhausted` is true only when that shard's expansion DRAINED its
    * frontier below the cap — the result provably contains every
    * in-radius node reachable in the shard graph. A shard-probe pair
    * that terminated early (patience or `limitPerShard`) reports
    * `exhausted = false`, and a pair with no in-radius hits still emits
    * one null-neighbor marker row so the signal survives empty results.
    * Callers that promised exact radius semantics (the facade's indexed
    * VECTOR_SIMILARITY_RADIUS path) must fall back to the exact scan
    * when any row reports `exhausted = false`. */
  def searchRadiusWithStatus(
      model: Model,
      probes: DataFrame,
      probeId: String,
      vecCol: String,
      minSim: Double,
      limitPerShard: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val p = probes.select(col(probeId).cast("long").as("probe_id"),
      transform(col(vecCol), x => x.cast("float")).as("pvec"))
    model.shards.crossJoin(broadcast(p))
      .select(col("shard"), col("blob"), col("probe_id"), col("pvec"))
      .as[(Int, Array[Byte], Long, Seq[Float])]
      .mapPartitions { it =>
        var lastShard = Int.MinValue
        var graph: HnswGraph = null
        it.flatMap { case (shard, blob, pid, pvec) =>
          if (shard != lastShard || graph == null) {
            graph = HnswGraph.fromBytes(blob)
            lastShard = shard
          }
          val (hits, exhausted) = graph.searchRadius(
            pvec.toArray, minSim.toFloat, limitPerShard)
          if (hits.isEmpty)
            Seq((pid, None: Option[Long], None: Option[Double], exhausted))
          else hits.map { case (nid, sim) =>
            (pid, Some(nid), Some(sim.toDouble), exhausted)
          }
        }
      }
      .toDF("probe_id", "neighbor_id", "sim", "exhausted")
  }
}

/** One shard's in-memory HNSW graph. Layered proximity graph: node
  * levels ~ geometric(1/ln M); greedy descent through upper layers,
  * best-first beam (ef candidates) at each construction layer and at
  * layer 0 for queries. */
final class HnswGraph(val dim: Int, val m: Int, val efConstruction: Int,
    val metric: Byte = VectorDistance.id(VectorDistance.Cosine)) {
  import HnswGraph._

  private val mL = 1.0 / math.log(m.toDouble)
  private[operators] val ids = new ArrayBuffer[Long]()
  private[operators] val vecs = new ArrayBuffer[Array[Float]]()
  private[operators] val levels = new ArrayBuffer[Int]()
  // links(node)(level) = neighbor node indices
  private[operators] val links = new ArrayBuffer[Array[ArrayBuffer[Int]]]()
  private[operators] var entry: Int = -1
  private[operators] var maxLevel: Int = -1

  def size: Int = ids.length

  /** Deterministic level draw from the id (splitmix64 → U(0,1]). */
  private def levelFor(id: Long): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11) + 1).toDouble / (1L << 53).toDouble
    math.floor(-math.log(u) * mL).toInt
  }

  @inline private def dot(a: Array[Float], b: Array[Float]): Float = {
    var s = 0f
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Internal comparison score, higher = closer: dot for COSINE
    * (vectors normalized at add) and INNER/DOT_PRODUCT (raw), negated
    * SQUARED L2 for EUCLIDEAN (monotone with the distance, no sqrt in
    * the hot loop). [[emitScore]] converts to the API scale. */
  @inline private def score(a: Array[Float], b: Array[Float]): Float =
    if (metric == 2) {
      var s = 0f
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s -= d * d; i += 1 }
      s
    } else dot(a, b)

  /** API-scale score: EUCLIDEAN emits the negated TRUE distance so the
    * graph's output matches the Column-level metric score. */
  @inline private def emitScore(s: Float): Float =
    if (metric == 2) -math.sqrt(-s.toDouble).toFloat else s

  @inline private def maybeNormalize(v: Array[Float]): Array[Float] =
    if (metric == 0) normalize(v) else v

  private def normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n == 0) 0f else (1.0 / math.sqrt(n)).toFloat
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Best-first beam at one layer: returns up to ef (node, sim) pairs,
    * highest similarity first. */
  private def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int,
      level: Int): ArrayBuffer[(Int, Float)] = {
    val visited = new java.util.HashSet[Int]()
    // candidates: best (highest sim) first; results: worst first so the
    // head is the eviction point
    val cand = new java.util.PriorityQueue[(Int, Float)](
      (a: (Int, Float), b: (Int, Float)) => java.lang.Float.compare(b._2, a._2))
    val res = new java.util.PriorityQueue[(Int, Float)](
      (a: (Int, Float), b: (Int, Float)) => java.lang.Float.compare(a._2, b._2))
    eps.foreach { ep =>
      if (visited.add(ep)) {
        val s = score(q, vecs(ep))
        cand.add((ep, s))
        res.add((ep, s))
        if (res.size > ef) res.poll()
      }
    }
    var done = false
    while (!done && !cand.isEmpty) {
      val (c, cs) = cand.poll()
      if (res.size >= ef && cs < res.peek()._2) done = true
      else {
        val nbrs = links(c)(level)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (visited.add(nb)) {
            val s = score(q, vecs(nb))
            if (res.size < ef || s > res.peek()._2) {
              cand.add((nb, s))
              res.add((nb, s))
              if (res.size > ef) res.poll()
            }
          }
          i += 1
        }
      }
    }
    val out = new ArrayBuffer[(Int, Float)](res.size)
    while (!res.isEmpty) out += res.poll()
    // res drained worst-first → reverse for best-first
    val rev = out.reverse
    rev
  }

  def add(id: Long, rawVec: Array[Float]): Unit = {
    val v = maybeNormalize(rawVec)
    val l = levelFor(id)
    val node = ids.length
    ids += id
    vecs += v
    levels += l
    links += Array.fill(l + 1)(new ArrayBuffer[Int]())
    if (entry == -1) {
      entry = node
      maxLevel = l
      return
    }
    var ep = entry
    // greedy descent through layers above l
    var lc = maxLevel
    while (lc > l) {
      var improved = true
      while (improved) {
        improved = false
        val nbrs = links(ep)(lc)
        var best = score(v, vecs(ep))
        var i = 0
        while (i < nbrs.length) {
          val s = score(v, vecs(nbrs(i)))
          if (s > best) { best = s; ep = nbrs(i); improved = true }
          i += 1
        }
      }
      lc -= 1
    }
    // connect at each layer from min(maxLevel, l) down to 0
    var epList: Seq[Int] = Seq(ep)
    lc = math.min(maxLevel, l)
    while (lc >= 0) {
      val w = searchLayer(v, epList, efConstruction, lc)
      val mMax = if (lc == 0) 2 * m else m
      val selected = w.take(m).map(_._1)
      selected.foreach { nb =>
        links(node)(lc) += nb
        val back = links(nb)(lc)
        back += node
        if (back.length > mMax) {
          // prune to the mMax closest of nb's neighbors
          val nv = vecs(nb)
          val kept = back.map(x => (x, score(nv, vecs(x))))
            .sortBy(-_._2).take(mMax).map(_._1)
          back.clear()
          back ++= kept
        }
      }
      epList = w.map(_._1).toSeq
      lc -= 1
    }
    if (l > maxLevel) {
      entry = node
      maxLevel = l
    }
  }

  /** Query: greedy descent to layer 1, beam ef at layer 0, top-k
    * (id, cosine) pairs. */
  def search(rawQ: Array[Float], k: Int, ef: Int): Seq[(Long, Float)] = {
    if (entry == -1) return Seq.empty
    val q = maybeNormalize(rawQ)
    var ep = entry
    var lc = maxLevel
    while (lc > 0) {
      var improved = true
      while (improved) {
        improved = false
        val nbrs = links(ep)(lc)
        var best = score(q, vecs(ep))
        var i = 0
        while (i < nbrs.length) {
          val s = score(q, vecs(nbrs(i)))
          if (s > best) { best = s; ep = nbrs(i); improved = true }
          i += 1
        }
      }
      lc -= 1
    }
    searchLayer(q, Seq(ep), math.max(ef, k), 0)
      .take(k)
      .map { case (node, sim) => (ids(node), emitScore(sim)) }
      .toSeq
  }

  /** Approximate radius search (`ApproximateRadiusVectorIndexReader
    * .getDocIdsWithinApproximateRadius` analog): all nodes with
    * cosine similarity >= `minSim`, up to `limit`, found by greedy
    * descent + layer-0 expansion from in-radius nodes (plus a bounded
    * patience of near-miss expansions to bridge graph gaps).
    * Similarities are EXACT dot products over normalized vectors, so
    * every returned node genuinely clears the threshold — the
    * approximation is only possible recall loss, as in the reference
    * (which re-checks candidates against the forward index anyway).
    *
    * Returns (hits, exhausted). `exhausted = true` means the frontier
    * DRAINED below the cap: every in-radius node reachable in this
    * graph is in the result (complete, not approximate). Shards up to
    * [[HnswGraph.ExhaustiveRadiusLimit]] nodes never patience-stop, so
    * their radius answers are always complete; larger shards stop after
    * a patience that scales with graph and result size and report
    * `exhausted = false` so callers can fall back to an exact scan
    * instead of silently losing recall. */
  def searchRadius(rawQ: Array[Float], minSim: Float,
      limit: Int): (Seq[(Long, Float)], Boolean) = {
    if (entry == -1) return (Seq.empty, true)
    // the expansion is metric-generic — it thresholds the metric's
    // SCORE (higher = closer), so cosine radii pass minSim = 1−t and
    // Euclidean radii pass minSim = −t (negated distance). INNER
    // product stays rejected: its scores are magnitude-unbounded, so a
    // "radius" has no distance semantics to promise
    require(metric == 0 || metric == 2,
      "searchRadius thresholds are distance-scaled (cosine or L2); " +
        "inner-product indexes must use the exact scan path")
    // the INTERNAL Euclidean score is the negated SQUARED distance
    // (no sqrt in the hot loop); the caller's minSim is on the
    // API scale (negated true distance), so square the bound once.
    // Squaring discards the SIGN: a positive minSim means the caller
    // asked for dist <= -|t| — satisfiable by nothing (distances are
    // non-negative), so answer empty-and-complete instead of folding
    // it onto the |t| ball.
    if (metric == 2 && minSim > 0f) return (Seq.empty, true)
    val minInternal =
      if (metric == 2) -(minSim * minSim) else minSim
    val q = maybeNormalize(rawQ)
    var ep = entry
    var lc = maxLevel
    while (lc > 0) {
      var improved = true
      while (improved) {
        improved = false
        val nbrs = links(ep)(lc)
        var best = score(q, vecs(ep))
        var i = 0
        while (i < nbrs.length) {
          val s = score(q, vecs(nbrs(i)))
          if (s > best) { best = s; ep = nbrs(i); improved = true }
          i += 1
        }
      }
      lc -= 1
    }
    val visited = new java.util.BitSet(ids.length)
    // max-heap on similarity: expand most-promising first
    val cand = scala.collection.mutable.PriorityQueue.empty[(Float, Int)](
      Ordering.by(_._1))
    val out = ArrayBuffer[(Long, Float)]()
    def push(node: Int): Unit =
      if (!visited.get(node)) {
        visited.set(node)
        cand.enqueue((score(q, vecs(node)), node))
      }
    push(ep)
    var misses = 0
    // small graphs drain fully (exact answers, bounded in-memory work);
    // large ones use a patience that grows with graph + result size so
    // below-threshold bridges to further in-radius pockets survive
    val exhaustive = ids.length <= HnswGraph.ExhaustiveRadiusLimit
    def patience: Int =
      if (exhaustive) Int.MaxValue
      else math.max(64, math.max(2 * out.length,
        math.ceil(math.sqrt(ids.length.toDouble)).toInt))
    while (cand.nonEmpty && out.length < limit && misses < patience) {
      val (sim, node) = cand.dequeue()
      if (sim >= minInternal) {
        out += ((ids(node), emitScore(sim)))
        misses = 0
      } else misses += 1
      val nbrs = links(node)(0)
      var i = 0
      while (i < nbrs.length) { push(nbrs(i)); i += 1 }
    }
    // a drained frontier means every reachable node was evaluated —
    // complete even if the hit count landed exactly on the cap
    (out.toSeq, cand.isEmpty)
  }

  /** Shard blob: header + ids + levels + vectors + adjacency. */
  def toBytes: Array[Byte] = {
    val n = ids.length
    var adjInts = 0
    links.foreach(perLevel => perLevel.foreach(l => adjInts += 1 + l.length))
    val bb = ByteBuffer.allocate(29 + n * (8 + 1 + 4 * dim) + 4 * adjInts)
    bb.putInt(Magic)
    bb.putInt(dim)
    bb.putInt(m)
    bb.putInt(n)
    bb.putInt(entry)
    bb.putInt(maxLevel)
    bb.putInt(efConstruction)
    bb.put(metric)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); i += 1 }
    i = 0
    while (i < n) { bb.put(levels(i).toByte); i += 1 }
    i = 0
    while (i < n) {
      val v = vecs(i)
      var j = 0
      while (j < dim) { bb.putFloat(v(j)); j += 1 }
      i += 1
    }
    i = 0
    while (i < n) {
      val perLevel = links(i)
      var l = 0
      while (l < perLevel.length) {
        val nbrs = perLevel(l)
        bb.putInt(nbrs.length)
        var j = 0
        while (j < nbrs.length) { bb.putInt(nbrs(j)); j += 1 }
        l += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }
}

object HnswGraph {
  val Magic = 0x484e5357 // "HNSW"

  /** Shards at or below this node count answer radius searches by full
    * frontier drain — complete results, ~64Ki in-memory dot products
    * worst case. Above it the patience heuristic applies and results
    * carry `exhausted = false` when it fires. */
  val ExhaustiveRadiusLimit = 65536

  def fromBytes(bytes: Array[Byte]): HnswGraph = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, "not an HNSW shard blob")
    val dim = bb.getInt()
    val m = bb.getInt()
    val n = bb.getInt()
    val entry = bb.getInt()
    val maxLevel = bb.getInt()
    val efC = bb.getInt()
    val metric = bb.get()
    val g = new HnswGraph(dim, m, efC, metric)
    var i = 0
    while (i < n) { g.ids += bb.getLong(); i += 1 }
    i = 0
    while (i < n) { g.levels += bb.get().toInt; i += 1 }
    i = 0
    while (i < n) {
      val v = new Array[Float](dim)
      var j = 0
      while (j < dim) { v(j) = bb.getFloat(); j += 1 }
      g.vecs += v
      i += 1
    }
    i = 0
    while (i < n) {
      val perLevel = Array.fill(g.levels(i) + 1)(new ArrayBuffer[Int]())
      var l = 0
      while (l < perLevel.length) {
        val cnt = bb.getInt()
        var j = 0
        while (j < cnt) { perLevel(l) += bb.getInt(); j += 1 }
        l += 1
      }
      g.links += perLevel
      i += 1
    }
    g.entry = entry
    g.maxLevel = maxLevel
    g
  }
}
