package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{HnswGraph, HnswIndex}

/** HNSW graph ANN: in-memory recall vs brute force, blob round-trip,
  * deterministic rebuild, and the distributed shard path. */
class HnswSpec extends SparkSpec {

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  private def randomVecs(n: Int, dim: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  test("graph search recall >= 0.9 vs brute-force top-10 (2000 × 32d)") {
    val vs = randomVecs(2000, 32, 42)
    val g = new HnswGraph(32, 16, 100)
    vs.zipWithIndex.foreach { case (v, i) => g.add(i.toLong, v) }
    val rnd = new scala.util.Random(1)
    var hits = 0
    var total = 0
    for (_ <- 0 until 20) {
      val qi = rnd.nextInt(vs.length)
      val exact = vs.indices.filter(_ != qi)
        .sortBy(j => -cosine(vs(qi), vs(j))).take(10).toSet
      val got = g.search(vs(qi), 11, 64).map(_._1.toInt).filter(_ != qi)
        .take(10).toSet
      hits += exact.intersect(got).size
      total += 10
    }
    assert(hits.toDouble / total >= 0.9, s"recall ${hits.toDouble / total}")
  }

  test("blob round-trips to an identical graph (byte-exact)") {
    val vs = randomVecs(500, 16, 7)
    val g = new HnswGraph(16, 8, 60)
    vs.zipWithIndex.foreach { case (v, i) => g.add(100L + i, v) }
    val bytes = g.toBytes
    val back = HnswGraph.fromBytes(bytes)
    assert(back.toBytes.sameElements(bytes))
    // identical answers after the round trip
    val q = vs(3)
    assert(back.search(q, 5, 32) == g.search(q, 5, 32))
  }

  test("rebuild is deterministic (same insertion order, same levels)") {
    val vs = randomVecs(300, 16, 9)
    def build(): Array[Byte] = {
      val g = new HnswGraph(16, 8, 60)
      vs.zipWithIndex.foreach { case (v, i) => g.add(i.toLong, v) }
      g.toBytes
    }
    assert(build().sameElements(build()))
  }

  test("in-corpus probes still receive a full k neighbors (self excluded)") {
    val t = Tables(spark, sf)
    val probes = t.embeddings.filter(col("vec_id") < 3)
    val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
      m = 16, efConstruction = 100, nShards = 1) // worst case: one shard
    val counts = HnswIndex.search(model, probes, "vec_id", "embedding",
        k = 5, ef = 64)
      .groupBy(col("probe_id")).count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) == 5),
      counts.mkString(","))
  }

  test("distributed shard path finds the brute-force neighbors") {
    val t = Tables(spark, sf)
    val probes = t.embeddings.filter(col("vec_id") < 3)
    val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
      m = 16, efConstruction = 100, nShards = 4)
    val got = HnswIndex.search(model, probes, "vec_id", "embedding",
      k = 5, ef = 64)
      .select("probe_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (p, rows) =>
        p -> rows.map(_.getLong(1)).toSet
      }
    val all = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val pv = all.filter(_._1 < 3)
    pv.foreach { case (pid, v) =>
      val exact = all.filter(_._1 != pid)
        .sortBy { case (cid, cv) => (-cosine(v, cv), cid) }
        .take(5).map(_._1).toSet
      assert(exact.intersect(got(pid)).size >= 4,
        s"probe $pid: got ${got(pid)}, exact $exact")
    }
  }

  test("approximate radius search: no false positives, high recall, cap honored") {
    val t = Tables(spark, sf)
    val probes = t.embeddings.filter(col("vec_id") === 0)
    val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
      m = 16, efConstruction = 100, nShards = 4)
    val minSim = 0.2
    val got = HnswIndex.searchRadius(model, probes, "vec_id", "embedding",
      minSim, limitPerShard = 10000).collect()
    // every returned sim genuinely clears the threshold (exact dots)
    assert(got.forall(_.getDouble(2) >= minSim - 1e-6))
    val all = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val pv = all.find(_._1 == 0L).get._2
    val exact = all.filter { case (_, v) => cosine(pv, v) >= minSim }
      .map(_._1).toSet
    val gotIds = got.map(_.getLong(1)).toSet
    assert(gotIds.subsetOf(exact + 0L),
      s"false positives: ${gotIds -- exact}")
    assert(exact.nonEmpty &&
      gotIds.intersect(exact).size * 10 >= exact.size * 9,
      s"recall < 0.9: ${gotIds.intersect(exact).size}/${exact.size}")
    // the per-shard cap bounds the result
    val capped = HnswIndex.searchRadius(model, probes, "vec_id",
      "embedding", minSim, limitPerShard = 1).collect()
    assert(capped.length <= 4) // nShards = 4
    // ... and a capped shard self-reports incomplete (exhausted=false),
    // the signal the facade's indexed radius path falls back on
    val status = HnswIndex.searchRadiusWithStatus(model, probes, "vec_id",
      "embedding", minSim, limitPerShard = 1).collect()
    assert(status.exists(!_.getBoolean(3)),
      "limit-terminated shard must report exhausted=false")
    // an uncapped search over executor-sized shards drains fully:
    // complete by construction, so every row reports exhausted=true
    val full = HnswIndex.searchRadiusWithStatus(model, probes, "vec_id",
      "embedding", minSim, limitPerShard = 10000).collect()
    assert(full.nonEmpty && full.forall(_.getBoolean(3)))
  }

  test("graph radius search reports exhaustion honestly") {
    val vs = randomVecs(500, 16, 11)
    val g = new HnswGraph(16, 8, 60)
    vs.zipWithIndex.foreach { case (v, i) => g.add(i.toLong, v) }
    // generous limit on a small graph: full drain, complete answer
    val (hits, done) = g.searchRadius(vs(0), 0.2f, 10000)
    assert(done, "small graph must drain its frontier")
    assert(hits.nonEmpty)
    // a hit-count cap stops early and must say so
    val (_, capped) = g.searchRadius(vs(0), -1.0f, 3)
    assert(!capped, "limit-stopped search must report exhausted=false")
  }

  test("L2 radius with a negative distance threshold matches nothing") {
    // API scale for Euclidean is NEGATED distance: minSim = -t. A
    // positive minSim means dist <= -|t| -- unsatisfiable. Squaring
    // the bound without the sign guard would fold it onto the |t|
    // ball and return every point within |t|.
    val vs = randomVecs(200, 8, 7)
    val g = new HnswGraph(8, 8, 60,
      graft.operators.VectorDistance.id(graft.operators.VectorDistance.Euclidean))
    vs.zipWithIndex.foreach { case (v, i) => g.add(i.toLong, v) }
    // sanity: the mirrored positive threshold DOES match (dist <= 5)
    val (some, _) = g.searchRadius(vs(0), -5.0f, 10000)
    assert(some.nonEmpty)
    val (hits, done) = g.searchRadius(vs(0), 5.0f, 10000)
    assert(hits.isEmpty, s"dist <= -5 matched ${hits.size} points")
    assert(done, "the empty answer is complete, not a fallback signal")
  }

  test("out-of-corpus probe sharing a corpus id keeps its true neighbor") {
    val t = Tables(spark, sf)
    val spk = spark
    import spk.implicits._
    val model = HnswIndex.build(t.embeddings, "vec_id", "embedding",
      m = 16, efConstruction = 100, nShards = 4)
    // probe id 0 is NOT row 0 of the corpus: its vector is corpus row
    // 0's vector with one component nudged, so the true nearest
    // neighbor is corpus id 0 — same id as the probe, different vector
    val v0 = t.embeddings.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<float>")).collect()
      .head.getSeq[Float](0).toArray
    val nudged = v0.clone()
    nudged(0) = nudged(0) + 0.05f
    val probes = Seq((0L, nudged.toSeq)).toDF("vec_id", "embedding")
    val got = HnswIndex.search(model, probes, "vec_id", "embedding",
      k = 1, ef = 64).collect()
    assert(got.length == 1 && got.head.getLong(1) == 0L,
      s"expected corpus id 0 as nearest, got ${got.mkString(",")}")
    // while a genuinely identical same-id vector (the probe's own row,
    // when probing in-corpus) is still excluded
    val inCorpus = t.embeddings.filter(col("vec_id") === 0)
    val self = HnswIndex.search(model, inCorpus, "vec_id", "embedding",
      k = 3, ef = 64).collect()
    assert(self.forall(_.getLong(1) != 0L),
      s"in-corpus probe must not return itself: ${self.mkString(",")}")
  }
}
