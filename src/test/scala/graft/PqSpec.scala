package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.PqIndex
import graft.plans.VectorExpressions

/** PqIndex: code-shape invariants, ADC sanity on separated clusters,
  * and exact agreement of searchRerank with brute force when the ADC
  * shortlist covers the whole corpus. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int, nClusters: Int, seed: Int) = {
    val rnd = new Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian() * 5)
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
  }

  test("codes are m ints in [0, k)") {
    val emb = clustered(120, 16, 4, 1).toDF("vec_id", "embedding")
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 4, k = 8)
    val rows = model.codes.select(
      size($"codes"), array_min($"codes"), array_max($"codes"))
      .collect()
    assert(rows.length == 120)
    rows.foreach { r =>
      assert(r.getInt(0) == 4)
      assert(r.getInt(1) >= 0 && r.getInt(2) < 8)
    }
  }

  test("ADC ranks same-cluster vectors first on separated clusters") {
    val emb = clustered(200, 16, 4, 2).toDF("vec_id", "embedding")
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 4, k = 8)
    val probes = emb.filter($"vec_id" < 4) // one probe per cluster
    val res = PqIndex.searchAdc(model, probes, "vec_id", "embedding", topK = 10)
      .collect()
    // every neighbor of probe p should be in p's cluster (ids ≡ p mod 4)
    val bad = res.count(r => r.getLong(1) % 4 != r.getLong(0) % 4)
    assert(bad == 0, s"$bad cross-cluster neighbors in ADC top-10")
  }

  test("IVF-PQ with full probe coverage equals brute force") {
    val emb = clustered(100, 16, 4, 7).toDF("vec_id", "embedding")
    val ivf = graft.operators.IvfIndex.build(emb, "vec_id", "embedding", k = 4)
    val pq = PqIndex.build(emb, "vec_id", "embedding", m = 4, k = 8)
    val probes = emb.filter($"vec_id" < 3)
    // nprobe = all cells + shortlist = corpus -> must equal brute force
    val got = PqIndex.searchIvfPq(ivf, pq, emb, "vec_id", "embedding",
        probes, "vec_id", topK = 5, nprobe = 4, rerankFactor = 20)
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val p = probes.select($"vec_id".as("probe_id"),
      $"embedding".cast("array<double>").as("pv"))
    val c = emb.select($"vec_id".as("cid"),
      $"embedding".cast("array<double>").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"cid".asc)
    val exact = p.crossJoin(c).filter($"cid" =!= $"probe_id")
      .withColumn("sim", VectorExpressions.cosineSimilarity($"pv", $"cv"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
    assert(got == exact)
  }

  test("IVF-PQ nprobe=1 stays within the probe's own cluster") {
    val emb = clustered(200, 16, 4, 8).toDF("vec_id", "embedding")
    val ivf = graft.operators.IvfIndex.build(emb, "vec_id", "embedding", k = 4)
    val pq = PqIndex.build(emb, "vec_id", "embedding", m = 4, k = 8)
    val probes = emb.filter($"vec_id" < 4)
    val res = PqIndex.searchIvfPq(ivf, pq, emb, "vec_id", "embedding",
      probes, "vec_id", topK = 5, nprobe = 1).collect()
    assert(res.nonEmpty)
    // well-separated clusters: nprobe=1 neighbors all share the probe's
    // cluster (ids ≡ probe mod 4)
    val bad = res.count(r => r.getLong(1) % 4 != r.getLong(0) % 4)
    assert(bad == 0)
  }

  test("searchRerank equals brute force when shortlist covers the corpus") {
    val emb = clustered(80, 16, 4, 3).toDF("vec_id", "embedding")
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 4, k = 8)
    val probes = emb.filter($"vec_id" < 3)
    val got = PqIndex.searchRerank(model, emb, "vec_id", "embedding",
        probes, "vec_id", topK = 5, rerankFactor = 16) // 80-wide shortlist
      .select("probe_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val p = probes.select($"vec_id".as("probe_id"),
      $"embedding".cast("array<double>").as("pv"))
    val c = emb.select($"vec_id".as("cid"),
      $"embedding".cast("array<double>").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"cid".asc)
    val exact = p.crossJoin(c).filter($"cid" =!= $"probe_id")
      .withColumn("sim", VectorExpressions.cosineSimilarity($"pv", $"cv"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
    assert(got == exact)
  }

  test("non-cosine metrics: PQ/IVF rerank equals the metric's brute force") {
    import graft.operators.{IvfIndex, VectorDistance}
    val emb = clustered(80, 16, 4, 5).toDF("vec_id", "embedding")
    val probes = emb.filter($"vec_id" < 3)
    val p = probes.select($"vec_id".as("probe_id"),
      $"embedding".cast("array<double>").as("pv"))
    val c = emb.select($"vec_id".as("cid"),
      $"embedding".cast("array<double>").as("cv"))
    def exact(metric: VectorDistance.Metric): Set[(Long, Long, Int)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"probe_id").orderBy($"sim".desc, $"cid".asc)
      p.crossJoin(c).filter($"cid" =!= $"probe_id")
        .withColumn("sim", metric.score($"pv", $"cv"))
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .collect().map(r => (r.getAs[Long]("probe_id"),
          r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
    }
    Seq(VectorDistance.Euclidean, VectorDistance.DotProduct).foreach {
      metric =>
        // PQ with a corpus-wide shortlist: exact rerank under the metric
        val pq = PqIndex.build(emb, "vec_id", "embedding", m = 4, k = 8,
          metric = metric)
        val got = PqIndex.searchRerank(pq, emb, "vec_id", "embedding",
            probes, "vec_id", topK = 5, rerankFactor = 16)
          .select("probe_id", "neighbor_id", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == exact(metric), s"PQ rerank under ${metric.name}")
        // IVF with full probe coverage: in-cell rerank under the metric
        val ivf = IvfIndex.build(emb, "vec_id", "embedding", k = 4)
        val ivfGot = IvfIndex.search(ivf, probes, "vec_id", "embedding",
            k = 5, nprobe = 4, metric = metric)
          .select("probe_id", "neighbor_id", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(ivfGot == exact(metric), s"IVF under ${metric.name}")
    }
    // and the metrics genuinely disagree on this corpus (magnitude
    // sensitivity) — otherwise the cases above prove nothing
    assert(exact(VectorDistance.DotProduct) !=
      exact(VectorDistance.Cosine))
  }
}
