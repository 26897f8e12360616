package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, ScalarQuantize, VectorDistance}

/** Scalar quantization (VectorQuantizerType SQ8/SQ4): per-dimension
  * linear codes with the documented error bound, and the quantized IVF
  * index keeping its recall. */
class ScalarQuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextGaussian() * 3).toFloat)))
  }

  test("SQ8/SQ4 reconstruction error is bounded by half a step") {
    val df = vecs(300, 12, 1).toDF("vec_id", "embedding")
    Seq(8, 4).foreach { bits =>
      val p = ScalarQuantize.train(df, "embedding", bits)
      assert(p.mins.size == 12 && p.maxs.size == 12)
      // codes stay in [0, maxQ]
      val codes = df.select(ScalarQuantize
        .quantize(col("embedding"), p).as("q"))
      val bounds = codes.select(array_min(col("q")), array_max(col("q")))
        .collect()
      assert(bounds.forall(r => r.getInt(0) >= 0 && r.getInt(1) <= p.maxQ))
      // |x - dequantize(quantize(x))| <= step/2 per dimension
      val maxErr = df.select(
        aggregate(
          zip_with(col("embedding").cast("array<double>"),
            ScalarQuantize.dequantize(
              ScalarQuantize.quantize(col("embedding"), p), p),
            (x, y) => abs(x - y)),
          lit(0.0), (acc, e) => greatest(acc, e)).as("e"))
        .agg(max(col("e"))).head.getDouble(0)
      val maxStep = p.scales.max
      assert(maxErr <= maxStep / 2 + 1e-9,
        s"SQ$bits err $maxErr > ${maxStep / 2}")
    }
  }

  test("quantized IVF (SQ8) keeps recall with full probe coverage") {
    val df = vecs(400, 16, 2).toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" < 3)
    val model = IvfIndex.build(df, "vec_id", "embedding", k = 4,
      quantizerBits = 8)
    assert(model.quant.exists(_.bits == 8))
    assert(model.assignments.columns.contains("qvec") &&
      !model.assignments.columns.contains("vec"),
      "quantized index must store codes, not floats")
    val got = IvfIndex.search(model, probes, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .select("probe_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        p -> rs.map(_.getLong(1)).toSet
      }
    // exact cosine top-5 per probe
    val all = df.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    all.filter(_._1 < 3).foreach { case (pid, pv) =>
      val exact = all.filter(_._1 != pid)
        .sortBy { case (cid, cv) => (-cos(pv, cv), cid) }
        .take(5).map(_._1).toSet
      assert(exact.intersect(got(pid)).size >= 4,
        s"probe $pid: got ${got(pid)}, exact $exact")
    }
    // and the L2 metric searches the same quantized store
    val l2 = IvfIndex.search(model, probes, "vec_id", "embedding",
      k = 3, nprobe = 4, metric = VectorDistance.Euclidean)
    assert(l2.count() == 9)
  }
}
