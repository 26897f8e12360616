package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}
import graft.functions.VectorFunctions

class SimilarityMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute force topk orders by cosine similarity") {
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" =!= 0L),
      "vec_id", "embedding", Seq(1.0, 0.0, 0.0), k = 2)
      .select($"vec_id").as[Long].collect()
    assert(out.sameElements(Array(1L, 2L)))
  }

  test("knn join returns per-probe ranked neighbors") {
    val probes = vecs.filter($"vec_id" === 0L)
    val out = Similarity.knnJoin(probes, vecs, "vec_id", "vec_id",
      "embedding", k = 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 2))
  }

  test("vector functions compute exact values") {
    val r = vecs.filter($"vec_id" === 1L).select(
      VectorFunctions.vectorDims($"embedding").as("d"),
      round(VectorFunctions.l1Distance($"embedding",
        array(lit(0.9f), lit(0.1f), lit(0.0f))), 6).as("l1"))
      .collect().head
    assert(r.getAs[Int]("d") == 3)
    assert(r.getAs[Double]("l1") == 0.0)
  }

  test("ivf index recalls same-cluster nearest neighbors") {
    // two well-separated clusters around (1,0...) and (0,1...)
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]): Seq[Float] =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val corpus = ((0L until 20L).map(i => (i, jitter(a))) ++
      (20L until 40L).map(i => (i, jitter(b)))).toDF("vec_id", "embedding")
    val model = graft.operators.IvfIndex.build(corpus, "vec_id", "embedding", k = 2)
    // cells separate the clusters
    val cells = model.assignments
      .select($"id", $"cell").as[(Long, Int)].collect().toMap
    assert((0L until 20L).map(cells).toSet.size == 1)
    assert(cells(0L) != cells(25L))
    // searching with a cluster-a probe returns only cluster-a neighbors
    val probes = corpus.filter($"vec_id" === 0L)
    val res = graft.operators.IvfIndex.search(model, probes, "vec_id",
      "embedding", k = 5, nprobe = 1)
      .select($"neighbor_id").as[Long].collect()
    assert(res.length == 5 && res.forall(_ < 20L))
  }

  test("multimodal extractFeatures runs partition-wise with stub decoder") {
    val df = Multimodal.withBinary(
      Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text"), "text")
    val out = Multimodal.extractFeatures(df, "doc_id")
      .select($"id", $"n_bytes").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 0))
    val feats = Multimodal.extractFeatures(df, "doc_id")
      .filter($"id" === 1L).select($"features").as[Seq[Float]].collect().head
    assert(feats.length == 8 && feats.sum > 0)
  }

  test("multimodal resize updates meta and shrinks payload proportionally") {
    val df = Multimodal.withBinary(
      Seq((1L, "x" * 4096)).toDF("doc_id", "text"), "text",
      kind = "image", mime = "image/png")
    val out = Multimodal.resize(df, "doc_id", 16, 16).collect().head
    val meta = out.getStruct(2)
    assert(meta.getInt(2) == 16 && meta.getInt(3) == 16)
    val smaller = out.getAs[Array[Byte]]("content")
    assert(smaller.length == 16 * 16 / 64) // area-proportional
    // larger target area keeps more bytes
    val big = Multimodal.resize(df, "doc_id", 64, 64).collect().head
    assert(big.getAs[Array[Byte]]("content").length > smaller.length)
  }

  test("multimodal frameSample explodes payloads executor-side 1->N") {
    val df = Multimodal.withBinary(
      Seq((1L, "v" * 640), (2L, "")).toDF("doc_id", "text"), "text",
      kind = "video", mime = "video/mp4")
    val frames = Multimodal.frameSample(df, "doc_id",
        frameBytes = 64, stride = 4)
      .select($"id", $"frame_idx").as[(Long, Int)].collect()
    // 640 bytes / 64 = 10 frames, stride 4 keeps indexes 0,4,8
    assert(frames.toSet == Set((1L, 0), (1L, 4), (1L, 8)))
  }
}
