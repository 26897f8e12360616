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
}
