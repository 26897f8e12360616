package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"), // near dup
    (4L, "completely different content about spark query engines and columnar scans"),
    (5L, "spark query engines process columnar data with vectorized execution loops")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 4)
    val dup = out.filter($"n_dups" === 2).select($"keep_id").as[Long].collect()
    assert(dup.sameElements(Array(1L)))
  }

  test("token jaccard finds near-dup pair with exact score") {
    val out = Dedup.tokenJaccard(docs, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    val m = out.map { case (a, b, j) => (a, b) -> j }.toMap
    // docs 1/2 identical token sets -> jaccard 1.0
    assert(m((1L, 2L)) == 1.0)
    // docs 1/3: 12 distinct tokens each, 11 common, union 13
    assert(math.abs(m((1L, 3L)) - 11.0 / 13.0) < 1e-12)
  }

  test("minhash signature identical for identical docs and lsh finds them") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 2L)))
  }

  test("embedding near-dups finds the near-identical vector pair") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)), // near-dup of 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("incremental LSH against stored signatures equals symmetric cross-pairs") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newDocs = corpus.filter($"doc_id" % 7 === 0)
    val oldDocs = corpus.filter($"doc_id" % 7 =!= 0)
    val sigs = Dedup.minhashSignatures(oldDocs, "doc_id", "text", 32, 3)
    val inc = Dedup.minhashLshAgainst(newDocs, "doc_id", "text", sigs,
        threshold = 0.5)
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    // symmetric batch run over everything, restricted to cross pairs
    val sym = Dedup.minhashLsh(corpus, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (n, c) => n % 7 == 0 && c % 7 != 0 }.toSet
    assert(inc == sym)
  }

  test("simhash distance zero for identical docs, small for near dups") {
    val fps = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    val d13 = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    val d14 = java.lang.Long.bitCount(fps(1L) ^ fps(4L))
    assert(d13 < d14, s"near-dup distance $d13 should beat unrelated $d14")
  }
}
