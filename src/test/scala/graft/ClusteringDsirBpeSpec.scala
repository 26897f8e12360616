package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Curation}
import graft.functions.Bpe

/** Round-3 additions: distributed Lloyd's k-means, DSIR importance
  * resampling, and real learned-merge BPE tokenization. */
class ClusteringDsirBpeSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("kmeans: SSE is monotonically non-increasing across iterations") {
    val m = Clustering.kmeans(emb, "vec_id", "embedding", k = 4,
      iterations = 4)
    assert(m.sseByIteration.length == 4)
    m.sseByIteration.sliding(2).foreach { p =>
      assert(p.last <= p.head + 1e-6,
        s"SSE increased: ${m.sseByIteration}")
    }
  }

  test("kmeans: every row assigned, cells within [0, k), dist is argmin") {
    val m = Clustering.kmeans(emb, "vec_id", "embedding", k = 4,
      iterations = 2)
    val n = emb.count()
    assert(m.assignments.count() == n)
    val cells = m.assignments.select(col("cell")).distinct()
      .as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet))
    // independent argmin re-check: recompute all k distances per row
    // and compare against the assignment's claimed (cell, dist)
    val bad = m.assignments.as("a")
      .crossJoin(broadcast(m.centroids))
      .withColumn("__d", graft.functions.VectorFunctions.l2Distance(
        col("a.vec"), col("cvec")))
      .groupBy(col("a.id"), col("a.dist"))
      .agg(min(col("__d")).as("dmin"))
      .filter(abs(col("dmin") - col("a.dist")) > 1e-9)
      .count()
    assert(bad == 0L)
  }

  test("kmeans: deterministic across reruns") {
    val a = Clustering.kmeans(emb, "vec_id", "embedding", 3, 2)
    val b = Clustering.kmeans(emb, "vec_id", "embedding", 3, 2)
    assert(a.sseByIteration == b.sseByIteration)
    assert(a.assignments.select("id", "cell").except(
      b.assignments.select("id", "cell")).count() == 0L)
  }

  test("dsir: ratio table is exactly dim rows and bounded values") {
    val dim = 256
    val target = docs.filter(col("lang") === "en")
    val r = Curation.dsirLogRatios(docs, target, "text", dim)
    assert(r.count() == dim.toLong)
    // smoothing keeps every ratio finite
    assert(r.filter(col("log_ratio").isNull ||
      isnan(col("log_ratio"))).count() == 0L)
  }

  test("dsir: flagged single-pass ratios equal the two-DF form") {
    val dim = 512
    val a = Curation.dsirLogRatios(docs,
      docs.filter(col("lang") === "en"), "text", dim)
    val b = Curation.dsirLogRatiosFlagged(docs,
      col("lang") === "en", "text", dim)
    assert(a.except(b).count() == 0L && b.except(a).count() == 0L)
  }

  test("dsir: target-like docs outweigh off-target docs on average") {
    val dim = 1024
    val target = docs.filter(col("lang") === "en")
    val r = Curation.dsirLogRatios(docs, target, "text", dim)
    val w = Curation.dsirLogWeights(docs, "doc_id", "text", r, dim)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val Array(en, zh) = w
      .filter(col("lang").isin("en", "zh"))
      .groupBy(col("lang")).agg(avg(col("log_w") / col("n_feats")).as("m"))
      .orderBy(col("lang")).as[(String, Double)].collect()
    assert(en._2 > zh._2,
      s"expected en per-feature weight > zh: $en vs $zh")
  }

  test("dsir: resample returns exactly n rows, highest keys first") {
    val dim = 256
    val target = docs.filter(col("lang") === "en")
    val r = Curation.dsirLogRatios(docs, target, "text", dim)
    val w = Curation.dsirLogWeights(docs, "doc_id", "text", r, dim)
    val sel = Curation.dsirResample(w, "doc_id", n = 20)
    assert(sel.count() == 20L)
    val minSel = sel.agg(min(col("gumbel_key"))).head().getDouble(0)
    val u = (Curation.bucket32(col("doc_id")) + 0.5) / lit(4294967296.0)
    val unselectedMax = w
      .join(sel.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("k", round(col("log_w") - log(-log(u)), 6))
      .agg(max(col("k"))).head().getDouble(0)
    assert(unselectedMax <= minSel)
  }

  test("gopher rules: synthetic edge cases gate as specified") {
    val df = Seq(
      (1L, "the cat sat and that dog ran to be of good cheer with haste now"),
      (2L, "a b c d e f g h i j k l m n o p"), // mean word len 1 → ml fails
      (3L, "### #tag #x ### the and to of be that have with more words here"),
      (4L, "short text")                        // word count < 10
    ).toDF("doc_id", "text")
    val g = df.select(col("doc_id"),
        graft.operators.Curation.gopherFlags(col("text"), minWords = 10).as("g"))
      .select(col("doc_id"), col("g.*")).orderBy(col("doc_id"))
      .collect()
    assert(g(0).getAs[Boolean]("keep"))
    assert(!g(1).getAs[Boolean]("mean_word_len_ok"))
    assert(!g(1).getAs[Boolean]("stopwords_ok"))
    assert(!g(2).getAs[Boolean]("symbol_ratio_ok"))
    assert(!g(3).getAs[Boolean]("word_count_ok"))
  }

  test("bpe: training learns the most frequent pair first") {
    val merges = Bpe.trainFromCounts(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 4)
    // "es" (count 9, from newest+widest) is the top pair; merges are
    // deterministic under count-then-lexicographic tie-break
    assert(merges.head == ("e", "s"))
    assert(merges.length == 4)
  }

  test("bpe: encoding is lossless per word and respects merges") {
    val merges = Bpe.trainFromCounts(
      Seq(("aaab", 10L), ("aab", 5L)), 3)
    val df = Seq((1L, "aaab aab xyz")).toDF("id", "text")
    val toks = df.select(Bpe.encode(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks.mkString("") == "aaabaabxyz")
    // merged symbols are multi-char for trained words, chars for OOV
    assert(toks.count(_.length > 1) >= 2)
    assert(toks.containsSlice(Seq("x", "y", "z")))
  }

  test("bpe: corpus-trained merges compress and stay lossless") {
    val merges = Bpe.train(docs, "text", numMerges = 50)
    assert(merges.nonEmpty && merges.length <= 50)
    val stats = docs.select(
        size(Bpe.encode(col("text"), merges)).as("n_bpe"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"),
        (concat_ws("", Bpe.encode(col("text"), merges)) ===
          regexp_replace(lower(col("text")), "\\s+", "")).as("lossless"))
      .agg(sum(col("n_bpe")).as("t"), sum(col("n_chars")).as("c"),
        bool_and(col("lossless")).as("ok"))
      .head()
    assert(stats.getAs[Boolean]("ok"))
    assert(stats.getAs[Long]("t") < stats.getAs[Long]("c"))
  }
}
