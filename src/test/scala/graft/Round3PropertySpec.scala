package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.operators.{Clustering, Curation}
import graft.plans.IdSetSketch

/** Property-based checks for the round-3 primitives: BPE against its
  * losslessness invariant on generated text, IdSet round-trips on
  * generated id sets of every backing kind, and k-means invariants on
  * generated point clouds. Explicit seeds keep runs deterministic. */
class Round3PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
  private val doc: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("bpe: lossless concat and count bounds on generated corpora (15 cases)") {
    for (seed <- 1 to 15) {
      val texts = sample(Gen.listOfN(25, doc), seed)
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val merges = Bpe.train(df, "text", numMerges = 30, vocabCap = 1 << 10)
      val rows = df.select(
          Bpe.encode(col("text"), merges).as("t"),
          col("text")).as[(Seq[String], String)].collect()
      rows.foreach { case (toks, text) =>
        val squeezed = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        assert(toks.mkString("") == squeezed.mkString(""))
        val nWords = squeezed.length
        val nChars = squeezed.map(_.length).sum
        assert(toks.length >= nWords && toks.length <= nChars)
      }
    }
  }

  test("idset: generated int/long/string sets round-trip membership exactly") {
    for (seed <- 1 to 8) {
      val ints = sample(Gen.listOfN(40, Gen.choose(-1000, 1000)), seed)
      val longs = sample(Gen.listOfN(40,
        Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)), seed + 100)
      val strs = sample(Gen.listOfN(40, word), seed + 200)

      // int: Roaring — note RoaringBitmap stores unsigned ints; negative
      // ids round-trip through the same two's-complement container the
      // reference uses
      val iBlob = ints.toDF("v")
        .agg(IdSetSketch.idSet(col("v"))).head().getString(0)
      val iHits = ints.toDF("p")
        .select(IdSetSketch.inIdSet(col("p"), lit(iBlob)))
        .as[Boolean].collect()
      assert(iHits.forall(identity))

      val lBlob = longs.toDF("v")
        .agg(IdSetSketch.idSet(col("v"))).head().getString(0)
      assert(longs.toDF("p")
        .select(IdSetSketch.inIdSet(col("p"), lit(lBlob)))
        .as[Boolean].collect().forall(identity))
      // non-members are rejected exactly (bitmaps, not blooms)
      val outsider = longs.max + 1
      assert(!Seq(outsider).toDF("p")
        .select(IdSetSketch.inIdSet(col("p"), lit(lBlob)))
        .as[Boolean].head())

      val sBlob = strs.toDF("v")
        .agg(IdSetSketch.idSet(col("v"))).head().getString(0)
      assert(strs.toDF("p")
        .select(IdSetSketch.inIdSet(col("p"), lit(sBlob)))
        .as[Boolean].collect().forall(identity)) // bloom: no false negatives
    }
  }

  test("kmeans: generated clouds — SSE monotone, assignments exhaustive") {
    for (seed <- 1 to 5) {
      val pts = sample(Gen.listOfN(60,
        Gen.listOfN(4, Gen.choose(-10.0, 10.0))), seed)
      val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
      val m = Clustering.kmeans(df, "id", "vec", k = 3, iterations = 3)
      m.sseByIteration.sliding(2).foreach(p =>
        assert(p.last <= p.head + 1e-6))
      assert(m.assignments.count() == 60L)
    }
  }

  test("dsir: weights shift with the target — raw==target gives zero-ish weights") {
    val docs = sample(Gen.listOfN(40, doc), 7).zipWithIndex
      .map(_.swap).map { case (i, t) => (i.toLong, t) }.toDF("doc_id", "text")
      .filter(length(col("text")) > 0)
    // target == raw → p_t == p_r → every bucket ratio is exactly 0
    val r = Curation.dsirLogRatiosFlagged(docs, lit(true), "text", 128)
    val nonzero = r.filter(abs(col("log_ratio")) > 1e-9).count()
    assert(nonzero == 0L)
  }
}
