package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.operators.{Bm25, Curation, Upsert}

/** Property-based checks for the late-round-3 operators, each tested
  * against an independent in-memory reference implementation on
  * generated inputs (explicit seeds — deterministic runs). */
class PipelineOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("packBinsFfd equals sequential FFD and respects invariants (10 cases)") {
    for (seed <- 1 to 10) {
      val sizes = sample(Gen.listOfN(60, Gen.choose(1L, 100L)), seed)
      val cap = 100L
      val df = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("id", "nt")
      val out = Curation.packBinsFfd(df, "id", col("nt"), cap, shards = 3)
        .select($"id", $"shard", $"bin", $"n_tokens")
        .as[(Long, Int, Int, Long)].collect()
      assert(out.length == sizes.length, "every doc packed exactly once")
      // per (shard, bin) loads respect capacity; <=1 half-full bin/shard
      val byShard = out.groupBy(_._2)
      byShard.foreach { case (_, rows) =>
        val loads = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum)
        assert(loads.values.forall(_ <= cap))
        assert(loads.values.count(_ <= cap / 2) <= 1)
        // equality with sequential FFD on the same (tokens desc, id) order
        val seqBins = scala.collection.mutable.ArrayBuffer.empty[Long]
        val expect = rows.sortBy(r => (-r._4, r._1)).map { r =>
          var b = 0
          while (b < seqBins.length && seqBins(b) < r._4) b += 1
          if (b == seqBins.length) seqBins += cap
          seqBins(b) -= r._4
          r._1 -> b
        }.toMap
        rows.foreach(r => assert(expect(r._1) == r._3))
      }
    }
  }

  test("dedupTtl equals the sequential watermark replay (10 cases)") {
    for (seed <- 1 to 10) {
      val rows = sample(Gen.listOfN(80,
        for {
          k <- Gen.choose(0, 4)
          t <- Gen.choose(0L, 500L)
        } yield (k, t)), seed).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val ttl = 60L
      val got = Upsert.dedupTtl(rows.toDF("k", "t", "id"), Seq("k"),
          col("t"), ttl, Seq("id"))
        .select($"id").as[Long].collect().toSet
      // sequential reference: global (t, id) order, per-key last-kept map
      val lastKept = scala.collection.mutable.Map.empty[Int, Long]
      val expect = rows.sortBy(r => (r._2, r._3)).flatMap { case (k, t, id) =>
        lastKept.get(k) match {
          case Some(lk) if t - lk <= ttl => None
          case _ => lastKept(k) = t; Some(id)
        }
      }.toSet
      assert(got == expect)
    }
  }

  test("chunkOverlap at stride==chunk reconstructs the squeezed doc (8 cases)") {
    val word = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val doc = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    for (seed <- 1 to 8) {
      val texts = sample(Gen.listOfN(12, doc), seed)
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val chunks = Curation.chunkOverlap(df, "id", "text",
          chunkTokens = 7, stride = 7)
        .select($"id", $"chunk_idx", $"chunk_text")
        .as[(Int, Int, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val squeezed = t.split("\\s+").filter(_.nonEmpty).mkString(" ")
        assert(chunks(i) == squeezed, s"doc $i reconstructs")
      }
    }
  }

  test("bm25 matches in-memory scoring on generated corpora (5 cases)") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    for (seed <- 1 to 5) {
      val texts = sample(Gen.listOfN(20, doc), seed)
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val got = Bm25.topK(df, "id", "text",
          Seq("q" -> Seq("alpha", "beta")), k = 20)
        .select($"doc_id", $"score").as[(Int, Double)].collect().toMap
      // reference scorer
      val toks = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      val n = toks.size.toDouble
      val avgdl = toks.map(_.size).sum / n
      def idf(term: String) = {
        val dfc = toks.count(_.contains(term)).toDouble
        math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
      }
      toks.zipWithIndex.foreach { case (ts, i) =>
        val s = Seq("alpha", "beta").map { term =>
          val tf = ts.count(_ == term).toDouble
          idf(term) * tf * 2.2 /
            (tf + 1.2 * (1 - 0.75 + 0.75 * ts.size / avgdl))
        }.sum
        val rounded = BigDecimal(s).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble
        if (rounded > 0) assert(math.abs(got(i) - rounded) < 1e-9)
        else assert(!got.contains(i))
      }
    }
  }

  test("tokenContainment equals the in-memory df-capped reference (6 cases)") {
    val word = Gen.oneOf((1 to 30).map(i => s"w$i"))
    val doc = Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    for (seed <- 1 to 6) {
      val texts = sample(Gen.listOfN(18, doc), seed)
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val got = graft.operators.Dedup
        .tokenContainment(df, "id", "text", threshold = 0.6, dfCap = 8)
        .select($"contained_id", $"container_id", $"containment")
        .as[(Int, Int, Double)].collect()
        .map { case (a, b, c) => ((a, b), math.rint(c * 1e9) / 1e9) }.toMap
      // reference: candidates share a token with df <= 8, directed pairs
      val sets = texts.map(_.split(" ").toSet)
      val dfCount = sets.flatten.groupBy(identity).view.mapValues(_.size)
      val expect = (for {
        a <- sets.indices; b <- sets.indices if a != b
        if (sets(a) & sets(b)).exists(t => dfCount(t) <= 8)
        c = (sets(a) & sets(b)).size.toDouble / sets(a).size
        if c >= 0.6
      } yield ((a, b), math.rint(c * 1e9) / 1e9)).toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("semanticContaminated equals brute-force max cosine (4 cases)") {
    for (seed <- 1 to 4) {
      val vecs = sample(Gen.listOfN(30,
        Gen.listOfN(6, Gen.choose(-10, 10).map(_ / 10.0f))), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .filter(_._2.exists(_ != 0f))
      val df = vecs.toDF("vec_id", "embedding")
      val eval = df.filter($"vec_id" < 8)
      val train = df.filter($"vec_id" >= 8)
      val got = graft.operators.Curation
        .semanticContaminated(train, eval, "vec_id", "embedding", 0.8)
        .select($"id", $"max_sim").as[(Long, Double)].collect().toMap
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
        val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(ad.map(x => x * x).sum) *
          math.sqrt(bd.map(x => x * x).sum))
      }
      val ev = vecs.filter(_._1 < 8).map(_._2)
      vecs.filter(_._1 >= 8).foreach { case (id, v) =>
        val expect = ev.map(e => cos(v, e)).max
        assert(math.abs(got(id) - expect) < 2e-6, s"seed $seed id $id")
      }
    }
  }

  test("trainLogReg equals sequential full-batch GD (5 cases)") {
    for (seed <- 1 to 5) {
      val data = sample(Gen.listOfN(50,
        for {
          x1 <- Gen.choose(-20, 20); x2 <- Gen.choose(-20, 20)
        } yield (x1 / 10.0, x2 / 10.0)), seed)
        .map { case (a, b) => (a, b, if (a + b > 0) 1.0 else 0.0) }
      val df = data.toDF("x1", "x2", "y")
      val (w, b) = Curation.trainLogReg(df, Seq(col("x1"), col("x2")),
        col("y"), steps = 4, lr = 0.5)
      // sequential reference
      var ws = Seq(0.0, 0.0); var bs = 0.0
      for (_ <- 0 until 4) {
        val grads = data.map { case (x1, x2, y) =>
          val m = ws.head * x1 + ws(1) * x2 + bs
          val r = y - 1.0 / (1.0 + math.exp(-m))
          (r * x1, r * x2, r)
        }
        val nn = data.size
        ws = Seq(ws.head + 0.5 * grads.map(_._1).sum / nn,
          ws(1) + 0.5 * grads.map(_._2).sum / nn)
        bs += 0.5 * grads.map(_._3).sum / nn
      }
      assert(math.abs(w.head - ws.head) < 1e-9)
      assert(math.abs(w(1) - ws(1)) < 1e-9)
      assert(math.abs(b - bs) < 1e-9)
    }
  }
}
