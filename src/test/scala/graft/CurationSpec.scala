package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Train/val/test splits + decontamination (operators/Curation.scala). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is deterministic and stable under corpus growth") {
    val small = spark.range(1000).toDF("id")
    val big = spark.range(5000).toDF("id")
    val a = Curation.assignSplit(small, "id", 900, 50)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = Curation.assignSplit(big, "id", 900, 50)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // rows never migrate when the corpus grows
    a.foreach { case (id, s) => assert(b(id) == s) }
    // weights land near 90/5/5
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 1000.0)
    assert(math.abs(frac("train") - 0.9) < 0.03)
    assert(frac.getOrElse("val", 0.0) > 0.02)
  }

  test("contaminated flags train docs overlapping the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about databases and spark"),
      (3L, "the quick brown fox sat still")).toDF("doc_id", "text")
    val ev = Seq("a quick brown fox jumps over anything" -> 0)
      .toDF("text", "x")
    val hits = Curation.contaminated(train, "doc_id", "text", ev, "text",
        shingleSize = 3, minHits = 2)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "quick brown fox" + "brown fox jumps" (+ more)
    assert(hits.contains(1L))
    assert(!hits.contains(2L))
    // doc 3 shares only "quick brown fox" (1 shingle) — below minHits
    assert(!hits.contains(3L))
  }

  test("stratified sample: per-row stability, stratum isolation, rate accuracy") {
    val base = (0L until 2000L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "s")
    val rates = Map("a" -> 0.3, "b" -> 0.5)
    val kept = Curation.sampleStratified(base, "id", "s", rates)
      .select("id").as[Long].collect().toSet
    // deterministic: second run identical
    val kept2 = Curation.sampleStratified(base, "id", "s", rates)
      .select("id").as[Long].collect().toSet
    assert(kept == kept2)
    // rate accuracy within binomial noise (n=500/1500, 4 sigma)
    val nA = kept.count(_ % 4 == 0)
    val nB = kept.size - nA
    assert(math.abs(nA - 0.3 * 500) < 4 * math.sqrt(500 * 0.3 * 0.7))
    assert(math.abs(nB - 0.5 * 1500) < 4 * math.sqrt(1500 * 0.5 * 0.25))
    // stratum isolation: growing stratum b never flips a's kept set
    val grown = base.union(
      (5000L until 6000L).map(i => (i, "b")).toDF("id", "s"))
    val keptG = Curation.sampleStratified(grown, "id", "s", rates)
      .filter($"s" === "a").select("id").as[Long].collect().toSet
    assert(keptG == kept.filter(_ % 4 == 0))
    // stratum with no rate is dropped entirely
    val keptNoA = Curation.sampleStratified(base, "id", "s", Map("b" -> 0.5))
      .filter($"s" === "a").count()
    assert(keptNoA == 0L)
  }

  test("packSequences is a lossless contiguous layout per shard") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map(i => (i, 1 + rnd.nextInt(200)))
      .toDF("id", "nt")
    val plan = Curation.packSequences(docs, "id", $"nt", budget = 256,
        shards = 4)
      .join(docs, "id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("shard"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("offset"), r.getAs[Int]("nt")))
    // every doc present exactly once
    assert(plan.length == 300 && plan.map(_._1).distinct.length == 300)
    // offsets in [0, budget)
    assert(plan.forall(p => p._4 >= 0 && p._4 < 256))
    // within a shard, start positions (seq*budget + offset) tile the
    // token stream contiguously: sorted starts differ by exactly nt
    plan.groupBy(_._2).foreach { case (_, ds) =>
      val sorted = ds.sortBy(d => d._3 * 256 + d._4)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 * 256 + b._4 == a._3 * 256 + a._4 + a._5)
        case _ =>
      }
    }
  }

  test("mixToProportions hits target mixture with maximal retention") {
    // 1000 a, 300 b, target 50/50 -> b binds (kept whole), a sampled to ~300
    val df = ((0L until 1000L).map(i => (i, "a")) ++
      (10000L until 10300L).map(i => (i, "b"))).toDF("id", "s")
    val out = Curation.mixToProportions(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.5))
    val byS = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byS("b") == 300L) // binding stratum retained in full
    assert(math.abs(byS("a") - 300L) < 4 * math.sqrt(300))
    // kept set is a subset of the deterministic stratified sample at the
    // derived rate (same hash, so mix == sampleStratified at rate 0.3)
    val direct = Curation.sampleStratified(df, "id", "s",
      Map("a" -> 0.3, "b" -> 1.0)).select("id").as[Long].collect().toSet
    val got = out.select("id").as[Long].collect().toSet
    assert(got == direct)
  }

  test("domainCap: salted two-level top-k equals the single-window result") {
    // one hot domain (1000 rows), one small (3 rows < cap), one at cap
    val df = ((0L until 1000L).map(i => (i, "hot")) ++
      (2000L until 2003L).map(i => (i, "tiny")) ++
      (3000L until 3007L).map(i => (i, "atcap"))).toDF("id", "s")
    val got = Curation.domainCap(df, "id", "s", cap = 7, salts = 4)
      .select($"id").as[Long].collect().toSet
    // reference: unsalted global window
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"s")
      .orderBy(md5($"id".cast("string")), $"id")
    val ref = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 7).select($"id").as[Long].collect().toSet
    assert(got == ref)
    assert(got.count(_ >= 2000L && got.contains(2000L)) >= 1) // tiny kept whole
    assert(got.size == 7 + 3 + 7)
  }

  test("lineDedup: boilerplate removed everywhere, order kept, all-boiler doc -> empty") {
    val lines = Seq(
      // docs 1..3 share the "cookie banner" line; doc 4 is ONLY that line
      (1L, 0, "accept all cookies"), (1L, 1, "real content one"),
      (2L, 0, "accept all cookies"), (2L, 1, "zeta"), (2L, 2, "alpha"),
      (3L, 0, "Accept All Cookies "), // normalization: case+trim
      (3L, 1, "more real content"),
      (4L, 0, "accept all cookies")).toDF("doc_id", "line_no", "line")
    val out = graft.operators.Dedup
      .lineDedup(lines, "doc_id", "line_no", "line", minDocFreq = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 1L, "real content one")))
    // surviving lines stay in line_no order, not alphabetical
    assert(out(2L) == ((3L, 2L, "zeta alpha")))
    assert(out(3L) == ((2L, 1L, "more real content")))
    assert(out(4L) == ((1L, 0L, "")))
  }
}
