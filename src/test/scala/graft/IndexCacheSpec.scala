package graft

import graft.operators.{IndexCache, IvfIndex, PqIndex}
import org.apache.spark.sql.functions._

/** The ingest-time index memo must be (a) a real cache — same corpus
  * plan + params returns the SAME artifact, (b) keyed correctly — a
  * different corpus or different params never shares, and (c) purely an
  * optimization — a cold rebuild after clear() yields equal results. */
class IndexCacheSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0 until 64).map(i => (i.toLong,
      Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
  }

  test("ivf build memoizes on (plan, params) and stays deterministic") {
    IndexCache.clear()
    val m1 = IvfIndex.build(corpus, "vec_id", "embedding", k = 4)
    val m2 = IvfIndex.build(corpus, "vec_id", "embedding", k = 4)
    assert(m1 eq m2, "identical build args must hit the cache")

    val m3 = IvfIndex.build(corpus, "vec_id", "embedding", k = 8)
    assert(!(m1 eq m3), "different k must not share an index")
    val m4 = IvfIndex.build(corpus.filter(col("vec_id") < 32),
      "vec_id", "embedding", k = 4)
    assert(!(m1 eq m4), "different corpus plan must not share an index")

    val a1 = m1.assignments.orderBy("id").collect().map(_.getInt(2))
    IndexCache.clear()
    val m5 = IvfIndex.build(corpus, "vec_id", "embedding", k = 4)
    assert(!(m1 eq m5))
    val a5 = m5.assignments.orderBy("id").collect().map(_.getInt(2))
    assert(a1.sameElements(a5), "cold rebuild must reproduce assignments")
  }

  test("pq build memoizes and cold rebuild reproduces the codes") {
    IndexCache.clear()
    val m1 = PqIndex.build(corpus, "vec_id", "embedding", m = 2, k = 4)
    val m2 = PqIndex.build(corpus, "vec_id", "embedding", m = 2, k = 4)
    assert(m1 eq m2)
    val c1 = m1.codes.orderBy("id").collect()
      .map(_.getSeq[Int](1).mkString(","))
    IndexCache.clear()
    val m3 = PqIndex.build(corpus, "vec_id", "embedding", m = 2, k = 4)
    val c3 = m3.codes.orderBy("id").collect()
      .map(_.getSeq[Int](1).mkString(","))
    assert(c1.sameElements(c3), "cold rebuild must reproduce PQ codes")
  }
}
