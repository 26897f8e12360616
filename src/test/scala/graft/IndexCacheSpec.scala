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

  test("ivf assignments written partitioned by cell prune at read") {
    IndexCache.clear()
    val m = IvfIndex.build(corpus, "vec_id", "embedding", k = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfcells").toString
    // the 100 TB layout: the index artifact IS a table partitioned by
    // its cell id, so an nprobe search reads nprobe/k of the files
    m.assignments.write.partitionBy("cell").parquet(s"$dir/cells")
    val back = spark.read.parquet(s"$dir/cells")
      .filter(org.apache.spark.sql.functions.col("cell").isin(0, 1))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("cell#") || plan.contains("cell IN")),
      s"cell filter must prune partitions:\n$plan")
    val cells = back.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(0, 1)) && cells.nonEmpty)
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
