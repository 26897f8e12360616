package graft

import org.apache.spark.sql.functions._

import graft.sources.MapShred

/** MAP per-key index analog: registered keys rewrite to shredded
  * columns (pushdown-capable), unregistered keys keep the map probe,
  * and ownership must be provable before the facade rewrites. */
class MapShredSpec extends SparkSpec {
  import spark.implicits._

  private lazy val shredded = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mapshred_spec").toString
    val base = Seq(
      (1L, Map("k" -> 10.0, "score" -> 5.5)),
      (2L, Map("k" -> 70.0, "score" -> 120.25)),
      (3L, Map("k" -> 55.0))).toDF("id", "attrs")
    MapShred.ingestShredded(spark, base, s"$tmp/t", "attrs",
      Seq("k", "score"))
  }

  test("shredded keys push into the scan; missing keys are null") {
    val f = shredded.filter(MapShred.mapValue(shredded, "attrs", "k") >= 50)
    assert(f.queryExecution.executedPlan.toString.linesIterator.exists(
      l => l.contains("PushedFilters") && l.contains("attrs__k")),
      "registered key must reach PushedFilters")
    assert(f.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))
    // row 3 has no 'score' → shredded column is null, exactly like
    // element_at on the original map
    val scores = shredded.orderBy("id")
      .select(MapShred.mapValue(shredded, "attrs", "score"))
      .collect().map(r => Option(r.get(0)))
    assert(scores.toSeq == Seq(Some(5.5), Some(120.25), None))
  }

  test("unregistered keys fall back to the map probe, same answers") {
    val viaFallback = shredded
      .select(MapShred.mapValue(shredded, "attrs", "nope"))
      .collect().map(r => Option(r.get(0)))
    assert(viaFallback.forall(_.isEmpty))
    // a frame with NO registration probes the map directly
    val bare = Seq((1L, Map("a" -> 2.0))).toDF("id", "m")
    assert(bare.select(MapShred.mapValue(bare, "m", "a"))
      .head.getDouble(0) == 2.0)
  }

  test("facade rewrites registered mapValue calls, leaves others") {
    shredded.createOrReplaceTempView("ms_t")
    MapShred.registerTable("ms_t", "attrs", Seq("k", "score"))
    try {
      val served = graft.sql.QueryFacade.rewriteMapValueShredded(spark,
        "SELECT id FROM ms_t WHERE mapValue(attrs, 'k') >= 50")
      assert(served.contains("attrs__k") && !served.contains("mapValue"),
        s"registered key should rewrite: $served")
      // unregistered key stays a mapValue call (element_at fallback)
      val kept = graft.sql.QueryFacade.rewriteMapValueShredded(spark,
        "SELECT id FROM ms_t WHERE mapValue(attrs, 'zz') = 1")
      assert(kept.contains("mapValue(attrs, 'zz')"), kept)
      // an UNREGISTERED table keeps the call even for a known key name
      val other = graft.sql.QueryFacade.rewriteMapValueShredded(spark,
        "SELECT id FROM elsewhere WHERE mapValue(attrs, 'k') >= 50")
      assert(other.contains("mapValue"), other)
      // end-to-end through the facade: answers match the map probe
      val df = graft.sql.QueryFacade.sql(spark,
        "SET explicitLimit = true; SELECT id FROM ms_t " +
          "WHERE mapValue(attrs, 'k') >= 50 ORDER BY id")
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    } finally MapShred.clear()
  }
}
