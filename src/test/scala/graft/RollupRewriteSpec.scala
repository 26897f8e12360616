package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.RollupRewrite

class RollupRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate over fact is rewritten to the rollup scan with equal results") {
    val fact = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val out = Files.createTempDirectory("graft_rollup").toString

    // expected values BEFORE registering the rewrite
    val direct = fact.groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("q"), count(lit(1)).as("n"),
        min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
      .orderBy($"l_returnflag", $"l_linestatus").collect()
    val expectedF = fact.filter($"l_returnflag" === "A")
      .groupBy($"l_linestatus").agg(sum($"l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    RollupRewrite.buildRollup(spark, fact,
      RollupRewrite.pathOf(fact).get,
      dims = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity", "l_extendedprice"),
      outPath = s"$out/rollup")
    try {
      val q = fact.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("q"), count(lit(1)).as("n"),
          min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
        .orderBy($"l_returnflag", $"l_linestatus")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("sum_l_quantity"), s"plan not rewritten:\n$plan")
      assert(!plan.contains("l_orderkey"), "fact scan still present")
      assert(q.collect().toSeq == direct.toSeq)

      // subset of dims also matches (coarser group-by re-aggregates)
      val coarse = fact.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n")).orderBy($"l_returnflag")
      assert(coarse.queryExecution.optimizedPlan.toString.contains("cnt#"))
      val expectCoarse = direct.groupBy(_.getString(0)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(coarse.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == expectCoarse)

      // dim-only filter transplants onto the rollup (star-tree semantics)
      val filtered = fact.filter($"l_returnflag" === "A")
        .groupBy($"l_linestatus").agg(sum($"l_quantity").as("q"))
      assert(filtered.queryExecution.optimizedPlan.toString.contains("sum_l_quantity"))
      assert(filtered.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == expectedF)

      // measure filter must NOT be rewritten (pre-aggregation is wrong there)
      val measureFiltered = fact.filter($"l_quantity" > 10)
        .groupBy($"l_returnflag").agg(count(lit(1)))
      assert(!measureFiltered.queryExecution.optimizedPlan.toString.contains("cnt#"))

      // non-rewritable aggregate (avg / non-dim group) falls through
      val avgQ = fact.groupBy($"l_returnflag").agg(avg($"l_quantity"))
      assert(!avgQ.queryExecution.optimizedPlan.toString.contains("sum_l_quantity"))
      val otherDim = fact.groupBy($"l_partkey").agg(count(lit(1)))
      assert(!otherDim.queryExecution.optimizedPlan.toString.contains("cnt#"))
    } finally RollupRewrite.clear()
  }

  test("distinct-count query answered from rollup-stored HLL blobs") {
    val fact = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val out = Files.createTempDirectory("graft_rollup_hll").toString

    // direct sketch estimate + exact count BEFORE registering the rule
    val direct = fact.groupBy($"l_returnflag")
      .agg(graft.plans.HllSketch.distinctCountHll($"l_partkey").as("e"),
        countDistinct($"l_partkey").as("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    RollupRewrite.buildRollup(spark, fact,
      RollupRewrite.pathOf(fact).get,
      dims = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity"),
      outPath = s"$out/rollup",
      distinctMeasures = Seq("l_partkey"))
    try {
      val q = fact.groupBy($"l_returnflag")
        .agg(graft.plans.HllSketch.distinctCountHll($"l_partkey").as("e"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("hll_l_partkey"), s"plan not rewritten:\n$plan")
      val fromRollup = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fromRollup.foreach { case (flag, est) =>
        val (directEst, exact) = direct(flag)
        // blob merge is associative -> bit-identical to the direct pass
        assert(est == directEst, s"$flag: rollup $est != direct $directEst")
        assert(math.abs(est - exact) <= exact * 0.1,
          s"$flag: estimate $est off exact $exact by > 10%")
      }
    } finally RollupRewrite.clear()
  }

  test("percentile queries answered from rollup-stored digest blobs") {
    val fact = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val out = Files.createTempDirectory("graft_rollup_pct").toString

    // exact per-group percentiles BEFORE registering the rule
    val exact = fact.groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50q"),
        expr("percentile(l_partkey, 0.9)").as("p90k"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    RollupRewrite.buildRollup(spark, fact,
      RollupRewrite.pathOf(fact).get,
      dims = Seq("l_returnflag", "l_linestatus"),
      measures = Seq("l_quantity"),
      outPath = s"$out/rollup",
      tdigestMeasures = Seq("l_quantity"),
      qdigestMeasures = Seq("l_partkey"),
      kllMeasures = Seq("l_quantity"))
    try {
      // PERCENTILETDIGEST over the fact → TDigestMergeAgg over td blobs
      val td = fact.groupBy($"l_returnflag")
        .agg(graft.plans.TDigestSketch
          .percentileTDigest($"l_quantity", 50.0).as("est"))
      val tdPlan = td.queryExecution.optimizedPlan.toString
      assert(tdPlan.contains("td_l_quantity"), s"plan not rewritten:\n$tdPlan")
      td.collect().foreach { r =>
        val e = exact(r.getString(0))._1
        assert(math.abs(r.getDouble(1) - e) <= 2.0,
          s"${r.getString(0)}: tdigest ${r.getDouble(1)} off exact $e")
      }

      // PERCENTILEEST (q-digest) over the fact → QDigestMergeAgg; the
      // q-digest answer is a one-sided range upper bound — gate on the
      // estimate's exact rank being within maxError(+slack) of 0.9
      val qd = fact.groupBy($"l_returnflag")
        .agg(graft.plans.QDigestSketch
          .percentileEst($"l_partkey", 90.0).as("est"))
      val qdPlan = qd.queryExecution.optimizedPlan.toString
      assert(qdPlan.contains("qd_l_partkey"), s"plan not rewritten:\n$qdPlan")
      val ranks = qd.collect().map { r =>
        val flag = r.getString(0)
        val est = r.getLong(1)
        val grp = fact.filter($"l_returnflag" === flag)
        val rank = grp.filter($"l_partkey" <= est).count().toDouble /
          grp.count().toDouble
        flag -> rank
      }
      ranks.foreach { case (flag, rank) =>
        assert(rank >= 0.9 - 0.02 && rank <= 0.9 + 0.08,
          s"$flag: qdigest estimate rank $rank outside [0.88, 0.98]")
      }

      // PERCENTILEKLL over the fact → KllMergeAgg over kll blobs
      val kll = fact.groupBy($"l_returnflag")
        .agg(graft.plans.KllSketch
          .percentileKll($"l_quantity", 50.0).as("est"))
      val kllPlan = kll.queryExecution.optimizedPlan.toString
      assert(kllPlan.contains("kll_l_quantity"), s"plan not rewritten:\n$kllPlan")
      kll.collect().foreach { r =>
        val e = exact(r.getString(0))._1
        assert(math.abs(r.getDouble(1) - e) <= 2.0,
          s"${r.getString(0)}: kll ${r.getDouble(1)} off exact $e")
      }

      // a compression/k MISMATCH must fall through to the fact scan
      val wrongCompression = fact.groupBy($"l_returnflag")
        .agg(graft.plans.TDigestSketch
          .percentileTDigest($"l_quantity", 50.0, compression = 500.0))
      assert(!wrongCompression.queryExecution.optimizedPlan.toString
        .contains("td_l_quantity"))
    } finally RollupRewrite.clear()
  }

  test("MV maintenance carries digest blob columns through append/overwrite") {
    import graft.sources.MaterializedView
    val out = Files.createTempDirectory("graft_mv_pct").toString
    val src = Files.createTempDirectory("graft_mv_src_pct").toString
    val day = 86400000L
    def write(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("ms", "k", "v")
        .select(timestamp_millis($"ms").as("ts"), $"k", $"v")
        .write.mode("overwrite").parquet(src)

    val w0 = (0 until 200).map(i => (i * 1000L, s"g${i % 2}", i.toDouble))
    write(w0)
    val source = () => spark.read.parquet(src)
    val d = MaterializedView.ViewDef("ts", day, Seq("k"),
      Seq(graft.plans.TDigestSketch.tdigestState($"v").as("td"),
        count(lit(1)).as("n")))
    val store = new MaterializedView.Store(spark, out, d)
    store.append(source(), 0L)

    // the MV's blob column answers percentile queries via merge
    val p = store.read().groupBy($"k")
      .agg(graft.plans.TDigestSketch
        .tdigestMergePercentile($"td", 50.0).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // g0 holds evens 0..198 (median ~99), g1 odds 1..199 (median ~101)
    assert(math.abs(p("g0") - 99.0) <= 3.0 && math.abs(p("g1") - 101.0) <= 3.0,
      s"mv percentiles off: $p")

    // backfill the window → STALE → OVERWRITE refreshes the blobs
    write(w0 ++ (200 until 300).map(i => (i * 100L, "g0", 1000.0 + i)))
    assert(store.markStaleIfChanged(source(), 0L))
    store.overwrite(source(), 0L)
    val p2 = store.read().groupBy($"k")
      .agg(graft.plans.TDigestSketch
        .tdigestMergePercentile($"td", 90.0).as("p90"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // g0 now has 100 heavy values (1200..1299) in 200 rows: p90 > 1000
    assert(p2("g0") > 1000.0, s"overwritten blob not refreshed: $p2")
  }
}
