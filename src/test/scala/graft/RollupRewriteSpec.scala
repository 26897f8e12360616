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
}
