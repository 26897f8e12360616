package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration tool: split per-query wall time into plan construction,
  * analysis+optimization, and execution, to localize constant
  * per-query overhead (round-2 verdict: small-query latency grew
  * ~1.6× with the registry/extension growth). */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_orderby_nulls", "q_join_nullsafe", "q_win_rank", "q_join_theta")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm: flagship + each probe query once (codegen, parquet footers)
    try graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).collect()
    catch { case _: Throwable => }
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).collect()
      catch { case _: Throwable => }
    }
    println("query                     build     plan     exec  (ms, best of 5)")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      var bBuild, bPlan, bExec = Double.MaxValue
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.collect()
        val t3 = System.nanoTime()
        bBuild = math.min(bBuild, (t1 - t0) / 1e6)
        bPlan = math.min(bPlan, (t2 - t1) / 1e6)
        bExec = math.min(bExec, (t3 - t2) / 1e6)
      }
      println(f"$n%-22s $bBuild%8.1f $bPlan%8.1f $bExec%8.1f")
    }
    spark.stop()
  }
}
