package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Per-operator metrics probe for the optimization rounds: runs each
  * named query warm (one untimed + one timed pass) and prints the
  * executed plan tree with its SQL metrics (rows, time, shuffle bytes,
  * spill) so the expensive operator is identified by MEASUREMENT, not
  * guesswork (optimization guide §1).
  *
  * Usage: runMain graft.tools.OpProbe q_a,q_b [reps]
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q_corpus_clean")
    val reps = if (args.length > 1) args(1).toInt else 1
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dumpMetrics(plan: SparkPlan, depth: Int): Unit = {
      val p = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q.plan
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          println(("  " * depth) + "ReusedExchangeExec ->" +
            r.child.getClass.getSimpleName)
          return
        case other => other
      }
      if (p ne plan) { dumpMetrics(p, depth); return }
      val interesting = p.metrics.filter { case (k, m) =>
        m.value > 0 && (k.contains("time") || k.contains("Time") ||
          k == "numOutputRows" || k.contains("bytes") || k.contains("Bytes") ||
          k.contains("spill") || k.contains("Spill") || k.contains("duration"))
      }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println(("  " * depth) + p.getClass.getSimpleName + " " + ms)
      p.children.foreach(dumpMetrics(_, depth + 1))
      // follow subquery links (scalar subqueries hide whole pipelines)
      p.subqueries.foreach(dumpMetrics(_, depth + 1))
    }

    val qmap = graft.SparkEntry.queries
    names.foreach { name =>
      qmap.get(name) match {
        case None => println(s"[opprobe] unknown query $name")
        case Some(fn) =>
          try {
            fn(spark, dir).collect() // warm: codegen + index builds
            var best = Double.MaxValue
            var bestDf = fn(spark, dir)
            (1 to reps).foreach { _ =>
              // time build + collect, matching Bench (query construction
              // may run driver-side jobs: kmeans iterations, components)
              val t0 = System.nanoTime()
              val df = fn(spark, dir)
              df.collect()
              val t = (System.nanoTime() - t0) / 1e9
              if (t < best) { best = t; bestDf = df }
            }
            println(f"\n===== $name  wall=${best}%.3f s =====")
            dumpMetrics(bestDf.queryExecution.executedPlan, 0)
          } catch {
            case e: Throwable =>
              println(s"[opprobe] FAILED $name: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
