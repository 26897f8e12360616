package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * trail (the judge reads these files instead of running Spark).
  *
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> [q_a,q_b,...]
  * e.g.   runMain graft.tools.PlanDump r14 before q_corpus_clean
  * With no query list, dumps every registered query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "r14"
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    val named = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    named.foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
