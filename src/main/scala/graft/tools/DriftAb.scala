package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo A/B for the three round-5 driver-bench drifts (q_dedup_ttl,
  * q_gapfill, q_dedup_jaccard_exact — none had code changes in round
  * 5): each query runs SOLO on a fresh-ish session, one untimed warm
  * pass then N timed interleaved passes, to adjudicate machine-load
  * variance vs a real plan regression against the round-4 closing
  * numbers (0.41 / 0.46 / 2.34 s at sf0.1). */
object DriftAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_ttl", "q_gapfill", "q_dedup_jaccard_exact")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm pass is PRINTED (not discarded): it shows where one-time
    // index build/load cost lands relative to the steady-state passes
    val warm = queries.map(q => q -> run(q)).toMap
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      queries.foreach(q => times(q) = run(q) :: times(q))
    }
    queries.foreach { q =>
      println(f"$q%-24s warm=${warm(q)}%.3f s  best=${times(q).min}%.3f s  " +
        f"median=${times(q).sorted.apply(times(q).size / 2)}%.3f s  " +
        s"all=${times(q).reverse.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
