package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: is q_agg_metadata's aggregate actually served from
  * the footer-statistics table at the 100x replica? */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      val q = time(s"build [$i]")(SparkEntry.queries("q_agg_metadata")(spark, dir))
      val rows = time(s"collect [$i]")(q.collect())
      println(s"[probe] used_metadata=${rows.head.getBoolean(rows.head.length - 1)}")
      if (i == 3) {
        val plan = q.queryExecution.executedPlan.toString
        println("[probe] plan head:\n" +
          plan.linesIterator.take(12).mkString("\n"))
      }
    }
    spark.stop()
  }
}
