package graft
object ProbeApprox {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val q = graft.queries.AllQueries.all.find(_.name == "q_agg_approx").get
    val df = q.build(spark, "/root/testdata/sf0.1")
    df.show(5, false)
    time("q_agg_approx") { df.collect() }
    spark.stop()
  }
}
