package graft
import org.apache.spark.scheduler._
import scala.collection.mutable

object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "67108864"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "1048576"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.PinotFunctions.registerAll(spark)
    val q = args.headOption.getOrElse("q_ann_ivfpq")
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int)]()
    val jobOfStage = mutable.Map[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        js.stageIds.foreach(id => jobOfStage(id) = site)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val label = jobOfStage.getOrElse(si.stageId, si.name.take(50))
        stages += ((si.stageId, label.take(60), dur, si.numTasks))
      }
    })
    // warm pass
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").collect()
    stages.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").collect()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.2f s, ${stages.size} stages")
    stages.sortBy(-_._3).take(25).foreach { case (id, n, d, t) =>
      println(f"stage $id%4d  $d%6d ms  $t%4d tasks  $n")
    }
    println("sum of stage ms: " + stages.map(_._3).sum)
    spark.stop()
  }
}
