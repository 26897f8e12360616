package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: prints explain("formatted") for selected
  * queries so scan pruning / pushdown / broadcast / codegen spans can be
  * audited (run: sbt 'Test/runMain graft.PlanAudit q1_pricing_summary ...'). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
