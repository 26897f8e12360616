package graft.tools

import org.apache.spark.sql.SparkSession
import graft.compat.MseCompat

/** Iteration tool: run the reference's MSE query suites through the
  * engine and write a full outcome report to target/mse_report.txt.
  * Optional arg 1 = filter substring on "file:suite". */
object MseCompatProbe {
  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("mse-compat")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val suites = MseCompat.loadSuites()
      .filter(s => filter.isEmpty || s"${s.file}:${s.name}".contains(filter))
    val results = {
      graft.functions.PinotFunctions.registerAll(spark)
      MseCompat.DialectConf.foreach { case (k, v) => spark.conf.set(k, v) }
      suites.flatMap(MseCompat.runSuite(spark, _))
    }

    val sb = new StringBuilder
    results.groupBy(_.c.file).toSeq.sortBy(_._1).foreach { case (f, rs) =>
      val s = MseCompat.summary(rs)
      sb.append(f"$f%-34s pass=${s("pass")}%4d ran=${s("ran")}%4d " +
        f"mism=${s("mismatch")}%4d err=${s("error")}%4d skip=${s("skipped")}%4d\n")
    }
    val tot = MseCompat.summary(results)
    sb.append(s"\nTOTAL: $tot of ${results.size}\n\n== FAILURES ==\n")
    results.foreach { r =>
      r.outcome match {
        case MseCompat.Mismatch(d) =>
          sb.append(s"MISMATCH ${r.id}\n  sql: ${r.c.sql.replaceAll("\\s+", " ").take(220)}\n  $d\n")
        case MseCompat.Failed(e) =>
          sb.append(s"ERROR ${r.id}\n  sql: ${r.c.sql.replaceAll("\\s+", " ").take(220)}\n  ${e.replaceAll("\\s+", " ").take(260)}\n")
        case _ =>
      }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("target/mse_report.txt"), sb.toString)
    println(sb.toString.linesIterator.take(60).mkString("\n"))
    println(s"full report: target/mse_report.txt  TOTAL: $tot of ${results.size}")
    spark.stop()
  }
}
