package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does the 100x indexed TEXT_MATCH time go. */
object TextIdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_sf10"
    val t = Tables(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val model = time("build")(
      graft.sources.TextIndex.build(t.documents, "doc_id", "text"))
    graft.sql.QueryFacade.init(spark, dir)
    graft.sources.TextIndex.register("documents", t.documents,
      "doc_id", "text")
    Seq(
      "flagship indexed" -> "query AND \"column key\" AND filter*",
      "selective phrase" -> "\"big data stream\"",
      "unselective mixed" -> "query AND \"the stream\" OR filter*",
      "exact boolean" -> "query AND stream AND filter").foreach {
      case (label, q) =>
        (1 to 2).foreach { i =>
          val n = time(s"$label [$i] (indexed)") {
            graft.sql.QueryFacade.sql(spark,
              "SET explicitLimit = true; SELECT doc_id FROM documents " +
                s"WHERE TEXT_MATCH(text, '$q')").collect().length
          }
          val m = time(s"$label [$i] (scan)") {
            t.documents.filter(graft.functions.TextMatch.textMatch(
              col("text"), q)).select("doc_id").collect().length
          }
          println(s"[probe] $label: indexed=$n scan=$m")
        }
    }
    spark.stop()
  }
}
