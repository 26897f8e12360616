package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm count")(docs.count())
    time("tokens only")(docs.select(explode(TextFunctions.tokens(col("text")))).count())
    time("shingles only")(docs.select(explode(TextFunctions.shingles(col("text"), 3))).count())
    time("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("lsh full")(println("pairs=" + Dedup.minhashLsh(docs, "doc_id", "text", 0.0).count()))
    time("lsh again")(Dedup.minhashLsh(docs, "doc_id", "text", 0.0).count())
    spark.stop()
  }
}
