package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Scratch timing probe (not part of the library surface). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val t = Tables(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("minhashLsh t=0.5 count") {
      Dedup.minhashLsh(t.documents, "doc_id", "text", 0.5, 32, 8, 3).count()
    }
    time("minhashLsh t=0.5 count (2nd)") {
      Dedup.minhashLsh(t.documents, "doc_id", "text", 0.5, 32, 8, 3).count()
    }
    val shSlice = t.documents
      .select(col("doc_id").as("id"),
        transform(TextFunctions.shingles(col("text"), 3), s => xxhash64(s)).as("sh"))
      .filter(size(col("sh")) > 0).filter(col("id") < 200)
    time("exactHigh brute 200") {
      val j = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))).cast("double")
      shSlice.as("a").crossJoin(shSlice.as("b"))
        .filter(col("a.id") < col("b.id")).filter(j >= 0.9).count()
    }
    val q = graft.queries.AllQueries.all.find(_.name == "q_dedup_minhash").get
    time("full q_dedup_minhash run1") { q.build(spark, dir).collect().length.toLong }
    time("full q_dedup_minhash run2") { q.build(spark, dir).collect().length.toLong }
    time("full q_dedup_minhash run3") { q.build(spark, dir).collect().length.toLong }
    spark.stop()
  }
}
