package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Scratch timing probe (not part of the library surface). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // plan invariant: LSH banded self-joins must reuse the signature
    // exchange (one map job feeding both join sides)
    val pairs = Dedup.simhashPairs(t.documents, "doc_id", "text", maxDist = 3)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    println("[probe] simhashPairs ReusedExchange: " + plan.contains("ReusedExchange"))
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_simhash", "q_dedup_minhash", "q_dedup_embedding",
        "q_ann_ivf", "q_ann_lsh", "q_corpus_clean")
    for (q <- names; gq <- graft.queries.AllQueries.all.find(_.name == q)) {
      time(s"$q warm0") { gq.build(spark, dir).collect().length.toLong }
      time(s"$q warm1") { gq.build(spark, dir).collect().length.toLong }
    }
    spark.stop()
  }
}
