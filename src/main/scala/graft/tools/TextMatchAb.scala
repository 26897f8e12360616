package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Solo A/B for q_text_match_fuzzy (round-4 review follow-up): times
  * the round-3 query text against the round-4 extended text on the
  * same session, interleaved best-of-3, to attribute the bench delta
  * to the added predicate shapes vs a regression in the shared ones. */
object TextMatchAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
    docs.count() // warm the scan

    val variants: Seq[(String, String)] = Seq(
      "r3" -> "qery~1 OR \"stream processing\"~2",
      "r4" -> "(qery~1 OR \"stream processing\"~2) AND (\"scan quer*\" OR wind?w)",
      "addedOnly" -> "\"scan quer*\" OR wind?w")
    def run(q: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = docs
        .filter(graft.functions.TextMatch.textMatch(col("text"), q))
        .select(col("doc_id")).orderBy(col("doc_id")).collect().length
      (n.toLong, (System.nanoTime() - t0) / 1e9)
    }
    // one untimed pass each (codegen), then 3 timed interleaved passes
    variants.foreach { case (_, q) => run(q) }
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val rows = scala.collection.mutable.Map[String, Long]()
    (1 to 3).foreach { _ =>
      variants.foreach { case (name, q) =>
        val (n, s) = run(q)
        rows(name) = n
        times(name) = s :: times(name)
      }
    }
    variants.foreach { case (name, _) =>
      println(f"$name%-10s rows=${rows(name)}%6d best=${times(name).min}%.3f s all=${times(name).reverse.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
