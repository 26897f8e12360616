package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: dictionary-served REGEXP_LIKE/LIKE vs the per-row
  * regex scan, same pattern both arms, on the 100x replica. */
object RegexIdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val t = Tables(spark, dir)
    graft.sql.QueryFacade.init(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(sql: String): Int =
      graft.sql.QueryFacade.sql(spark,
        s"SET explicitLimit = true; $sql").collect().length
    val cases = Seq(
      "regex agg" ->
        ("SELECT count(*) AS n FROM part " +
          "WHERE REGEXP_LIKE(p_type, '^(STAND|ECON)')"),
      "regex rows" ->
        ("SELECT p_partkey FROM part " +
          "WHERE REGEXP_LIKE(p_type, '^(STAND|ECON)') AND p_size > 49"),
      "infix like" ->
        ("SELECT count(*) AS n FROM part " +
          "WHERE p_name LIKE '%widget%' AND p_brand NOT LIKE 'Brand#1%'"),
      // the corpus-sized case: 60M events rows at 100x — the regex
      // scan grows with the corpus, the dictionary stays event-type-sized
      "events regex" ->
        ("SELECT count(*) AS n FROM events " +
          "WHERE REGEXP_LIKE(event_type, 'c[hk]')"))
    (1 to 2).foreach { i =>
      cases.foreach { case (label, sql) =>
        graft.sources.RegexpIndex.clear()
        val scan = time(s"$label [$i] scan")(run(sql))
        Seq("p_type", "p_name", "p_brand").foreach(c =>
          graft.sources.RegexpIndex.register("part", t.part, c))
        graft.sources.RegexpIndex.register("events", t.events, "event_type")
        val idx = time(s"$label [$i] indexed")(run(sql))
        println(s"[probe] $label: scan=$scan indexed=$idx")
        require(scan == idx, s"$label mismatch: $scan vs $idx")
      }
    }
    spark.stop()
  }
}
