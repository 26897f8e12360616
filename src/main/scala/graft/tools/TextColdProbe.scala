package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: stage-by-stage cold cost of q_text_match_indexed on
  * a fresh JVM (register → candidate resolution → rewrite → serve). */
object TextColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cold] $label: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    time("bring-up")(spark.range(1).count())
    val t = time("tables")(graft.Tables(spark, sfDir))
    time("facade init")(graft.sql.QueryFacade.init(spark, sfDir))
    time("register")(graft.sources.TextIndex.register(
      "documents", t.documents, "doc_id", "text"))
    time("prewarm")(graft.sources.TextIndex.prewarm(
      "documents", "text", t.documents))
    val entry = graft.sources.TextIndex.lookup("documents", "text").get
    val q = "query AND \"column key\" AND filter*"
    val cand = time("candidateIds plan")(
      graft.functions.TextMatch.candidateIds(q,
        entry.model.dict, entry.model.postings))
    val ids = time("candidateIds collect")(
      cand.get._1.limit(100001).collect().map(_.getLong(0)))
    println(s"[cold] candidates=${ids.length} exact=${cand.get._2}")
    val df = time("facade sql (plan)")(graft.sql.QueryFacade.sql(spark,
      """SET explicitLimit = true;
         SELECT doc_id FROM documents
         WHERE TEXT_MATCH(text, 'query AND "column key" AND filter*')
         ORDER BY doc_id"""))
    time("serve collect")(df.collect())
    time("2nd full query")(graft.sql.QueryFacade.sql(spark,
      """SET explicitLimit = true;
         SELECT doc_id FROM documents
         WHERE TEXT_MATCH(text, 'query AND "column key" AND filter*')
         ORDER BY doc_id""").collect())
    spark.stop()
  }
}
