package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× A/B for the clpMatch candidate/re-verify split (round-12
  * directive #1). Round 11's plan decoded EVERY message per row
  * (`clpwildcardmatch(clpDecode(lt, dv, ev), wq)`) where the reference
  * prunes on the logtype column first (`ClpRewriter.java:293-345`) and
  * only decodes inexact survivors. The round-12 rewrite ANDs a
  * compiled logtype regex (`ClpFunctions.logtypePrefilterRegex`) in
  * front of the decode+match ground truth — this probe measures the
  * split against the decode-only form on a corpus scaled ~100× past
  * sf0.1 (documents text CLP-encoded, stored as the persisted triple
  * layout the durable extract serves).
  */
object ClpScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.PinotFunctions.registerAll(spark)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val big = spark.range(factor).crossJoin(docs)
      .select((col("id") * 1000000 + col("doc_id")).as("doc_id"),
        col("text"), col("lang"))
      .repartition(cpus.toInt * 2)
    val cfg = graft.sources.ClpLogIngest.Config(
      fieldsForClpEncoding = Seq("text"), removeProcessedFields = true)
    // the persisted-triple layout (one-time encode, like extractDurable)
    val enc = graft.sources.ClpLogIngest.extract(big, cfg).localCheckpoint()
    println(s"[probe] rows = ${enc.count()}")
    enc.createOrReplaceTempView("clp_scale_t")

    def time(name: String)(sql: String): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.sql.QueryFacade.sql(spark,
          s"SET explicitLimit = true; $sql").count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-38s pass$i $s%8.2f s  rows=$n")
      }
    }

    for (w <- Seq("*the*", "* spark batch *", "zzz-no-match *",
        "*code=7*")) {
      // round-12 rewrite: prefilter AND decode+match (via the facade)
      time(s"prefilter+reverify  <$w>")(
        s"SELECT doc_id FROM clp_scale_t WHERE clpMatch(text, '$w')")
      // round-11 shape: decode every row, no candidate pruning
      time(s"decode-only         <$w>")(
        s"SELECT doc_id FROM clp_scale_t WHERE clpwildcardmatch(" +
          s"clpDecode(text_logtype, text_dictionaryVars," +
          s" text_encodedVars), '$w')")
    }
    spark.stop()
  }
}
