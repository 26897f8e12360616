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

    def ab(view: String, field: String, wildcards: Seq[String]): Unit =
      for (w <- wildcards) {
        // round-12 rewrite: prefilter AND decode+match (via the facade)
        time(s"prefilter+reverify  <$w>")(
          s"SELECT doc_id FROM $view WHERE clpMatch($field, '$w')")
        // round-11 shape: decode every row, no candidate pruning
        time(s"decode-only         <$w>")(
          s"SELECT doc_id FROM $view WHERE clpwildcardmatch(" +
            s"clpDecode(${field}_logtype, ${field}_dictionaryVars," +
            s" ${field}_encodedVars), '$w')")
      }
    // "* the *" / "* spark batch *" / "zzz-no-match *" carry
    // verbatim-required tokens -> prefilter fires; "*the*" is
    // placeholder-satisfiable -> suppressed (control: both forms
    // identical by construction)
    ab("clp_scale_t", "text",
      Seq("* the *", "* spark batch *", "zzz-no-match *", "*the*"))

    // var-heavy corpus — the reference's actual operating point: log
    // lines where most tokens are variables, so decode rebuilds a long
    // string per row while the logtype stays short and repetitive
    val heavy = big.select(col("doc_id"), concat(
        lit("req="), col("doc_id"), lit(" user=u"), col("doc_id") % 997,
        lit(" sev="),
        when(col("doc_id") % 97 === 0, "panic").otherwise("info"),
        lit(" lat_ms="), (col("doc_id") % 3500) + 12,
        lit(" code="), col("doc_id") % 7,
        lit(" host=node-"), col("doc_id") % 64,
        lit(" msg="), substring(col("text"), 1, 40)).as("msg"))
    val hEnc = graft.sources.ClpLogIngest.extract(heavy,
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("msg"),
        removeProcessedFields = true)).localCheckpoint()
    println(s"[probe] var-heavy rows = ${hEnc.count()}")
    hEnc.createOrReplaceTempView("clp_heavy_t")
    // "* sev=panic *" is the reference's operating point: a literal
    // token selects ~1% while every other token is a variable — the
    // prefilter skips the per-row message reconstruction for the 99%.
    // "* host=node-3 *" / "* code=3 *" target VARIABLES with exact
    // space-bounded tokens: served by the clpvarsmatch candidate
    // (array_contains on dictionaryVars — the ClpRewriter.java:398-437
    // analog). "*lat_ms=99999*" / "*lat_ms=13 *" are INFIX variable
    // targets — round 13 serves them with the wildcard-variable
    // candidate (ClpRewriter.java:438-466 analog: contains over the
    // space-joined var arrays), where round 12 decoded every row.
    ab("clp_heavy_t", "msg",
      Seq("* sev=panic *", "* sev=nosuch *", "* host=node-3 *",
        "* code=3 *", "* lat_ms=13 *", "*lat_ms=99999*", "*lat_ms=13 *"))

    // encoded-variable infix: standalone ints land in encodedVars, so
    // a pure-digit run keeps BOTH arrays as candidates (dict contains
    // OR a contains over the element-wise Long→String cast rendering)
    val ints = big.select(col("doc_id"), concat(
        lit("evt "), col("doc_id") * 7919 % 1000000,
        lit(" status ok seq "), col("doc_id")).as("msg"))
    val iEnc = graft.sources.ClpLogIngest.extract(ints,
      graft.sources.ClpLogIngest.Config(fieldsForClpEncoding = Seq("msg"),
        removeProcessedFields = true)).localCheckpoint()
    println(s"[probe] int-var rows = ${iEnc.count()}")
    iEnc.createOrReplaceTempView("clp_int_t")
    ab("clp_int_t", "msg", Seq("*99917*", "* 99917 *", "*917 st*"))
    spark.stop()
  }
}
