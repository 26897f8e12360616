package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Round-14 optimization A/B probe: measures each candidate rewrite
  * against the current shape on the bench data BEFORE any operator is
  * touched (guide §1 — measure first). Every variant also prints its
  * result checksum so a rewrite that drifts is caught immediately.
  */
object R14Ab {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)
    val docs = t.documents
    val li = t.lineitem

    def time(name: String, reps: Int = 3)(f: => String): Unit = {
      f // warm
      var best = Double.MaxValue
      var out = ""
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        out = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[ab] $name%-44s ${best}%8.3f s   $out")
    }

    // ——— 1. corpus gate: current shape vs tokens-materialized ———
    val text = col("text")
    val gateCond =
      TextFunctions.tokenCount(text).between(5, 100000) &&
        TextFunctions.qualityScore(text) >= 0.3 &&
        TextFunctions.langId(text).isin("en")
    time("gate/current (agg of gateCond)") {
      docs.agg(count(when(gateCond, 1))).collect()(0).toString
    }
    // variant: compute the token arrays ONCE per row in a projection,
    // derive every gate signal from the materialized columns
    val enStop = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
    val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")
    val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "des", "pour", "dans")
    def hitsOn(tl: Column, words: Seq[String]): Column =
      size(filter(tl, x => array_contains(array(words.map(lit): _*), x)))
    val proj = docs.select(text.as("text"),
      TextFunctions.tokens(text).as("__tk"),
      TextFunctions.tokens(lower(text)).as("__tkl"))
    val n2 = size(col("__tk")).cast("double")
    val meanLen2 = when(size(col("__tk")) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s", "")).cast("double") / n2)
    val lenOk2 = when(meanLen2 >= 3 && meanLen2 <= 10, lit(1.0)).otherwise(lit(0.0))
    val stopRatio2 = when(size(col("__tk")) === 0, lit(0.0))
      .otherwise(hitsOn(col("__tkl"), enStop).cast("double") / n2)
    val stopOk2 = when(stopRatio2 > 0.01, lit(1.0)).otherwise(lit(0.0))
    val punctOk2 = when(TextFunctions.punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.0))
    val q2 = (lenOk2 + stopOk2 + punctOk2) / lit(3.0)
    val en2 = hitsOn(col("__tkl"), enStop)
    val de2 = hitsOn(col("__tkl"), deStop)
    val fr2 = hitsOn(col("__tkl"), frStop)
    val lang2 = when(en2 >= de2 && en2 >= fr2 && en2 > 0, lit("en"))
      .when(de2 >= fr2 && de2 > 0, lit("de"))
      .when(fr2 > 0, lit("fr")).otherwise(lit("unknown"))
    val gate2 = size(col("__tk")).between(5, 100000) && q2 >= 0.3 && lang2.isin("en")
    time("gate/tokens-materialized") {
      proj.agg(count(when(gate2, 1))).collect()(0).toString
    }

    // ——— 2. repetitionRatio: current vs hashed-bigram over element_at ———
    time("repratio/current") {
      docs.agg(sum(round(graft.operators.Curation.repetitionRatio(text), 4)))
        .collect()(0).toString
    }
    val hs = docs.select(col("doc_id"),
      transform(TextFunctions.tokens(lower(text)), tk => xxhash64(tk)).as("__hs"))
    val nn = size(col("__hs"))
    val bigramHashes = transform(sequence(lit(1), greatest(nn - 1, lit(0))),
      i => xxhash64(element_at(col("__hs"), i), element_at(col("__hs"), i + 1)))
    val rr2 = when(nn < 2, 0.0).otherwise(
      lit(1.0) - size(array_distinct(bigramHashes)).cast("double") /
        (nn - 1).cast("double"))
    time("repratio/hashed-elementat") {
      hs.agg(sum(round(rr2, 4))).collect()(0).toString
    }
    // Column-pure form: bind the token-hash array once as a lambda var
    // (transform over a 1-element array) so element_at stays O(1)
    // without needing a separate materializing projection
    def rrLambda(textC: Column): Column = {
      val hsExpr = transform(TextFunctions.tokens(lower(textC)), tk => xxhash64(tk))
      element_at(transform(array(hsExpr), h => {
        val n = size(h)
        val bg = transform(sequence(lit(1), greatest(n - 1, lit(0))),
          i => xxhash64(element_at(h, i), element_at(h, i + 1)))
        when(n < 2, 0.0).otherwise(
          lit(1.0) - size(array_distinct(bg)).cast("double") /
            (n - 1).cast("double"))
      }), 1)
    }
    time("repratio/lambda-bound") {
      docs.agg(sum(round(rrLambda(text), 4))).collect()(0).toString
    }

    // ——— 3. decimal sum: the QH exact-sum discipline ———
    time("decsum/decimal(20,6) x4") {
      li.agg(
        sum(expr("CAST(l_extendedprice AS DECIMAL(20,6))")),
        sum(expr("CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,6))")),
        sum(expr("CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(20,6))")),
        sum(expr("CAST(l_quantity AS DECIMAL(20,6))"))).collect()(0).toString
    }
    time("decsum/bigint-scaled x4") {
      li.agg(
        sum(expr("CAST(ROUND(l_extendedprice*1000000) AS BIGINT)")),
        sum(expr("CAST(ROUND(l_extendedprice*(1-l_discount)*1000000) AS BIGINT)")),
        sum(expr("CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT)")),
        sum(expr("CAST(ROUND(l_quantity*1000000) AS BIGINT)"))).collect()(0).toString
    }
    time("decsum/double x4 (reference floor)") {
      li.agg(sum(col("l_extendedprice")),
        sum(expr("l_extendedprice*(1-l_discount)")),
        sum(expr("l_extendedprice*(1-l_discount)*(1+l_tax)")),
        sum(col("l_quantity"))).collect()(0).toString
    }
    time("decsum/decimal(18,6) x4") {
      li.agg(
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,6))")),
        sum(expr("CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))")),
        sum(expr("CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))")),
        sum(expr("CAST(l_quantity AS DECIMAL(18,6))"))).collect()(0).toString
    }
    // overflow-safe at any scale: exact integer sum in a decimal(26,0)
    // (compact-long fast path until 1e18, graceful BigDecimal beyond),
    // single exact division at the end → same double as the (20,6) form
    time("decsum/bigint-as-decimal(26,0) x4") {
      li.agg(
        (sum(expr("CAST(CAST(ROUND(l_extendedprice*1000000) AS BIGINT) AS DECIMAL(26,0))")) / lit(1000000)).cast("double"),
        (sum(expr("CAST(CAST(ROUND(l_extendedprice*(1-l_discount)*1000000) AS BIGINT) AS DECIMAL(26,0))")) / lit(1000000)).cast("double"),
        (sum(expr("CAST(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT) AS DECIMAL(26,0))")) / lit(1000000)).cast("double"),
        (sum(expr("CAST(CAST(ROUND(l_quantity*1000000) AS BIGINT) AS DECIMAL(26,0))")) / lit(1000000)).cast("double")).collect()(0).toString
    }
    time("decsum/current-dsum x4 (double out)") {
      li.agg(graft.queries.QH.dsum(col("l_extendedprice")),
        graft.queries.QH.dsum(expr("l_extendedprice*(1-l_discount)")),
        graft.queries.QH.dsum(expr("l_extendedprice*(1-l_discount)*(1+l_tax)")),
        graft.queries.QH.dsum(col("l_quantity"))).collect()(0).toString
    }
    time("decsum/fast-dsum4 x4 (double out)") {
      def fd(c: Column): Column =
        (sum(round(c * 10000).cast("long").cast(org.apache.spark.sql.types.DecimalType(26, 0))) / lit(10000)).cast("double")
      li.agg(fd(col("l_extendedprice")),
        fd(expr("l_extendedprice*(1-l_discount)")),
        fd(expr("l_extendedprice*(1-l_discount)*(1+l_tax)")),
        fd(col("l_quantity"))).collect()(0).toString
    }

    // ——— 4. ULL: mixed countDistinct vs split aggregates ———
    time("ull/mixed countDistinct+ull") {
      li.groupBy(col("l_returnflag"))
        .agg(graft.plans.UltraLogLogSketch.distinctCountUll(col("l_partkey"))
          .as("est"), countDistinct(col("l_partkey")).as("n"))
        .orderBy(col("l_returnflag")).collect().mkString("|")
    }
    time("ull/split + join") {
      val a = li.groupBy(col("l_returnflag"))
        .agg(graft.plans.UltraLogLogSketch.distinctCountUll(col("l_partkey")).as("est"))
      val b = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n"))
      a.join(b, "l_returnflag").orderBy(col("l_returnflag")).collect().mkString("|")
    }

    // ——— 5. minhash signatures: window-lead vs element_at shingles ———
    time("minhash/current window-lead") {
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
        .agg(sum(expr("aggregate(signature, 0L, (a, x) -> a ^ x) % 1000000007L")))
        .collect()(0).toString
    }
    val toksH = docs.select(col("doc_id").as("id"),
      transform(TextFunctions.tokens(lower(text)), tk => xxhash64(tk)).as("__hs"))
    val nT = size(col("__hs"))
    val shingleH = transform(sequence(lit(1), greatest(nT - 2, lit(0))),
      i => xxhash64(element_at(col("__hs"), i),
        element_at(col("__hs"), i + 1), element_at(col("__hs"), i + 2)))
    val explodedV = toksH.select(col("id"), explode(shingleH).as("h0"))
    val minsV = (0 until 32).map(i => min(xxhash64(lit(i), col("h0"))).as(s"h$i"))
    time("minhash/elementat-shingles") {
      explodedV.groupBy(col("id"))
        .agg(minsV.head, minsV.tail: _*)
        .select(col("id"), array((0 until 32).map(i => col(s"h$i")): _*).as("signature"))
        .agg(sum(expr("aggregate(signature, 0L, (a, x) -> a ^ x) % 1000000007L")))
        .collect()(0).toString
    }

    spark.stop()
  }
}
// appended: second-lap probes (scan-stage parallelism)
object R14Ab2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val t = graft.Tables(spark, dir)
    val docs = t.documents
    def time(name: String, reps: Int = 3)(f: => String): Unit = {
      f
      var best = Double.MaxValue; var out = ""
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime(); out = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[ab2] $name%-44s ${best}%8.3f s   $out")
    }
    println("[ab2] docs scan partitions: " + docs.rdd.getNumPartitions)
    val gate = graft.functions.TextFunctions.gatePass(col("text"), 5, 100000, 0.3, Set("en"))
    time("gate-agg/as-is") {
      docs.select(gate.as("g"), md5(col("text")).as("h"))
        .agg(count(when(col("g"), 1)), countDistinct(when(col("g"), col("h"))))
        .collect()(0).toString
    }
    time("gate-agg/repartitioned") {
      docs.repartition(32).select(gate.as("g"), md5(col("text")).as("h"))
        .agg(count(when(col("g"), 1)), countDistinct(when(col("g"), col("h"))))
        .collect()(0).toString
    }
    time("minhash/as-is") {
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
        .agg(sum(expr("aggregate(signature, 0L, (a, x) -> a ^ x) % 1000000007L"))).collect()(0).toString
    }
    time("minhash/repartitioned") {
      graft.operators.Dedup.minhashSignatures(docs.repartition(32), "doc_id", "text", 32, 3)
        .agg(sum(expr("aggregate(signature, 0L, (a, x) -> a ^ x) % 1000000007L"))).collect()(0).toString
    }
    // interleaved A/B of the uncertain ensure() placements: with the
    // operators now calling ensure() internally, the "as-is" variant IS
    // the ensure()d one; the coalesce(1) input reproduces the old
    // single-partition shape for comparison under identical load.
    val docs1 = docs.coalesce(1)
    def simhashChk(d: org.apache.spark.sql.DataFrame): String =
      graft.operators.Dedup.simhash(d, "doc_id", "text")
        .agg(sum(expr("simhash % 1000000007L"))).collect()(0).toString
    def unigramChk(d: org.apache.spark.sql.DataFrame): String =
      graft.operators.Curation.unigramScore(d, "doc_id", "text")
        .agg(sum(round(col("avg_neg_logp"), 4))).collect()(0).toString
    for (i <- 1 to 3) {
      time(s"simhash/ensured r$i", 2) { simhashChk(docs) }
      time(s"simhash/1part r$i", 2) { simhashChk(docs1) }
      time(s"unigram/ensured r$i", 2) { unigramChk(docs) }
      time(s"unigram/1part r$i", 2) { unigramChk(docs1) }
    }
    spark.stop()
  }
}
