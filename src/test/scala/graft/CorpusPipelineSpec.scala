package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusPipeline
import graft.functions.VectorFunctions

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus clean filters quality, exact dups, and near dups") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the river bank today"
    val docs = Seq(
      (1L, good),
      (2L, good),                                  // exact dup of 1
      (3L, good.replace("today", "tomorrow")),     // near dup of 1
      (4L, "tiny"),                                // too short
      (5L, "zzz qqq xxx vvv kkk jjj www yyy uuu ttt rrr eee"), // no stopwords
      (6L, "the data engine processes a stream of queries and writes results to the store"))
      .toDF("doc_id", "text")
    val cleaned = CorpusPipeline.clean(docs, "doc_id", "text",
      CorpusPipeline.Config(minTokens = 5, nearDupThreshold = 0.5))
      .select($"doc_id").as[Long].collect().toSet
    assert(cleaned == Set(1L, 6L))
    val stats = CorpusPipeline.stats(docs, "doc_id", "text",
      CorpusPipeline.Config(minTokens = 5, nearDupThreshold = 0.5))
      .as[(String, Long)].collect().toMap
    assert(stats == Map("input" -> 6L, "quality_lang_gate" -> 4L, "deduped" -> 2L))
  }

  test("int8 quantization round-trips within scale/127 error") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val rt = emb.select(
      VectorFunctions.quantizeInt8($"embedding").as("q"),
      transform($"embedding", x => x.cast("double")).as("orig"))
      .select(VectorFunctions.dequantize($"q").as("deq"), $"orig", $"q.scale".as("s"))
      .withColumn("max_err",
        aggregate(zip_with($"deq", $"orig", (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x)))
    val bad = rt.filter($"max_err" > $"s" * 0.5 + 1e-9).count()
    assert(bad == 0)
    // normalized vectors have unit norm
    val n = emb.select(VectorFunctions.vectorNorm(
      VectorFunctions.normalize($"embedding")).as("n"))
      .filter(abs($"n" - 1.0) > 1e-9).count()
    assert(n == 0)
  }

  test("PII redaction replaces typed spans and counts them") {
    import graft.functions.TextFunctions._
    val df = Seq(
      "write bob@corp.io or call +1 (555) 123-4567",
      "ssn 123-45-6789 from 192.168.1.1",
      "clean text, no pii at all").toDF("t")
    val out = df.select(redactPii($"t").as("r"), piiCounts($"t").as("c"))
      .collect()
    assert(out(0).getString(0) == "write [EMAIL] or call [PHONE]")
    assert(out(1).getString(0) == "ssn [SSN] from [IP]")
    assert(out(2).getString(0) == "clean text, no pii at all")
    val c0 = out(0).getStruct(1)
    assert(c0.getAs[Int]("emails") == 1 && c0.getAs[Int]("ssns") == 0)
    val c1 = out(1).getStruct(1)
    assert(c1.getAs[Int]("ssns") == 1 && c1.getAs[Int]("ips") == 1)
  }
}
