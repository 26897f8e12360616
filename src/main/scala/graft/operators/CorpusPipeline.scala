package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** End-to-end training-corpus cleaning: the composition a 100 TB data
  * pipeline actually runs — quality filter → language filter → exact
  * dedup → near-dup removal — as one declarative operator.
  *
  * Each stage is one of this library's primitives (TextFunctions,
  * Dedup); composing them keeps everything in a single Catalyst plan:
  * the quality/language predicates run during the first scan, dedup
  * adds its hash-groupBy, and MinHash-LSH only sees survivors.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minQuality: Double = 0.3,
      languages: Set[String] = Set("en"),
      nearDupThreshold: Double = 0.8,
      minhashBits: Int = 32,
      bands: Int = 8)

  /** Returns the cleaned corpus (same schema as input). Survivor rule:
    * passes quality gates, keeps the smallest id of each exact-dup
    * group, and drops the larger id of every near-dup pair. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val text = col(textCol)
    // r14 perf: one-pass gate (token array bound once per row) —
    // identical predicate to composing tokenCount/qualityScore/langId,
    // at 1× tokenization cost instead of ~8× (TextFunctions.gatePass)
    val gated = Parallelism.ensure(docs, idCol)
      .filter(TextFunctions.gatePass(text, cfg.minTokens,
        cfg.maxTokens, cfg.minQuality, cfg.languages))

    // exact dedup: keep the smallest id per content hash. Cached: the
    // survivor set feeds BOTH the MinHash candidate generation and the
    // final anti-join — without caching the whole gate+dedup prefix
    // would execute twice.
    val keep = Dedup.exact(gated, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactDeduped = gated.join(keep, idCol).cache()

    // near-dup removal: transitive closure over the LSH pair graph,
    // keep one representative per duplicate CLUSTER. (Dropping the
    // larger id of each pair under-dedups transitive chains: with
    // pairs (2,9),(1,9) it keeps both 1 and 2 although 1~9~2.)
    val pairs = Dedup.minhashLsh(exactDeduped, idCol, textCol,
      cfg.nearDupThreshold, cfg.minhashBits, cfg.bands)
    Dedup.keepRepresentatives(exactDeduped, idCol, pairs)
  }

  /** Per-stage survivor counts, for pipeline observability. */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val text = col(textCol)
    val total = docs.count()
    val gated = docs.filter(TextFunctions.gatePass(text, cfg.minTokens,
      cfg.maxTokens, cfg.minQuality, cfg.languages))
    val nGated = gated.count()
    val cleaned = clean(docs, idCol, textCol, cfg).count()
    import docs.sparkSession.implicits._
    Seq(("input", total), ("quality_lang_gate", nGated), ("deduped", cleaned))
      .toDF("stage", "n_docs")
  }
}
