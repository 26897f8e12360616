package graft

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators._

/** Fluent entry points for the pipeline operators:
  *
  * {{{
  * import graft.syntax._
  * docs.dedupExactKeepFirst("doc_id", "text")
  *     .chunkOverlap("doc_id", "text", chunkTokens = 512, stride = 256)
  * emb.annTopK("vec_id", "embedding", probes, "vec_id", k = 10)
  * }}}
  *
  * Thin forwarding only — every method delegates to the documented
  * operator object, which remains the API of record.
  */
object syntax {

  implicit class GraftDocOps(private val df: DataFrame) extends AnyVal {

    /** Exact dedup: keep the smallest id per identical content. */
    def dedupExactKeepFirst(idCol: String, textCol: String): DataFrame = {
      val keep = Dedup.exact(df, idCol, textCol)
        .select(org.apache.spark.sql.functions.col("keep_id").as(idCol))
      df.join(keep, idCol)
    }

    def minhashNearDupPairs(idCol: String, textCol: String,
        threshold: Double = 0.8): DataFrame =
      Dedup.minhashLsh(df, idCol, textCol, threshold)

    def corpusClean(idCol: String, textCol: String,
        cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
      CorpusPipeline.clean(df, idCol, textCol, cfg)

    def chunkOverlap(idCol: String, textCol: String, chunkTokens: Int,
        stride: Int): DataFrame =
      Curation.chunkOverlap(df, idCol, textCol, chunkTokens, stride)

    def packFfd(idCol: String, nTokens: Column, capacity: Long,
        shards: Int = 64): DataFrame =
      Curation.packBinsFfd(df, idCol, nTokens, capacity, shards)

    def assignSplits(idCol: String, trainPerMille: Int,
        valPerMille: Int): DataFrame =
      Curation.assignSplit(df, idCol, trainPerMille, valPerMille)

    def mixByTemperature(idCol: String, strataCol: String,
        alpha: Double): DataFrame =
      Curation.mixByTemperature(df, idCol, strataCol, alpha)

    def dedupTtl(keys: Seq[String], timeMillis: Column,
        ttlMillis: Long): DataFrame =
      Upsert.dedupTtl(df, keys, timeMillis, ttlMillis)

    def bm25TopK(idCol: String, textCol: String,
        queries: Seq[(String, Seq[String])], k: Int): DataFrame =
      Bm25.topK(df, idCol, textCol, queries, k)

    def annTopK(idCol: String, vecCol: String, probe: Seq[Double],
        k: Int): DataFrame =
      Similarity.bruteForceTopK(df, idCol, vecCol, probe, k)

    /** Graph-ANN top-k: build (or reuse the memoized) HNSW index over
      * this corpus and beam-search it with `probes`. */
    def hnswTopK(idCol: String, vecCol: String, probes: DataFrame,
        probeId: String, k: Int, ef: Int = 64): DataFrame =
      HnswIndex.search(
        HnswIndex.build(df, idCol, vecCol), probes, probeId, vecCol, k, ef)

    /** Compose this frame (OFFLINE) with realtime tails into one
      * logical-table view under the min time-boundary strategy. */
    def withRealtimeTail(timeCol: String, realtime: DataFrame*): DataFrame =
      graft.schema.LogicalTable.view(graft.schema.LogicalTable.Config(
        "logical",
        graft.schema.LogicalTable.Physical("offline_OFFLINE", df, "OFFLINE") +:
          realtime.zipWithIndex.map { case (rt, i) =>
            graft.schema.LogicalTable.Physical(s"rt${i}_REALTIME", rt, "REALTIME")
          },
        timeCol))
  }
}
