package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical driver-materialization budget (round-12 directive): every
  * `.collect()` in non-tools main sources is an audited, bounded
  * driver materialization — the per-round hand audit (33 sites as of
  * r11, each adjudicated in PLANS.md / the verdict) becomes a failing
  * gate. A NEW call site fails this spec until it is audited for
  * boundedness (dim-bounded, size-gated, or result-sized) and added to
  * the allowlist below with the audit note. `tools/` probes are
  * exempt — they are measurement harnesses, not the engine. */
class CollectBudgetSpec extends AnyFunSuite {

  /** file -> (allowed count, why those materializations are bounded) */
  private val allowlist: Map[String, (Int, String)] = Map(
    "sql/QueryFacade.scala" -> (7,
      "scalar-subquery/option/IN-ID-SET splices: single-row or LIMIT'd"),
    "functions/TextMatch.scala" -> (4,
      "lucene-clause dictionaries: vocabulary-bounded term sets"),
    "sql/BrokerResponse.scala" -> (2,
      "response rendering: rows already LIMIT'd by the query contract"),
    "sources/TextIndex.scala" -> (2,
      "posting dictionary build: distinct-term bounded, size-gated"),
    "operators/Clustering.scala" -> (2,
      "k-means moments: k x dim driver state only"),
    "Bench.scala" -> (2, "bench harness timing loop"),
    "streaming/KafkaWireBroker.scala" -> (1,
      "test-broker replay of a bounded in-memory topic"),
    "sql/TimeSeriesEndpoint.scala" -> (1,
      "query_range rendering: series-bounded response"),
    "sources/RegexpIndex.scala" -> (1,
      "dictionary candidates: distinct-value capped, honest refusal"),
    "sources/FooterStats.scala" -> (1,
      "footer stats: one row per file, metadata-only"),
    "operators/ScalarQuantize.scala" -> (1,
      "quantile cuts: fixed 255/15-entry codebook"),
    "operators/PqIndex.scala" -> (1, "PQ codebooks: m x 256 x dim"),
    "operators/IvfIndex.scala" -> (1, "IVF centroids: nlist x dim"),
    "operators/Dedup.scala" -> (1,
      "union-find edges: size-gated under 2^20 (else label propagation)"),
    "functions/PinotFunctions.scala" -> (1,
      "lookup-table broadcast: dim-table bounded"),
    "functions/Bpe.scala" -> (1,
      "BPE merge table: vocab-size bounded"),
    "compat/TpchFixtureCompat.scala" -> (1, "gate harness"),
    "compat/SsbCompat.scala" -> (1, "gate harness"),
    "compat/OnTimeCompat.scala" -> (1, "gate harness"),
    "compat/MseCompat.scala" -> (1, "gate harness"))

  test("every non-tools .collect() site is allowlisted with an audit note") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root), s"missing $root")
    val found = scala.collection.mutable.Map.empty[String, Int]
    java.nio.file.Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (rel.endsWith(".scala") && !rel.startsWith("tools/")) {
        val src = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        val n = src.sliding(".collect()".length).count(_ == ".collect()")
        if (n > 0) found(rel) = n
      }
    }
    val unexpected = found.filter { case (f, n) =>
      allowlist.get(f).forall(_._1 < n)
    }
    assert(unexpected.isEmpty,
      "NEW driver materialization site(s) — audit for boundedness " +
        "(dim-bounded / size-gated / result-sized) and extend the " +
        s"allowlist with the audit note: ${unexpected.toSeq.sorted}")
    // and the ledger can't rot: stale entries (file gone or count
    // shrank) must be pruned so the budget stays tight
    val stale = allowlist.filter { case (f, (n, _)) =>
      found.getOrElse(f, 0) < n
    }
    assert(stale.isEmpty,
      s"allowlist overstates the budget — tighten: ${stale.keys.toSeq.sorted}")
  }
}
