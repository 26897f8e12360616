package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scan-parallelism guard for compute-heavy map stages (r14, guide
  * §2.5 "input skew: one huge unsplittable file — repartition
  * immediately after the read").
  *
  * The driver's testdata parquet files carry a SINGLE row group, so a
  * scan yields one non-empty partition no matter what
  * maxPartitionBytes / minPartitionNum ask for — and every map-side
  * text pipeline (tokenize, shingle-hash, gate scoring) runs on one
  * core. `ensure` hash-repartitions to the session parallelism ONLY
  * when the input is under-parallel; with real multi-row-group /
  * multi-file inputs (any production scale) it is an identity, so
  * nothing here is tuned to local[32]. Hash (not round-robin)
  * partitioning: no sort-before-repartition pass, deterministic under
  * retries (guide §2.5). Callers must be row-order-insensitive.
  */
object Parallelism {
  // r15 (ADVICE r14): df.rdd.getNumPartitions forces full physical
  // planning + RDD conversion of the input plan on EVERY operator
  // call (minhashSignatures, shingleHashStream, dsirWeightsFlagged…
  // call ensure() once per build). The guard's decision depends only
  // on (canonicalized input plan, session parallelism), so memoize it
  // for the session's lifetime — library operators probe a handful of
  // distinct base-table plans, and the cached value is an Int. A hash
  // collision could only flip a PERFORMANCE decision (callers are
  // row-order-insensitive; repartition-or-not never changes results).
  private val probed =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]()
  def ensure(df: DataFrame, keyCol: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val key = (df.queryExecution.analyzed.semanticHash(), p)
    val n = probed.computeIfAbsent(key, _ => df.rdd.getNumPartitions)
    if (n < p) df.repartition(p, col(keyCol)) else df
  }
}
