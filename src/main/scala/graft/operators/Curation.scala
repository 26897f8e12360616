package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-data curation operators beyond dedup: deterministic
  * train/val/test splits and benchmark decontamination. North-star
  * pipeline ops (no reference analog — Pinot is the query layer; these
  * are the curation passes an LLM data pipeline runs on the same
  * tables).
  */
object Curation {

  /** Stable split bucket in [0, buckets): md5-based so any engine can
    * reproduce the assignment from the id alone (mirrorable in SQL as
    * `md5(id)` prefix arithmetic — unlike xxhash64, md5 is universal).
    * Rows never migrate between splits when the corpus grows — the
    * property random() splits lack. */
  def splitBucket(id: Column, buckets: Int): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Deterministic train/val/test assignment by per-mille weight:
    * e.g. weights = (980, 10, 10). */
  def assignSplit(df: DataFrame, idCol: String,
      trainPerMille: Int, valPerMille: Int): DataFrame = {
    val b = splitBucket(col(idCol), 1000)
    df.withColumn("split",
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }

  /** Benchmark decontamination: flag training docs sharing >= minHits
    * word-shingle n-grams with any eval-set document. The shingle
    * spaces are hashed (one shuffle each, fixed-size keys), the overlap
    * is an equi-join on the 64-bit shingle hash — never a text×text
    * comparison. At 100 TB the eval side is tiny and broadcastable; the
    * train side streams through one join + one aggregate.
    * Returns (train id, n_shared_shingles). */
  def contaminated(
      train: DataFrame, trainId: String, trainText: String,
      eval_ : DataFrame, evalText: String,
      shingleSize: Int = 3, minHits: Int = 2): DataFrame = {
    val trainSh = Dedup
      .shingleHashStream(train.select(col(trainId), col(trainText)),
        trainId, trainText, shingleSize)
    val evalSh = Dedup
      .shingleHashStream(
        eval_.select(monotonically_increasing_id().as("__eid"),
          col(evalText)),
        "__eid", evalText, shingleSize)
      .select(col("sh")).distinct()
    trainSh.join(broadcast(evalSh), "sh")
      .groupBy(col(trainId))
      .agg(count(lit(1)).as("n_shared_shingles"))
      .filter(col("n_shared_shingles") >= minHits)
  }

  /** Broadcast vocabulary cap for [[unigramScore]]: corpus vocabulary
    * is heavy-tailed and UNBOUNDED at 100 TB, so only the most
    * frequent `VocabCap` tokens travel in the broadcast; rarer tokens
    * score at the smoothed OOV floor (tf = 0.5 — standard unigram-LM
    * smoothing, and a tight approximation: every capped-out token has
    * true tf below any kept token, so its true −log p is within
    * log(2·tf_min) of the floor). Below the cap the result is exactly
    * the uncapped computation. */
  val VocabCap: Int = 1 << 18

  /** Unigram-LM score: train a unigram language model ON the corpus
    * (token relative frequencies) and score each document by the mean
    * negative log-probability of its tokens — the cheap proxy for
    * perplexity-based quality filtering (degenerate/unnatural text
    * scores high). Two shuffles: one groupBy for the frequency table
    * (df-capped to [[VocabCap]] rows, broadcast back), one per-doc
    * aggregate. The broadcast is BOUNDED regardless of corpus size;
    * the token total still counts every occurrence.
    * Returns (id, n_tokens, avg_neg_logp). */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String,
      vocabCap: Int = VocabCap): DataFrame = {
    // r14 perf: materialize the exploded token stream once — it feeds
    // the frequency table AND the per-doc scoring join, which each
    // re-ran the tokenizing scan before (two Generate pipelines of
    // ~0.25 s each at sf0.1; at 100 TB one corpus scan saved).
    // r15 scale audit (round-14 verdict #3): size ≈ (8 B id + avg
    // token) per token ≈ 2-3× corpus bytes on executor-local disk —
    // the LARGEST checkpoint in the library, and unrecoverable on
    // executor loss (job retries instead of recomputing the lineage).
    // The trade stands because the alternative re-runs the tokenize
    // scan per consumer (2× CPU at every scale), but a 100 TB
    // deployment that cannot spare ~2.5× local disk should drop this
    // checkpoint (the operator is correct without it) or checkpoint
    // to reliable storage.
    val toks = Parallelism.ensure(docs, idCol)
      .select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .localCheckpoint()
    val freqAll = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val total = freqAll.agg(sum(col("tf")).as("__total"))
    // top-K by frequency: TakeOrderedAndProject keeps the broadcast at
    // most vocabCap rows at any corpus size
    val freq = freqAll.orderBy(col("tf").desc, col("tok")).limit(vocabCap)
    toks.join(broadcast(freq), Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log(coalesce(col("tf").cast("double"), lit(0.5)) / col("__total")))
          .as("avg_neg_logp"))
  }

  /** Gopher quality rules (Rae et al. 2021, app. A — the standard
    * rule-based document gate): word count within bounds, mean word
    * length within [3, 10], ≥ 80% of words contain an alphabetic
    * character, ≥ 2 distinct English stopwords present, symbol-to-word
    * ratio ('#', '…') below 10%. Pure per-row Catalyst expressions —
    * map-only at any scale. Returns a struct of per-rule booleans plus
    * the conjunction (`keep`). */
  def gopherFlags(text: Column, minWords: Int = 10,
      maxWords: Int = 100000): Column =
    // r14 perf: bind the token array once per row (TextFunctions.bound)
    // — the five rules referenced the tokenizer subtree ~6×, and
    // Catalyst re-evaluates each reference
    TextFunctions.bound(TextFunctions.tokens(lower(text))) { toks =>
      gopherFlagsIn(toks, minWords, maxWords)
    }

  private def gopherFlagsIn(toks: Column, minWords: Int,
      maxWords: Int): Column = {
    val n = size(toks)
    val nf = n.cast("double")
    val meanLen = when(n > 0,
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / nf)
      .otherwise(lit(0.0))
    val alphaFrac = when(n > 0,
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nf)
      .otherwise(lit(0.0))
    val stopwords = typedLit(Seq("the", "be", "to", "of", "and", "that",
      "have", "with"))
    val nStop = size(filter(stopwords, s => array_contains(toks, s)))
    val symbolRatio = when(n > 0,
      size(filter(toks, t => t.contains("#") || t.contains("...")))
        .cast("double") / nf).otherwise(lit(0.0))
    val wc = n.between(minWords, maxWords)
    val ml = meanLen.between(3.0, 10.0)
    val af = alphaFrac >= 0.8
    val sw = nStop >= 2
    val sr = symbolRatio < 0.1
    struct(
      wc.as("word_count_ok"), ml.as("mean_word_len_ok"),
      af.as("alpha_frac_ok"), sw.as("stopwords_ok"),
      sr.as("symbol_ratio_ok"),
      (wc && ml && af && sw && sr).as("keep"))
  }

  /** Repetition ratio: 1 − (distinct word-bigrams / total word-bigrams)
    * per document — the standard degenerate-text detector (looping
    * generations repeat bigrams). Pure per-row expression, no shuffle.
    *
    * PERF: a bare index-lambda (element_at(toksExpr, i) inside a
    * transform) re-inlines the whole split per ELEMENT — O(bigrams ×
    * tokenization) per row. [[TextFunctions.bound]] avoids that: the
    * token-hash array is evaluated ONCE per row as a lambda variable,
    * and element_at against a lambda variable is O(1). */
  def repetitionRatio(text: Column): Column = {
    // r14 perf: hash tokens once and form bigram keys as
    // xxhash64(h_i, h_{i+1}) over element_at lookups instead of
    // zip_with over two slice() copies of the (re-inlined) token
    // array. The token-hash array is bound ONCE per row as a lambda
    // variable (transform over a 1-element array), so element_at is
    // O(1) and the tokenizer runs once — measured 1.27 s → 0.39 s at
    // sf0.1 with a bit-identical aggregate (distinct-bigram count via
    // 64-bit hashes equals the string-distinct count absent a
    // collision, p ≈ n²/2⁶⁴ per doc, and the exact DuckDB oracle
    // would surface one).
    val hsExpr = transform(TextFunctions.tokens(lower(text)), tk => xxhash64(tk))
    element_at(transform(array(hsExpr), h => {
      val n = size(h)
      val bigramHashes = transform(sequence(lit(1), greatest(n - 1, lit(0))),
        i => xxhash64(element_at(h, i), element_at(h, i + 1)))
      when(n < 2, 0.0).otherwise(
        lit(1.0) - size(array_distinct(bigramHashes)).cast("double") /
          (n - 1).cast("double"))
    }), 1)
  }

  /** 32-bit md5 bucket of the id, uniform on [0, 2^32): the same
    * engine-portable hash splitBucket uses, kept at full width so
    * sampling rates resolve to ~2e-10 instead of 1e-3. */
  def bucket32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** fastText-style hashed-bag-of-words linear classifier INFERENCE
    * (the quality-scoring stage of DCLM/FineWeb-edu-style curation
    * pipelines): feature index = engine-portable md5 bucket of the
    * token, logit = bias + mean of the indexed weights (fastText
    * average pooling), score = sigmoid(logit). The weight vector is a
    * literal array column (model trained offline) that travels with
    * the plan — pure Catalyst HOFs, no UDF, no shuffle, and the
    * whole expression stays inside whole-stage codegen. */
  def classifierScore(text: Column, weights: Column, dim: Int,
      bias: Double): Column =
    // r14 perf: token array bound once per row (3 references before)
    TextFunctions.bound(TextFunctions.tokens(lower(text))) { toks =>
      val logit = lit(bias) + when(size(toks) > 0,
        aggregate(toks, lit(0.0), (acc, t) =>
          acc + element_at(weights, (bucket32(t) % dim).cast("int") + 1))
          / size(toks)).otherwise(lit(0.0))
      lit(1.0) / (lit(1.0) + exp(-logit))
    }

  /** Distributed logistic-regression TRAINING (full-batch gradient
    * descent) — the training half of [[classifierScore]]'s inference
    * stage (DCLM/FineWeb-style curation trains its quality classifier
    * on the corpus it then filters). Each step computes the exact
    * batch gradient avg((y − σ(w·x + b)) · x_j) in ONE map-side-
    * combined aggregate; between steps only the d+1 weight doubles
    * touch the driver. At 100 TB the total cost is `steps` scans and
    * nothing — state, shuffle, or driver memory — grows with corpus
    * size. Deterministic up to float-sum reordering noise (≤ ~1e-12
    * relative), which callers round away per the QH contract. */
  def trainLogReg(df: DataFrame, features: Seq[Column], label: Column,
      steps: Int, lr: Double): (Seq[Double], Double) = {
    val d = features.size
    var w = Seq.fill(d)(0.0)
    var b = 0.0
    for (_ <- 0 until steps) {
      val margin = features.zip(w).map { case (x, wi) => x * lit(wi) }
        .foldLeft(lit(b): Column)(_ + _)
      val resid = label.cast("double") -
        lit(1.0) / (lit(1.0) + exp(-margin))
      val aggs = features.map(x => avg(resid * x)) :+ avg(resid)
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, j) => wi + lr * row.getDouble(j) }
      b += lr * row.getDouble(d)
    }
    (w, b)
  }

  /** Deterministic per-stratum Bernoulli sample: keep a row iff its
    * md5 bucket falls under the stratum's rate. Strata absent from
    * `rates` are dropped (rate 0). Rows never flip in/out when other
    * strata grow — the reproducibility property Dataset.sample's
    * per-partition RNG lacks (its draw depends on partition layout).
    * One broadcast of a |strata|-row table; no shuffle of `df`. */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = rates.toSeq.toDF(strataCol, "__rate")
    df.join(broadcast(r), strataCol)
      .filter(bucket32(col(idCol)) <
        col("__rate") * lit(4294967296.0))
      .drop("__rate")
  }

  /** Sequence-packing plan (concat-and-chunk, the standard LLM
    * pretraining layout): documents are laid out in a deterministic
    * pseudo-random order (md5 of the id, salted differently from the
    * shard hash) and the concatenated token stream is chunked every
    * `budget` tokens. Returns (id, shard, seq_id, offset): document id
    * starts at token `offset` of training sequence `seq_id` in `shard`.
    *
    * Sharding bounds the sequential dependency: the running-total
    * window runs per shard, so at 100 TB the shard count scales with
    * the corpus and each window partition stays executor-sized —
    * a single global ordering would serialize the whole corpus through
    * one partition. Fully deterministic (hash order + exact integer
    * cumsum), so any engine reproduces the identical layout. */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
      budget: Int, shards: Int = 64): DataFrame = {
    val shard = (bucket32(col(idCol)) % shards).cast("int")
    val ord = md5(concat(lit("pack:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), shard.as("shard"), ord.as("__ord"),
        nTokens.cast("long").as("__nt"))
      .withColumn("__start", coalesce(sum(col("__nt")).over(w), lit(0L)))
      .select(col(idCol), col("shard"),
        floor(col("__start") / budget).cast("long").as("seq_id"),
        (col("__start") % budget).as("offset"))
  }

  /** SEMANTIC benchmark decontamination — the embedding-space
    * complement of the n-gram [[contaminated]] check (paraphrased eval
    * items that share no 8-gram still sit next to their source in
    * embedding space): flag a training item iff its max cosine against
    * the eval set reaches `threshold`. Eval sets are small by nature,
    * so the eval side BROADCASTS and the corpus-scale pass is one
    * broadcast join + a map-side-combined max aggregate — no shuffle
    * of the training embeddings. The comparison uses the ROUNDED
    * similarity (6 dp) so the flag is reproducible cross-engine.
    * Returns (id, max_sim (r6), contaminated) for EVERY train id —
    * rows with no comparable similarity (empty eval set, null vector)
    * come back with max_sim null / contaminated false instead of
    * silently vanishing, so callers can treat the result as the full
    * corpus with flags. */
  def semanticContaminated(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val t = train.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("__tv"))
    val e = eval.select(
      transform(col(vecCol), x => x.cast("double")).as("__ev"))
    val sims = t.join(broadcast(e))
      .groupBy(col("id"))
      .agg(round(max(graft.plans.VectorExpressions
        .cosineSimilarity(col("__tv"), col("__ev"))), 6).as("max_sim"))
    t.select(col("id")).distinct()
      .join(sims, Seq("id"), "left")
      .withColumn("contaminated",
        coalesce(col("max_sim") >= threshold, lit(false)))
  }

  /** Temperature-based mixture rebalancing — the multilingual
    * α-sampling rule (target share ∝ n_s^α; α=1 keeps the corpus
    * distribution, α→0 equalizes strata): with maximal retention and
    * no replacement the keep rate reduces to
    * rate_s = (n_min / n_s)^(1-α) — the smallest stratum is kept whole
    * and larger strata downsample toward the tempered distribution.
    * Fully in-plan: one |strata|-row count aggregate broadcast against
    * the corpus, the same deterministic md5-bucket Bernoulli draw as
    * [[sampleStratified]]; upsampling (α-weights above 1) is a
    * training-loader concern, not a corpus transform. */
  def mixByTemperature(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
    val mn = counts.agg(min(col("__c")).as("__mn"))
    val rateTbl = counts.crossJoin(mn)
      .select(col(strataCol),
        pow(col("__mn").cast("double") / col("__c"), 1.0 - alpha)
          .as("__rate"))
    df.join(broadcast(rateTbl), strataCol)
      .filter(bucket32(col(idCol)) < col("__rate") * lit(4294967296.0))
      .drop("__rate")
  }

  /** Canonical URL form — the first dedup key of every web-corpus
    * pipeline (C4/CommonCrawl preprocessing): lowercase scheme and
    * host, strip `www.`, drop scheme-default ports, drop the fragment,
    * remove tracking parameters (`utm_*`, `gclid`, `fbclid`), sort the
    * surviving query parameters, and normalize the path's trailing
    * slash. Pure regexp/array expressions — map-only, codegen-friendly,
    * no UDF. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?]*)", 1)
    val pathQ = regexp_replace(rest, "^[^/?]*", "")
    val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val hostNoWww = regexp_replace(host, "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(pathQ, "^([^?]*)", 1)
    val stripped = regexp_replace(path0, "/+$", "")
    val pathNorm = when(stripped === "", "/").otherwise(stripped)
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)="))
    val qNorm = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), hostNoWww, keepPort, pathNorm,
      when(qNorm === "", "").otherwise(concat(lit("?"), qNorm)))
  }

  /** Overlapping token-window chunking (the RAG-indexing / long-doc
    * layout: windows of `chunkTokens` every `stride` tokens, stride <
    * chunk ⇒ overlap). Pure map-side row expansion — tokenize once,
    * explode the start offsets, slice — no shuffle, no state; output
    * size is n_tokens/stride per doc at any scale. Returns (id,
    * chunk_idx, chunk_text, n_chunk_tokens). */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0)
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "__start")),
        col("__toks"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ",
          slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start"))
          .as("n_chunk_tokens"))
  }

  /** Snapshot diff — the incremental-update primitive between two
    * corpus versions: full outer join on the id, content compared by
    * hash. One co-partitioned shuffle join; only ids and digests move
    * if callers pre-project. Returns (id, status ∈
    * added|removed|changed|unchanged). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      md5(col(contentCol).cast("string")).as("__oh"))
    val n = newDf.select(col(idCol).as("id"),
      md5(col(contentCol).cast("string")).as("__nh"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") === col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** First-fit-decreasing bin packing into fixed-capacity context
    * windows — the NO-SPLIT alternative to [[packSequences]]'
    * concat-and-chunk (every document stays whole in exactly one bin;
    * the standard choice when examples must not cross attention
    * boundaries). Docs longer than `capacity` are excluded (callers
    * gate or truncate first). Deterministic: shard = md5 bucket of the
    * id, order within a shard = (tokens desc, id) — classic FFD.
    *
    * Scale: one repartition+sort clusters each shard, then a
    * single-pass iterator packs it holding only the open-bin residual
    * array (bounded by shard size, which is FIXED by design — shard
    * COUNT grows with the corpus, shards pack in parallel). Sequential
    * greedy state, the same documented mapPartitions exception as
    * `Upsert.dedupTtl`. FFD invariant (verified by the q_pack_ffd
    * oracle): at most one bin per shard ends ≤ half-full, so bins per
    * shard ≤ 2·tokens/capacity + 1. Returns (id, shard, bin, n_tokens). */
  def packBinsFfd(df: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, shards: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"),
        (bucket32(col(idCol)) % shards).cast("int").as("shard"),
        nTokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") <= capacity && col("n_tokens") > 0)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("id"))
    val enc = org.apache.spark.sql.Encoders.row(
      org.apache.spark.sql.types.StructType(base.schema.fields :+
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
    base.mapPartitions { it =>
      var curShard = Int.MinValue
      val residuals = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { r =>
        val s = r.getInt(1)
        if (s != curShard) { curShard = s; residuals.clear() }
        val nt = r.getLong(2)
        var b = 0
        while (b < residuals.length && residuals(b) < nt) b += 1
        if (b == residuals.length) residuals += capacity
        residuals(b) -= nt
        org.apache.spark.sql.Row(r.get(0), s, nt, b)
      }
    }(enc)
  }

  /** Data mixing: downsample so stratum proportions match `weights`
    * (training-mixture rebalancing, e.g. 50% en / 20% de / ...), with
    * maximal retention: the binding stratum (smallest count/weight) is
    * kept whole and every other stratum is sampled down to match.
    * Two passes over `df`: one count aggregate (|strata| rows — the
    * per-stratum rate table stays broadcast-sized at any corpus size,
    * strata are languages/domains, not rows) and one filter pass.
    * Sampling is the same deterministic md5 bucket as
    * [[sampleStratified]], so the output is stable across engines,
    * partitionings and runs. */
  def mixToProportions(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF(strataCol, "__w")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
      .join(w, strataCol)
    val t = counts.agg(min(col("__c") / col("__w")).as("__t"))
    val rateTbl = counts.crossJoin(t)
      .select(col(strataCol),
        least(lit(1.0), col("__w") * col("__t") / col("__c")).as("__rate"))
    df.join(broadcast(rateTbl), strataCol)
      .filter(bucket32(col(idCol)) <
        col("__rate") * lit(4294967296.0))
      .drop("__rate")
  }

  /** Per-domain quota cap (the Common-Crawl "max N pages per host"
    * rule): keep the `cap` rows with the smallest deterministic hash
    * per domain — a stable uniform sample, not "first by crawl order".
    *
    * EXACT and skew-safe: a single row_number window over the raw
    * corpus would sort every row of a hot domain in one partition, so
    * the top-k runs in two levels — (1) row_number within (domain,
    * salt), salts splitting a domain's rows ~evenly, keeping `cap` per
    * salt (the global per-domain top-k is a subset of the union of
    * per-salt top-k's, so no true row is lost); (2) row_number over
    * the survivors, now <= salts*cap rows per domain — bounded however
    * skewed the domain. Ordering is (md5(id), id): engine-portable and
    * tie-free. */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
      cap: Int, salts: Int = 8): DataFrame = {
    val ordKey = md5(col(idCol).cast("string"))
    val salted = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol), pmod(bucket32(col(idCol)), lit(salts)))
      .orderBy(ordKey, col(idCol))
    val global = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(ordKey, col(idCol))
    df.withColumn("__rn", row_number().over(salted))
      .filter(col("__rn") <= cap)
      .withColumn("__rn", row_number().over(global))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Hashed uni+bigram feature buckets of a document — the DSIR
    * feature map (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling"): every whitespace token and every
    * adjacent token pair hashes into one of `dim` buckets via the same
    * engine-portable md5 bucket the sampling ops use. Pure per-row
    * expression (array of ints, with multiplicity). */
  def dsirFeatures(text: Column, dim: Int): Column =
    // r14 perf: token array bound once per row (4 references before)
    TextFunctions.bound(TextFunctions.tokens(lower(text))) { toks =>
      val n = size(toks)
      val bigrams = zip_with(
        slice(toks, lit(1), greatest(n - 1, lit(0))),
        slice(toks, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      transform(concat(toks, bigrams),
        t => pmod(bucket32(t), lit(dim)).cast("int"))
    }

  /** DSIR bucket log-ratio table: log p_target(b) − log p_raw(b) for
    * every feature bucket, from Laplace-smoothed (+1) hashed-n-gram
    * counts of the target and raw corpora.
    *
    * The output is `dim` rows BY CONSTRUCTION — unlike a vocabulary
    * table it cannot grow with the corpus, so broadcasting it is safe
    * at any scale (this bounded-by-hashing property is the reason DSIR
    * uses hashed features at all). Each side costs one scan + one
    * dim-bounded hash aggregate with map-side partials. Ratios are
    * rounded to 6 dp so downstream sums are engine-stable. */
  def dsirLogRatios(raw: DataFrame, target: DataFrame, textCol: String,
      dim: Int): DataFrame = {
    // ONE corpus scan per side: rollup(bucket) emits the per-bucket
    // counts AND the grand total (bucket NULL) from the same aggregate;
    // the ≤ dim+1-row result is materialized so the two consumers below
    // don't re-scan the corpus
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(explode(dsirFeatures(col(textCol), dim)).as("bucket"))
        .rollup(col("bucket")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
    val ct = bucketCounts(target)
    val cr = bucketCounts(raw)
    raw.sparkSession.range(dim)
      .select(col("id").cast("int").as("bucket"))
      .join(ct.filter(col("bucket").isNotNull)
        .withColumnRenamed("c", "__ct"), Seq("bucket"), "left")
      .join(cr.filter(col("bucket").isNotNull)
        .withColumnRenamed("c", "__cr"), Seq("bucket"), "left")
      .crossJoin(ct.filter(col("bucket").isNull).select(col("c").as("__nt")))
      .crossJoin(cr.filter(col("bucket").isNull).select(col("c").as("__nr")))
      .select(col("bucket"), round(
        log((coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
            (col("__nt") + dim)) -
        log((coalesce(col("__cr"), lit(0L)) + 1).cast("double") /
            (col("__nr") + dim)), 6).as("log_ratio"))
  }

  /** [[dsirLogRatios]] for the common case where the target is a
    * FLAGGED SUBSET of the raw corpus (e.g. "high-quality English
    * docs"): ONE corpus pass — the bucket aggregate carries a
    * conditional count for the target side — instead of two, and the
    * totals fall out of the dim-bounded bucket table itself (no rollup
    * needed). Identical math to the two-DF form. */
  def dsirLogRatiosFlagged(docs: DataFrame, targetFlag: Column,
      textCol: String, dim: Int): DataFrame = {
    val counts = docs
      .select(targetFlag.as("__t"),
        explode(dsirFeatures(col(textCol), dim)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(when(col("__t"), 1)).as("__ct"), count(lit(1)).as("__cr"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cr")).as("__nr"))
    docs.sparkSession.range(dim)
      .select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .crossJoin(totals)
      .select(col("bucket"), round(
        log((coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
            (col("__nt") + dim)) -
        log((coalesce(col("__cr"), lit(0L)) + 1).cast("double") /
            (col("__nr") + dim)), 6).as("log_ratio"))
  }

  /** [[dsirLogRatiosFlagged]] + [[dsirLogWeights]] fused for the
    * flagged-subset case (r14 perf): the exploded feature stream
    * (id, flag, bucket) is materialized ONCE and feeds both the
    * ratio table and the per-doc weights — the unfused pair
    * re-tokenized and re-hashed the whole corpus for each pass
    * (measured ~1 s of the q_dsir_select wall at sf0.1; at 100 TB
    * this halves the expensive scan passes). Identical math: same
    * multiset of features on both sides. Returns (id, n_feats,
    * log_w). */
  def dsirWeightsFlagged(docs: DataFrame, idCol: String,
      targetFlag: Column, textCol: String, dim: Int): DataFrame = {
    val ex = Parallelism.ensure(docs, idCol)
      .select(col(idCol), targetFlag.as("__t"),
        explode(dsirFeatures(col(textCol), dim)).as("bucket"))
      // r15 scale audit: (id, bool, int) per hashed uni+bigram feature
      // ≈ 2× token count × 13 B ≈ 4-5× corpus bytes of executor-local
      // disk, lineage cut (executor loss fails the job). Justified by
      // replacing a second full tokenize+hash scan; at 100 TB either
      // budget the local disk or split back into the two-pass
      // dsirLogRatiosFlagged + dsirLogWeights form (both remain in
      // the library and are exact-equivalent).
      .localCheckpoint()
    val counts = ex.groupBy(col("bucket"))
      .agg(count(when(col("__t"), 1)).as("__ct"), count(lit(1)).as("__cr"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cr")).as("__nr"))
    val ratios = docs.sparkSession.range(dim)
      .select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .crossJoin(totals)
      .select(col("bucket"), round(
        log((coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
            (col("__nt") + dim)) -
        log((coalesce(col("__cr"), lit(0L)) + 1).cast("double") /
            (col("__nr") + dim)), 6).as("log_ratio"))
    ex.join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("log_ratio")), 4).as("log_w"))
  }

  /** Per-document DSIR importance weight: Σ over the doc's hashed
    * features (with multiplicity) of the bucket log-ratio. One explode
    * + broadcast join against the dim-bounded ratio table + one per-doc
    * aggregate. Returns (id, n_feats, log_w) with log_w rounded to
    * 4 dp (sums of 6-dp terms in engine-specific order agree far below
    * that). */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, dim: Int): DataFrame =
    docs.select(col(idCol),
        explode(dsirFeatures(col(textCol), dim)).as("bucket"))
      .join(broadcast(ratios), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("log_ratio")), 4).as("log_w"))

  /** DSIR selection: sample `n` documents WITHOUT replacement with
    * probability ∝ exp(log_w / temperature) via the Gumbel-top-k
    * trick — key = log_w/T + Gumbel noise, take the n largest keys.
    * The noise is deterministic (md5-bucket uniform of the id), so the
    * draw is reproducible across engines, partitionings and reruns;
    * keys are rounded to 6 dp with an id tie-break so the cut is
    * engine-stable. TakeOrderedAndProject: no global sort. */
  def dsirResample(weighted: DataFrame, idCol: String, n: Int,
      temperature: Double = 1.0): DataFrame = {
    val u = (bucket32(col(idCol)) + 0.5) / lit(4294967296.0)
    val key = round(col("log_w") / temperature - log(-log(u)), 6)
    weighted.withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(n)
  }
}
