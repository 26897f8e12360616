package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BM25 ranked retrieval (Robertson/Sparck Jones, the Okapi BM25 the
  * reference's text index scores with via Lucene —
  * `pinot-segment-local/.../index/text/lucene/` uses Lucene's default
  * BM25Similarity): given a small set of term queries, return the
  * top-k documents per query.
  *
  * Shape chosen for 100 TB: query terms are literals, so the corpus
  * statistics (N, avgdl, one document-frequency per term) all come out
  * of ONE map-side-combined scan — no explode, no (doc, term) shuffle.
  * Scoring is then a pure projection over the token arrays against the
  * broadcast 1-row stats, and the only exchange in the whole plan is
  * the final per-query top-k window. Contrast the textbook layout
  * (explode → groupBy(doc, term) → join idf) which shuffles the entire
  * tokenized corpus.
  *
  * Tokenization = TextFunctions.tokens over lowercased text (the
  * library-wide whitespace convention), dl = token count.
  */
object Bm25 {

  /** Top-k docs per query. `queries` = (query_id, terms). Scores are
    * rounded to 4 decimals BEFORE ranking (ties then break on doc_id)
    * so rank order is reproducible across engines. Docs matching no
    * term (score 0) are excluded, per standard BM25 retrieval.
    * Returns (query_id, doc_id, score, rank). */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty)
    val terms = queries.flatMap(_._2).distinct
    // r15: scan-parallelism guard (same as the other heavy map-side
    // text operators, r14): both the stats pass and the scoring pass
    // tokenize every document, and on a single-row-group input they
    // ran on ONE core each. Identity on any properly-split input.
    val base = Parallelism.ensure(docs, idCol)
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))

    // one corpus pass: N, avgdl, and df for every distinct query term
    val statAggs = Seq(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        count(when(array_contains(col("toks"), t), 1))
          .cast("double").as(s"df_$i")
      }
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    def idf(dfCol: Column, n: Column): Column =
      log((n - dfCol + 0.5) / (dfCol + 0.5) + 1.0)

    val perQuery: Seq[Column] = queries.map { case (qid, qterms) =>
      val s = qterms.map { t =>
        val i = terms.indexOf(t)
        val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
        idf(col(s"df_$i"), col("n_docs")) * tf * (k1 + 1.0) /
          (tf + (col("dl") / col("avgdl") * b + (1.0 - b)) * k1)
      }.reduce(_ + _)
      struct(lit(qid).as("query_id"), round(s, 4).as("score"))
    }

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), explode(array(perQuery: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"),
        col("qs.score").as("score"))
      .filter(col("score") > 0.0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
