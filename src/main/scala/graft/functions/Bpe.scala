package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016; the GPT-2
  * recipe, character-level): REAL learned merges, replacing the
  * regex "BPE-ish" token-count proxy in [[TextFunctions]] for
  * pipelines that need tokenizer-faithful sequence lengths (packing
  * budgets, per-token cost accounting).
  *
  * Scale split mirrors IvfIndex: TRAINING is driver-side over a
  * BOUNDED artifact — not a row sample but the corpus-wide
  * top-`vocabCap` word frequency table (one distributed word-count,
  * TakeOrderedAndProject keeps the collect at vocabCap rows at any
  * corpus size; frequency-ranked words are exactly what BPE merge
  * counting wants, and the tail it drops contributes negligibly to
  * pair counts). APPLICATION is a pure per-row expression: the learned
  * merge table (≤ numMerges entries, fixed at train time) travels with
  * the plan like a broadcast model, so encoding is map-only —
  * no shuffle, no driver involvement, embarrassingly parallel at
  * 100 TB.
  */
object Bpe {

  /** Greedy BPE merge learning on a (word → frequency) table: at each
    * step merge the most frequent adjacent symbol pair (count ties
    * break lexicographically — deterministic). Stops early when no
    * pair repeats. */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 0 until numMerges if !done) {
      val pairCounts = collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty || pairCounts.valuesIterator.max < 2) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) { out += joined; i += 2 }
            else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
    }
    merges.result()
  }

  /** Learn merges from a corpus: distributed word count, top-vocabCap
    * by (frequency desc, word) collected (bounded), then
    * [[trainFromCounts]]. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 1 << 14): Seq[(String, String)] = {
    val counts = docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, numMerges)
  }

  /** Column of BPE tokens of `text` under `merges` (lowercased,
    * whitespace-split, merges never cross word boundaries — so
    * concatenating a word's tokens reproduces the word exactly). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeEncodeExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(lower(text)),
        merges))

  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))
}

/** BPE application as a scalar expression. CodegenFallback by design:
  * the merge loop is branchy string work that would not fuse anyway;
  * the expression is still evaluated inside the scan's codegen'd
  * pipeline like the CLP codecs (`ClpExpressions`), with no
  * row-by-row interpreter fallback for the REST of the projection. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = collection.mutable.ArrayBuffer[UTF8String]()
    val words = text.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) encodeWord(w, out)
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Standard greedy BPE: repeatedly apply the lowest-rank applicable
    * merge until none applies. */
  private def encodeWord(w: String,
      out: collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms: Array[String] = w.map(_.toString).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue; var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        val joined = syms(bestI) + syms(bestI + 1)
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, bestI)
        next(bestI) = joined
        System.arraycopy(syms, bestI + 2, next, bestI + 1,
          syms.length - bestI - 2)
        syms = next
        continue = syms.length > 1
      }
    }
    var i = 0
    while (i < syms.length) { out += UTF8String.fromString(syms(i)); i += 1 }
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
