package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar vector quantization — the reference's `ScalarQuantizer.java`
  * (`VectorQuantizerType.java:32`: SQ8 maps each dimension linearly to
  * [0, 255], SQ4 to [0, 15], from TRAINED per-dimension min/max; FLAT
  * is identity). The index stores the quantized codes (4× / 8× smaller
  * than float32 — at 100 TB that is the difference between an
  * in-memory and a spilled index) and searches dequantize on the fly;
  * the error per dimension is bounded by half a quantization step.
  *
  * Training is one distributed pass (posexplode → per-dimension
  * min/max, map-side combined); the driver holds only the 2×dim
  * boundary arrays — the same artifact the reference persists. */
object ScalarQuantize {

  /** Trained quantizer: per-dimension [min, max] + bit width. */
  final case class Params(bits: Int, mins: Seq[Double], maxs: Seq[Double]) {
    require(bits == 8 || bits == 4, s"SQ8 or SQ4, got $bits bits")
    def maxQ: Int = (1 << bits) - 1
    /** Per-dimension step; degenerate (constant) dims get step 1 so
      * quantize maps them to 0 and dequantize restores the min. */
    def scales: Seq[Double] = mins.zip(maxs).map { case (mn, mx) =>
      if (mx > mn) (mx - mn) / maxQ else 1.0
    }
  }

  def train(corpus: DataFrame, vecCol: String, bits: Int = 8): Params = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("d"))
      .collect()
    Params(bits, rows.map(_.getDouble(1)).toSeq,
      rows.map(_.getDouble(2)).toSeq)
  }

  /** Quantized codes, one int in [0, maxQ] per dimension (clamped, so
    * out-of-training-range probes stay valid). */
  def quantize(c: Column, p: Params): Column = {
    val mins = array(p.mins.map(lit): _*)
    val scales = array(p.scales.map(lit): _*)
    transform(c, (x, i) =>
      least(lit(p.maxQ), greatest(lit(0),
        round((x.cast("double") - element_at(mins, i + 1)) /
          element_at(scales, i + 1)).cast("int"))))
  }

  /** Reconstruction: min + code·step per dimension. */
  def dequantize(c: Column, p: Params): Column = {
    val mins = array(p.mins.map(lit): _*)
    val scales = array(p.scales.map(lit): _*)
    transform(c, (q, i) =>
      element_at(mins, i + 1) + q.cast("double") * element_at(scales, i + 1))
  }
}
