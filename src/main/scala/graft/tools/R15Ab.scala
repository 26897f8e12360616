package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-15 optimization A/B probe (guide §1: measure first, and
  * interleave variants in ONE JVM so the box's periodic external load
  * hits both sides). Each variant prints a result checksum so a
  * rewrite that drifts is caught immediately.
  *
  * Usage: runMain graft.tools.R15Ab [section]
  */
object R15Ab {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val section = if (args.nonEmpty) args(0) else "all"
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

    // interleaved timing: variants run round-robin so a load spike
    // lands on all of them; min per variant sheds the spike
    def ab(reps: Int)(variants: (String, () => String)*): Unit = {
      variants.foreach { case (_, f) => f() } // warm
      val best = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(Double.MaxValue)
      val outs = scala.collection.mutable.Map[String, String]()
      (1 to reps).foreach { _ =>
        variants.foreach { case (n, f) =>
          val t0 = System.nanoTime()
          outs(n) = f()
          best(n) = math.min(best(n), (System.nanoTime() - t0) / 1e9)
        }
      }
      variants.foreach { case (n, _) =>
        println(f"[ab] $n%-40s ${best(n)}%8.3f s   ${outs(n)}")
      }
    }

    if (section == "all" || section == "ann") {
      // q_ann_lsh property-check: eager localCheckpoint of exactTop vs
      // plain reuse-exchange sharing
      def lshQuery(checkpoint: Boolean): DataFrame = {
        val probes = t.embeddings.filter(col("vec_id") < 5)
        val lsh = Similarity.lshTopK(probes, t.embeddings, "vec_id",
          "vec_id", "embedding", k = 5, bits = 16, bands = 8)
        val pv = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"))
        val cv = t.embeddings.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("cid").asc)
        val top = pv.crossJoin(cv)
          .filter(col("cid") =!= col("probe_id"))
          .withColumn("sim", graft.queries.QH.r4(
            graft.plans.VectorExpressions.cosineSimilarity(
              col("pv"), col("cv"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id"), col("cid"))
        val exactTop = if (checkpoint) top.localCheckpoint(true) else top
        val tops = exactTop.groupBy(col("probe_id"))
          .agg(array_join(array_sort(collect_list(col("cid"))), ",")
            .as("exact_top5_csv"))
        val hits = exactTop
          .join(lsh, exactTop("probe_id") === lsh("probe_id") &&
            col("cid") === col("neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        tops.join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("exact_top5_csv"),
            (coalesce(col("__hits"), lit(0L)) >= 3).as("recall_ok"))
          .orderBy(col("probe_id"))
      }
      ab(4)(
        "ann_lsh/checkpointed" -> (() => lshQuery(true).collect()
          .mkString("|").hashCode.toString),
        "ann_lsh/reuse-exchange" -> (() => lshQuery(false).collect()
          .mkString("|").hashCode.toString))
    }

    spark.stop()
  }
}
