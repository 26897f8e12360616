package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * Methodology (mirrors JMH practice in the reference's pinot-perf):
  * warm the JVM/codegen with one untimed pass of the flagship query,
  * then time a single `collect()` per query — collect, not count, so
  * Catalyst can't prune the projections being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: JVM + codegen + parquet footers
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).collect()
    catch { case _: Throwable => }

    // per BASELINE.md methodology (JMH-style repeats): best of 2 runs —
    // the first run pays Janino codegen compilation, the second measures
    // steady-state execution. A query that throws is recorded as a
    // failure (time -1), NOT a timed success, and excluded from totals.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failure: Option[String] = None
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // fresh build on run 1 (measures plan+codegen+exec); cached
        // Dataset on run 2 would skip only re-analysis — rebuild keeps
        // the two runs comparable and the min reflects warm codegen
        try { fn(spark, sfDir).collect() } catch {
          case e: Throwable =>
            failure = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, if (failure.isEmpty) times.min else -1.0, failure)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val total = ok.map(_._2).sum
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ").take(200) + "\""
    val fails = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":" + jstr(m) }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failures":$fails,"n_ok":${ok.size},"n_fail":${results.size - ok.size},"sf":"$sfDir"}"""
    println(line)
    // driver's stdout tail truncated round 1's first ~30 entries — keep a
    // full copy on disk alongside the repo
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
