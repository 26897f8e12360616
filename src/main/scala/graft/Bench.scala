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

    // per BASELINE.md methodology (JMH-style warmup + measurement
    // iterations): ONE untimed warmup pass of the full battery — it
    // absorbs Janino codegen AND every one-time index/shred artifact
    // build or load (the round-9 driver snapshot showed those one-time
    // costs leaking into the measured minimum when only a single
    // flagship warmup ran: q_filter_json_shred's 5.7 s shred build
    // left even its SECOND pass GC-elevated at 0.87 s vs a 0.13 s
    // steady state; PLANS.md round-10 DriftAb adjudication) — then two
    // timed interleaved passes, min per query. A query that throws is
    // recorded as a failure (time -1), NOT a timed success, and
    // excluded from totals.
    // optional filter for local iteration: SPARK_GRAFT_BENCH_ONLY=q_a,q_b
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    // Interleaving — rather than back-to-back runs of the same query —
    // keeps a one-off environmental stall (GC pause, IO hiccup) from
    // polluting BOTH measurements of one query: the two timings of any
    // query are minutes apart, so the min sheds the stall.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val failures = scala.collection.mutable.Map[String, String]()
    // untimed warmup battery (failures surface in the timed passes)
    named.foreach { case (_, fn) =>
      try fn(spark, sfDir).collect() catch { case _: Throwable => }
    }
    // per-query GC-time deltas (summed over all collectors) make drift
    // adjudication data-carrying: a query whose wall time regressed but
    // whose GC share exploded is box/heap churn, not a plan change
    // (round-13 verdict directive — the ANN family's third recurrence)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    def pass(): Map[String, (Double, Long)] = named.map { case (name, fn) =>
      val g0 = gcMs()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).collect() } catch {
        case e: Throwable =>
          failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
      name -> ((System.nanoTime() - t0) / 1e9, gcMs() - g0)
    }.toMap
    // the bench box carries a PERIODIC EXTERNAL LOAD (~11% band on the
    // total; PLANS.md uniform-ratio convention) — stamp /proc/loadavg
    // around each timed pass so drift adjudication is data-carrying
    def loadavg(): Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val load0 = loadavg()
    val p1 = pass(); val load1 = loadavg()
    val p2 = pass(); val load2 = loadavg()
    // per query: min wall time of the two passes, plus the GC delta of
    // the pass that SUPPLIED the min (the measurement's own GC burden)
    val results = named.map { case (name, _) =>
      val (t, gc) = if (p1(name)._1 <= p2(name)._1) p1(name) else p2(name)
      (name, if (failures.contains(name)) -1.0 else t, gc, failures.get(name))
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, g, _) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val ok = results.filter(_._4.isEmpty)
    val total = ok.map(_._2).sum
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ").take(200) + "\""
    val fails = results.collect { case (k, _, _, Some(m)) =>
      "\"" + k + "\":" + jstr(m) }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failures":$fails,"n_ok":${ok.size},"n_fail":${results.size - ok.size},""" +
        s""""loadavg":[$load0,$load1,$load2],"gc_ms":$gcs,"sf":"$sfDir"}"""
    println(line)
    // driver's stdout tail truncated round 1's first ~30 entries — keep a
    // full copy on disk alongside the repo
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => }
    // r15 (round-14 verdict directive #1, additions-only): the driver
    // captures only a ~2000-byte stdout TAIL, which truncates the front
    // of the ~18 KB full line above — it has NEVER parsed (parsed:null
    // in BENCH_r01..r14). Emit a compact, tail-safe summary line LAST
    // (~200 bytes ≪ tail window) carrying the totals and failures; the
    // full per-query map stays on the first line and in
    // BENCH_LOCAL.json (committed each round). Timing methodology is
    // unchanged — this only duplicates already-computed numbers.
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${ok.size},""" +
        s""""n_fail":${results.size - ok.size},"failures":$fails,""" +
        s""""loadavg":[$load0,$load1,$load2],"sf":"$sfDir"}"""
    println(summary)
    spark.stop()
  }
}
