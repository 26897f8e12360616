package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession

/** Concurrent-serving probe: the reference's operating point is many
  * small queries per second, not one large scan — this measures that
  * regime on the same engine the sequential Bench measures. A fixed
  * mix of short interactive queries (filter, group-agg, top-k, join)
  * runs from N client threads for a fixed wall budget under Spark's
  * FAIR scheduler; reported are achieved QPS and per-query latency
  * percentiles, sequential vs concurrent.
  *
  * Run: sbt 'Test/runMain graft.ConcurrencyProbe' (env:
  * SPARK_GRAFT_QPS_THREADS, default 8; SPARK_GRAFT_QPS_SECONDS, 20).
  */
object ConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val threads = sys.env.getOrElse("SPARK_GRAFT_QPS_THREADS", "8").toInt
    val seconds = sys.env.getOrElse("SPARK_GRAFT_QPS_SECONDS", "20").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // short interactive mix — the reference's serving shapes
    val mix = Seq("q_filter_basic", "q_sort_topk", "q_agg_nogroup",
      "q_join_lookup", "q_fn_datetime", "q_win_rank")
    def run(name: String): Unit = {
      SparkEntry.queries(name)(spark, dir).collect(); ()
    }
    mix.foreach(run) // warm plans + JIT

    // sequential baseline latencies
    val seqLat = mix.flatMap { q =>
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(q); (System.nanoTime() - t0) / 1e6
      }
    }.sorted

    val stop = System.nanoTime() + seconds * 1000000000L
    val done = new AtomicLong(0)
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val pool = (0 until threads).map { tid =>
      val th = new Thread(() => {
        val rnd = new scala.util.Random(tid) // deterministic per thread
        while (System.nanoTime() < stop) {
          val q = mix(rnd.nextInt(mix.size))
          val t0 = System.nanoTime()
          run(q)
          lats.add((System.nanoTime() - t0) / 1e6)
          done.incrementAndGet()
        }
      })
      th.setDaemon(true); th.start(); th
    }
    pool.foreach(_.join())

    val all = lats.toArray(Array.empty[java.lang.Double])
      .map(_.doubleValue).sorted
    def pct(a: Array[Double], p: Double) =
      if (a.isEmpty) 0.0 else a(((a.length - 1) * p).toInt)
    val qps = done.get.toDouble / seconds
    println(f"threads=$threads%d window=${seconds}s completed=${done.get}%d " +
      f"qps=$qps%.1f")
    println(f"sequential p50=${pct(seqLat.toArray, 0.5)}%.0f ms " +
      f"p95=${pct(seqLat.toArray, 0.95)}%.0f ms")
    println(f"concurrent p50=${pct(all, 0.5)}%.0f ms " +
      f"p95=${pct(all, 0.95)}%.0f ms p99=${pct(all, 0.99)}%.0f ms")
    spark.stop()
  }
}
