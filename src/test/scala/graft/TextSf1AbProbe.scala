package graft

import org.apache.spark.sql.SparkSession

/** Round-13 directive #4: the worst sf1 ratios are the map-only text
  * scalars (q_text_match_fuzzy 11.9×, q_quality_classifier 11.3× for
  * 10× data), adjudicated in round 12 as PARTITION-COUNT granularity —
  * sf0.1 and sf1 documents.parquet are both a single file well under
  * `spark.sql.files.maxPartitionBytes` (128 MB), so the map-only
  * pipeline runs in ONE task at both scales and the excess over linear
  * is serial-task overhead, not algorithmic growth. This A/B runs the
  * worst offender at sf1 as-written vs with maxPartitionBytes lowered
  * so the same file splits into ~16 tasks: if the adjudication is
  * right, the split run collapses WELL below the as-written time
  * (the algorithm is embarrassingly parallel); if not, the real cause
  * surfaces. No product code changes expected — on a real cluster the
  * 100 TB corpus is thousands of files and the granularity problem
  * doesn't exist.
  *
  * Run: sbt "Test/runMain graft.TextSf1AbProbe /tmp/graft_sf1"
  */
object TextSf1AbProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.PinotFunctions.registerAll(spark)

    val queries = Seq("q_text_match_fuzzy", "q_quality_classifier")
    def run(tag: String, collectResults: Boolean = true): Unit =
      for (q <- queries) {
        val fn = SparkEntry.queries(q)
        // warm once, then min of 2 timed passes
        fn(spark, sf1).collect()
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n =
            if (collectResults) fn(spark, sf1).collect().length.toLong
            else fn(spark, sf1).queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = times.map(_._1).min
        println(f"[probe] $q%-24s $tag%-40s $best%7.2f s  rows=${times.head._2}")
      }

    run("as-written collect (maxPartitionBytes=128m)")
    spark.conf.set("spark.sql.files.maxPartitionBytes", 2L << 20)
    run("split scan collect (maxPartitionBytes=2m)")
    // no-collect arm: full distributed compute, zero driver
    // serialization — isolates whether the sf1 excess is the bench's
    // collect() of a 10×-larger RESULT, not the operator
    run("split scan toRdd.count (no collect)", collectResults = false)
    spark.conf.set("spark.sql.files.maxPartitionBytes", 128L << 20)
    run("as-written toRdd.count (no collect)", collectResults = false)
    spark.stop()
  }
}
