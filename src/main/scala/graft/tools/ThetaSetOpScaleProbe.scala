package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× probe for the multi-predicate theta set-op form (round-12
  * directive #4). `rewriteThetaSetOps` compiles
  * `DISTINCT_COUNT_THETA_SKETCH(expr, '', 'f1', …, 'SET_…($i,…)')`
  * into ONE scan carrying N FILTER'd sketch aggregates composed by
  * post-aggregation blob algebra — plan-shape-gated (PlanShapeSpec)
  * but unmeasured at scale until this probe. The question: do the
  * map-side partial aggregates keep the shuffled state bounded (N
  * sketch blobs per map task, not per row)? The A/B is the shape a
  * naive translation would produce — one scan PER predicate glued by
  * scalar subqueries. */
object ThetaSetOpScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.PinotFunctions.registerAll(spark)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = graft.Tables(spark, sfDir).orders
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val big = spark.range(factor).crossJoin(
        orders.select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice")))
      .repartition(cpus.toInt * 2).localCheckpoint()
    println(s"[probe] rows = ${big.count()}")
    big.createOrReplaceTempView("theta_probe_t")

    def time(name: String)(sql: String): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = graft.sql.QueryFacade.sql(spark,
          s"SET explicitLimit = true; $sql").collect()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-34s pass$i $s%8.2f s  head=${r.head.get(0)}")
      }
    }

    val f1 = "o_orderpriority = '1-URGENT'"
    val f2 = "o_totalprice > 150000"
    val f3 = "o_orderpriority = '5-LOW'"

    // the rewrite form: ONE scan, 3 FILTER'd sketch aggregates
    time("set-op rewrite (one scan, KEPT)")(
      s"SELECT DISTINCT_COUNT_THETA_SKETCH(o_custkey, ''," +
        s" '$f1', '$f2', '$f3'," +
        s" 'SET_INTERSECT(SET_UNION($$1, $$3), $$2)') AS est" +
        s" FROM theta_probe_t")

    // naive translation: one scan per predicate via scalar subqueries
    time("per-predicate scans (A/B)")(
      s"""SELECT GETTHETASKETCHESTIMATE(thetasketchintersect(
            thetasketchunion(
              (SELECT distinctcountrawthetasketch(o_custkey)
                 FROM theta_probe_t WHERE $f1),
              (SELECT distinctcountrawthetasketch(o_custkey)
                 FROM theta_probe_t WHERE $f3)),
            (SELECT distinctcountrawthetasketch(o_custkey)
               FROM theta_probe_t WHERE $f2))) AS est""")

    // grouped variant: FILTER'd sketch aggregates under a group key —
    // partials must combine map-side per (task, group), one blob per
    // (group, predicate) crossing the exchange
    time("grouped filtered sketches")(
      s"""SELECT o_orderpriority,
            GETTHETASKETCHESTIMATE(thetasketchunion(
              distinctcountrawthetasketch(o_custkey) FILTER (WHERE $f2),
              distinctcountrawthetasketch(o_custkey)
                FILTER (WHERE o_totalprice <= 150000))) AS est
          FROM theta_probe_t GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")

    spark.stop()
  }
}
