package graft

import org.apache.spark.sql.functions._
import graft.plans.{KllSketch, ThetaSketchDs, TupleSketch}

/** Reference sketch-column interop: blobs built EXACTLY the way the
  * reference builds them (the same DataSketches/stream-lib library
  * calls its aggregation functions make before `toByteArray`) must
  * deserialize, re-merge, and estimate correctly through this engine's
  * merge aggregates — the "user migrates stored Pinot sketch columns"
  * path. */
class SketchWireFormatSpec extends SparkSpec {

  import spark.implicits._

  test("reference-written theta blobs re-merge via thetasketchunion + estimate") {
    // build two blobs the way DistinctCountThetaSketchAggregationFunction does
    import org.apache.datasketches.theta.UpdateSketch
    def blob(vals: Range): Array[Byte] = {
      val sk = UpdateSketch.builder().setNominalEntries(16384).build()
      vals.foreach(v => sk.update(v.toLong))
      sk.compact().toByteArray
    }
    val df = Seq((blob(1 to 500), blob(301 to 800))).toDF("a", "b")
    df.createOrReplaceTempView("theta_blobs")
    graft.functions.PinotFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT GETTHETASKETCHESTIMATE(THETASKETCHUNION(a, b)) AS u,
                GETTHETASKETCHESTIMATE(THETASKETCHINTERSECT(a, b)) AS i,
                GETTHETASKETCHESTIMATE(THETASKETCHDIFF(a, b)) AS d
         FROM theta_blobs""").collect().head
    assert(row.getLong(0) == 800 && row.getLong(1) == 200 && row.getLong(2) == 300)
  }

  test("reference-written KLL blobs re-aggregate via KLLMERGEPERCENTILE") {
    import org.apache.datasketches.kll.KllDoublesSketch
    def blob(vals: Range): Array[Byte] = {
      val sk = KllDoublesSketch.newHeapInstance(200)
      vals.foreach(v => sk.update(v.toDouble))
      sk.toByteArray
    }
    Seq(blob(1 to 5000), blob(5001 to 10000)).toDF("blob")
      .createOrReplaceTempView("kll_blobs")
    val p50 = spark.sql(
      "SELECT KLLMERGEPERCENTILE(blob, 50.0) FROM kll_blobs")
      .collect().head.getDouble(0)
    assert(math.abs(p50 - 5000) <= 200, s"p50 $p50")
  }

  test("reference-written integer tuple blobs re-merge with summed values") {
    import org.apache.datasketches.tuple.aninteger.{IntegerSketch, IntegerSummary}
    def blob(keys: Range, v: Int): Array[Byte] = {
      val sk = new IntegerSketch(14, IntegerSummary.Mode.Sum)
      keys.foreach(k => sk.update(k.toLong, v))
      sk.compact().toByteArray
    }
    val df = Seq(blob(1 to 100, 2), blob(1 to 100, 3)).toDF("blob")
    // distinct keys 100; per-key sum = 5 after merge → total 500
    val out = df.agg(
      TupleSketch.mergeDistinct(col("blob")).as("d"),
      TupleSketch.mergeSum(col("blob")).as("s"),
      TupleSketch.mergeAvg(col("blob")).as("a")).collect().head
    assert(out.getLong(0) == 100 && out.getLong(1) == 500 && out.getLong(2) == 5)
  }

  test("CPC sketch round-trips its reference wire format") {
    graft.functions.PinotFunctions.registerAll(spark)
    (1 to 5000).map(i => ("k" + i)).toDF("v").createOrReplaceTempView("cpc_in")
    val blobRow = spark.sql(
      "SELECT DISTINCTCOUNTRAWCPCSKETCH(v) AS b FROM cpc_in").collect().head
    val est = org.apache.datasketches.cpc.CpcSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(
        blobRow.getAs[Array[Byte]]("b"))).getEstimate
    assert(math.abs(est - 5000) < 250, s"est $est")
  }
}
