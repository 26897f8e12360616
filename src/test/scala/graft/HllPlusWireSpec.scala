package graft

import com.clearspring.analytics.stream.cardinality.HyperLogLogPlus

import org.apache.spark.sql.functions._
import graft.plans.HllSketch

/** DISTINCTCOUNTHLLPLUS wire-format checks: blobs must parse with the
  * raw stream-lib HyperLogLogPlus (the object the reference serializes
  * via ObjectSerDeUtils.HYPER_LOG_LOG_PLUS_SER_DE), estimates must
  * equal the library's own, and the BYTES input path must re-merge
  * stored sketches. */
class HllPlusWireSpec extends SparkSpec {
  import spark.implicits._

  test("blob decodes with raw HyperLogLogPlus and matches its estimate") {
    val vals = (1 to 500).map(i => s"v$i")
    val blob = vals.toDF("v")
      .agg(HllSketch.hllPlusState(col("v"))).head().getAs[Array[Byte]](0)
    val sk = HyperLogLogPlus.Builder.build(blob)
    val direct = new HyperLogLogPlus(14, 0)
    vals.foreach(direct.offer)
    assert(sk.cardinality() == direct.cardinality())
    assert(java.util.Arrays.equals(blob, direct.getBytes))
    val est = vals.toDF("v")
      .agg(HllSketch.distinctCountHllPlus(col("v"))).head().getLong(0)
    assert(est == direct.cardinality())
  }

  test("BYTES input re-merges sketches written with the raw library") {
    def shard(r: Range): Array[Byte] = {
      val h = new HyperLogLogPlus(14, 0)
      r.foreach(i => h.offer(java.lang.Long.valueOf(i.toLong)))
      h.getBytes
    }
    val merged = Seq(shard(1 to 300), shard(200 to 500)).toDF("b")
      .agg(HllSketch.distinctCountHllPlus(col("b"))).head().getLong(0)
    val direct = new HyperLogLogPlus(14, 0)
    (1 to 500).foreach(i => direct.offer(java.lang.Long.valueOf(i.toLong)))
    assert(merged == direct.cardinality())
  }

  test("SQL names: estimate + raw blob round-trip, partial/final merge") {
    graft.functions.PinotFunctions.registerAll(spark)
    spark.range(1, 2001).select(col("id"), (col("id") % 4).as("g"))
      .createOrReplaceTempView("hp_t")
    val rows = spark.sql(
      """SELECT g, distinctcounthllplus(id) AS est,
        distinctcountrawhllplus(id) AS blob
        FROM hp_t GROUP BY g""").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val sk = HyperLogLogPlus.Builder.build(r.getAs[Array[Byte]]("blob"))
      assert(sk.cardinality() == r.getLong(1))
      // partial/final merge may force sparse→normal conversion in the
      // library, so the estimate is approximate (±2% ≫ rse at p=14)
      assert(math.abs(r.getLong(1) - 500L) <= 10L)
    }
  }
}
