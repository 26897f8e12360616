package graft

import java.util.Base64

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ItemsSketch, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.functions._
import graft.plans.FrequentSketchDs

/** Wire-format checks for FREQUENTSTRINGSSKETCH / FREQUENTLONGSSKETCH:
  * blobs must decode with raw Apache DataSketches (the library the
  * reference serializes with) and merge through the BYTES input path. */
class FrequentSketchWireSpec extends SparkSpec {
  import spark.implicits._

  test("frequent-strings blob decodes with raw DataSketches ItemsSketch") {
    val df = (Seq.fill(50)("hot") ++ Seq("a", "b", "c")).toDF("v")
    val blob = df.agg(FrequentSketchDs.frequentStringsSketch(col("v")))
      .head().getString(0)
    val sk = ItemsSketch.getInstance[String](
      Memory.wrap(Base64.getDecoder.decode(blob)), new ArrayOfStringsSerDe())
    assert(sk.getEstimate("hot") == 50L)
    assert(sk.getEstimate("a") == 1L)
    assert(FrequentSketchDs.stringSketchEstimate(blob, "hot") == 50L)
  }

  test("frequent-longs blob decodes with raw DataSketches LongsSketch") {
    val df = (Seq.fill(40)(7L) ++ Seq(1L, 2L)).toDF("v")
    val blob = df.agg(FrequentSketchDs.frequentLongsSketch(col("v")))
      .head().getString(0)
    val sk = LongsSketch.getInstance(
      Memory.wrap(Base64.getDecoder.decode(blob)))
    assert(sk.getEstimate(7L) == 40L)
    assert(FrequentSketchDs.longSketchEstimate(blob, 7L) == 40L)
  }

  test("BYTES input merges pre-serialized sketches (reference path)") {
    // two shard sketches written with the raw library, merged by the agg
    def shard(items: Seq[String]): Array[Byte] = {
      val sk = new ItemsSketch[String](64)
      items.foreach(sk.update)
      sk.toByteArray(new ArrayOfStringsSerDe())
    }
    val blobs = Seq(shard(Seq.fill(10)("x")), shard(Seq.fill(5)("x") :+ "y"))
      .toDF("b")
    val merged = blobs.agg(
      FrequentSketchDs.frequentStringsSketch(col("b"))).head().getString(0)
    assert(FrequentSketchDs.stringSketchEstimate(merged, "x") == 15L)
    assert(FrequentSketchDs.stringSketchEstimate(merged, "y") == 1L)
  }

  test("SQL-registered reference names return wire blobs") {
    graft.functions.PinotFunctions.registerAll(spark)
    Seq("p q p", "p").toDF("s").createOrReplaceTempView("fs_t")
    val blob = spark.sql(
      "SELECT frequentstringssketch(s) FROM fs_t").head().getString(0)
    // parses as a DataSketches blob and counts full strings
    assert(FrequentSketchDs.stringSketchEstimate(blob, "p q p") == 1L)
    val lblob = spark.sql(
      "SELECT frequentlongssketch(CAST(length(s) AS LONG)) FROM fs_t")
      .head().getString(0)
    assert(FrequentSketchDs.longSketchEstimate(lblob, 5L) == 1L)
  }
}
