package graft

import java.util.Base64

import com.google.common.hash.{BloomFilter, Funnels}
import org.roaringbitmap.RoaringBitmap
import org.roaringbitmap.longlong.Roaring64NavigableMap

import org.apache.spark.sql.functions._
import graft.plans.IdSetSketch

/** Wire-format checks for the IDSET / DISTINCTCOUNTBITMAP family: every
  * blob this engine writes must decode with the SAME third-party
  * libraries the reference serializes with (RoaringBitmap, guava
  * BloomFilter), using the reference's [type byte][payload] layout
  * (pinot-core/.../query/utils/idset/). */
class IdSetWireSpec extends SparkSpec {
  import spark.implicits._

  private def b64(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    Base64.getDecoder.decode(df.head().getString(0))

  test("INT ids → type-1 blob readable by raw RoaringBitmap") {
    val bytes = b64(Seq(3, 1, 4, 1, 5).toDF("v")
      .agg(IdSetSketch.idSet(col("v")).as("s")))
    assert(bytes(0) == 1)
    val rb = new RoaringBitmap()
    rb.deserialize(java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1))
    assert(rb.getCardinality == 4)
    assert(Seq(1, 3, 4, 5).forall(rb.contains) && !rb.contains(2))
  }

  test("LONG ids → type-2 blob readable by raw Roaring64NavigableMap") {
    val ids = Seq(1L, 42L, 1L << 40)
    val bytes = b64(ids.toDF("v").agg(IdSetSketch.idSet(col("v")).as("s")))
    assert(bytes(0) == 2)
    val rb = new Roaring64NavigableMap()
    rb.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes, 1, bytes.length - 1)))
    assert(ids.forall(rb.contains) && !rb.contains(2L))
  }

  test("STRING ids → type-3 funnel-2 blob readable by raw guava BloomFilter") {
    val bytes = b64(Seq("a", "bb", "ccc").toDF("v")
      .agg(IdSetSketch.idSet(col("v")).as("s")))
    assert(bytes(0) == 3 && bytes(1) == 2)
    val bf = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes, 2, bytes.length - 2),
      Funnels.unencodedCharsFunnel())
    assert(Seq("a", "bb", "ccc").forall(bf.mightContain))
  }

  test("non-positive size threshold degrades INT ids to the bloom form") {
    val bytes = b64(Seq(7, 8).toDF("v")
      .agg(IdSetSketch.idSet(col("v"), sizeThresholdBytes = 0,
        expectedInsertions = 100, fpp = 0.01).as("s")))
    assert(bytes(0) == 3 && bytes(1) == 0) // BLOOM_FILTER, INT funnel
    val bf = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes, 2, bytes.length - 2),
      Funnels.integerFunnel())
    assert(bf.mightContain(7) && bf.mightContain(8))
  }

  test("IN_ID_SET round-trips int, long and string id sets exactly") {
    for ((df, probe, expected) <- Seq(
      (Seq(1, 2, 3).toDF("v"), Seq(2, 9).toDF("p"), Seq(true, false)),
      (Seq(10L, 1L << 35).toDF("v"), Seq(1L << 35, 11L).toDF("p"),
        Seq(true, false)),
      (Seq("x", "y").toDF("v"), Seq("y", "z").toDF("p"),
        Seq(true, false)))) {
      val blob = df.agg(IdSetSketch.idSet(col("v")).as("s")).head().getString(0)
      val got = probe.select(
        IdSetSketch.inIdSet(col("p"), lit(blob)).as("hit"))
        .as[Boolean].collect().toSeq
      assert(got == expected)
    }
  }

  test("a blob written by the reference layout parses (hand-built fixture)") {
    // build the fixture with the raw library, exactly as the reference
    // does in RoaringBitmapIdSet.toBytes
    val rb = RoaringBitmap.bitmapOf(5, 6, 7)
    val payload = new Array[Byte](rb.serializedSizeInBytes())
    rb.serialize(java.nio.ByteBuffer.wrap(payload))
    val blob = Base64.getEncoder.encodeToString(Array[Byte](1) ++ payload)
    val got = Seq(5, 7, 8).toDF("p")
      .select(IdSetSketch.inIdSet(col("p"), lit(blob)).as("hit"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false))
  }

  test("distinctcountbitmap: INT exact, LONG/STRING by Type.hashCode") {
    val n = Seq(1, 2, 2, 3).toDF("v")
      .agg(IdSetSketch.distinctCountBitmap(col("v"))).head().getInt(0)
    assert(n == 3)
    // two longs whose Long.hashCode collide count as ONE (the
    // reference's documented semantics, not a bug here)
    val collide = Seq(0L, 1L << 32 | 1L).toDF("v") // hashCode: 0 vs (2^32+1)^...
      .agg(IdSetSketch.distinctCountBitmap(col("v"))).head().getInt(0)
    val expectHash = Seq(0L, 1L << 32 | 1L)
      .map(java.lang.Long.hashCode(_)).distinct.size
    assert(collide == expectHash)
    val s = Seq("a", "b", "a").toDF("v")
      .agg(IdSetSketch.distinctCountBitmap(col("v"))).head().getInt(0)
    assert(s == 2)
  }

  test("distinctcountbitmap: BYTES input or-merges serialized bitmaps") {
    val blobs = Seq(1, 1, 2, 3, 3, 4).toDF("v")
      .withColumn("g", col("v") % 2)
      .groupBy(col("g"))
      .agg(IdSetSketch.bitmapState(col("v")).as("blob"))
    val merged = blobs.agg(
      IdSetSketch.distinctCountBitmap(col("blob"))).head().getInt(0)
    assert(merged == 4)
  }
}
