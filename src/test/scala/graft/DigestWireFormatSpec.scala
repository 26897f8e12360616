package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftQDigest, GraftTDigest}

/** Byte-exact wire-format fixtures for the t-digest and q-digest
  * blobs (the reference's PERCENTILERAWTDIGEST / PERCENTILERAWEST
  * column formats — `TDigestUtils.java` MergingDigest layouts and
  * `QuantileDigest.java` toBytes). Expected hex strings are the
  * byte streams those serializers emit for the same logical digest
  * (hand-assembled per the documented layout). */
class DigestWireFormatSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- t-digest ----

  test("tdigest VERBOSE blob is byte-exact for singleton centroids") {
    // MergingDigest.asBytes of {1.0, 2.0, 3.0} @ compression 100:
    // [int 1][min 1.0][max 3.0][compression 100.0][n 3] + 3×[w 1.0][mean]
    val d = GraftTDigest()
    Seq(1.0, 2.0, 3.0).foreach(d.add(_))
    val exp = "000000013ff00000000000004008000000000000" +
      "405900000000000000000003" +
      "3ff00000000000003ff0000000000000" +
      "3ff00000000000004000000000000000" +
      "3ff00000000000004008000000000000"
    assert(hex(d.toBytes) == exp)
  }

  test("tdigest VERBOSE blob round-trips byte-exactly") {
    val d = GraftTDigest()
    (1 to 500).foreach(i => d.add(i * 0.5))
    val bytes = d.toBytes
    assert(hex(GraftTDigest.fromBytes(bytes).toBytes) == hex(bytes))
  }

  test("tdigest decodes the SMALL (float) encoding") {
    // [int 2][min][max][float compression][short mainCap][short bufCap]
    // [short n] + n×[float w][float mean] — the legacy-compat branch of
    // TDigestUtils.makeLegacyCompatible
    val small = unhex("000000023ff0000000000000400800000000000042c80000" +
      "00d2041a0003" +
      "3f8000003f800000" +
      "3f80000040000000" +
      "3f80000040400000")
    val d = GraftTDigest.fromBytes(small)
    assert(d.compression == 100.0)
    assert(d.centroidCount == 3)
    assert(d.quantile(0.5) == 2.0)
    assert(d.min == 1.0 && d.max == 3.0)
  }

  test("tdigest singleton centroids answer the floor-index order statistic") {
    val vals = Seq(13.0, 2.0, 7.0, 42.0, 19.0, 5.0, 23.0, 11.0, 3.0, 31.0)
    val d = GraftTDigest()
    vals.foreach(d.add(_))
    val sorted = vals.sorted
    for (p <- Seq(10, 25, 50, 75, 90, 99)) {
      val exp = sorted(math.min((vals.size * p / 100.0).toInt, vals.size - 1))
      assert(d.quantile(p / 100.0) == exp, s"p=$p")
    }
  }

  test("tdigest quantile accuracy within rank error under merge") {
    val rnd = new scala.util.Random(7)
    val parts = (0 until 8).map { _ =>
      val d = GraftTDigest()
      (0 until 5000).foreach(_ => d.add(rnd.nextGaussian() * 10 + 50))
      d
    }
    // re-merge through the serialized form (the distributed path)
    val merged = GraftTDigest.fromBytes(parts.head.toBytes)
    parts.tail.foreach(p => merged.merge(GraftTDigest.fromBytes(p.toBytes)))
    assert(merged.centroidCount <= 2 * 100 + 10) // legacy 3.2 capacity
    val all = {
      val b = Array.newBuilder[Double]
      val r2 = new scala.util.Random(7)
      (0 until 8 * 5000).foreach(_ => b += r2.nextGaussian() * 10 + 50)
      b.result().sorted
    }
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = merged.quantile(q)
      // rank of the estimate must sit within 1% of the target rank
      val rank = all.count(_ <= est).toDouble / all.length
      assert(math.abs(rank - q) < 0.01, s"q=$q est=$est rank=$rank")
    }
  }

  test("re-merge adopts the stored blobs' compression, not the default") {
    val d = new GraftTDigest(500.0)
    (1 to 1000).foreach(i => d.add(i.toDouble))
    val blob = d.toBytes
    // the aggregate path: empty default buffer + first blob → the
    // merged digest must carry compression 500 end to end
    val adopted = GraftTDigest.fromBytes(blob)
    assert(adopted.compression == 500.0)
    val reblob = adopted.toBytes
    // compression field lives at offset 20 in the verbose layout
    assert(java.nio.ByteBuffer.wrap(reblob).getDouble(20) == 500.0)
  }

  // ---- q-digest ----

  test("qdigest blob is byte-exact for a two-leaf trie") {
    // QuantileDigest.toBytes of {5, 7} @ maxError 0.05:
    // header [0.05][alpha 0][landmark 0][min 5][max 7][n 3], then
    // post-order: leaf(s(5)), leaf(s(7)), parent(flags 3, level 2)
    val d = GraftQDigest()
    d.add(5L)
    d.add(7L)
    val exp = "3fa999999999999a0000000000000000" +
      "0000000000000000" +
      "0000000000000005" + "0000000000000007" + "00000003" +
      "000080000000000000053ff0000000000000" +
      "000080000000000000073ff0000000000000" +
      "030280000000000000050000000000000000"
    assert(hex(d.toBytes) == exp)
  }

  test("qdigest blob round-trips byte-exactly (incl. negatives)") {
    val d = GraftQDigest()
    Seq(-100L, -5L, 0L, 3L, 3L, 900L, Long.MaxValue / 2).foreach(d.add(_))
    val bytes = d.toBytes
    assert(hex(GraftQDigest.fromBytes(bytes).toBytes) == hex(bytes))
  }

  test("qdigest quantiles within maxError rank bound after blob re-merge") {
    val rnd = new scala.util.Random(11)
    val parts = (0 until 6).map { _ =>
      val d = GraftQDigest()
      (0 until 4000).foreach(_ => d.add(rnd.nextInt(100000).toLong))
      d
    }
    val merged = GraftQDigest.fromBytes(parts.head.toBytes)
    parts.tail.foreach(p => merged.merge(GraftQDigest.fromBytes(p.toBytes)))
    val all = {
      val r2 = new scala.util.Random(11)
      (0 until 6 * 4000).map(_ => r2.nextInt(100000).toLong).sorted
    }
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = merged.quantile(q)
      val rank = all.count(_ <= est).toDouble / all.length
      // one-sided: answer is a range upper bound, so rank >= q, and the
      // q-digest invariant bounds the overshoot by maxError
      assert(rank >= q - 1e-9 && rank - q <= 0.05 + 0.01,
        s"q=$q est=$est rank=$rank")
    }
  }

  test("qdigest min/max and count survive the wire") {
    val d = GraftQDigest()
    Seq(10L, 20L, 30L).foreach(d.add(_))
    val back = GraftQDigest.fromBytes(d.toBytes)
    assert(back.count == 3.0)
    assert(back.quantile(0.0) >= 10L && back.quantile(1.0) == 30L)
  }
}
