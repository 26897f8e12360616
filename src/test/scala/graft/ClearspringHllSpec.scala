package graft

import org.scalatest.funsuite.AnyFunSuite
import com.clearspring.analytics.stream.cardinality.HyperLogLog

/** Wire-format fixtures taken from the reference's own MSE gold outputs
  * (`CountDistinct:countDistinct_non_h2` expected blobs). The engine
  * delegates to the clearspring HyperLogLog that ships on the Spark
  * classpath (stream-lib), which is the exact implementation the
  * reference serializes. */
class ClearspringHllSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString

  test("log2m=2 blob matches reference gold for {foo,bar,baz}") {
    val h = new HyperLogLog(2)
    Seq("foo", "bar", "baz").foreach(h.offer)
    assert(hex(h.getBytes) == "000000020000000400000460")
  }

  test("log2m=8 blob matches reference gold for {foo,bar}") {
    val h = new HyperLogLog(8)
    Seq("foo", "bar").foreach(h.offer)
    val exp = "00000008000000ac00000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000004000000000000000000000000000000000000000000002000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000"
    assert(hex(h.getBytes) == exp)
  }
}

/** Legacy fastHLL: STRING column of char-encoded serialized HLLs
  * (byte + 129 per char, `FastHLLAggregationFunction.java`). */
class FastHllSpec extends SparkSpec {

  private def encode(h: HyperLogLog): String =
    new String(h.getBytes.map(b => (b + 129).toChar))

  test("fasthll merges char-encoded HLL strings to the union estimate") {
    import spark.implicits._
    val h1 = new HyperLogLog(8); Seq("a", "b", "c").foreach(h1.offer)
    val h2 = new HyperLogLog(8); Seq("c", "d").foreach(h2.offer)
    val expected = {
      val m = new HyperLogLog(8); m.addAll(h1); m.addAll(h2)
      m.cardinality()
    }
    graft.functions.PinotFunctions.registerAll(spark)
    Seq(encode(h1), encode(h2)).toDF("s").createOrReplaceTempView("t_fh")
    val got = spark.sql("SELECT fasthll(s) AS c FROM t_fh")
      .head().getLong(0)
    assert(got == expected && got == 4L)
  }
}
