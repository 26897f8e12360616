package graft

import org.apache.spark.sql.Row

/** The scalar long tail (functions/ScalarTail.scala) exercised through
  * SQL — the same resolution path a user's Pinot-flavored query takes.
  * Expected values follow the reference implementations in
  * `pinot-common/.../function/scalar/` (cited per group in the
  * implementation file).
  */
class ScalarTailSpec extends SparkSpec {

  private def one(sql: String): Any = {
    graft.functions.PinotFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql").head.get(0)
  }

  test("typed array family collapses onto generic Spark ops") {
    assert(one("arrayConcatInt(array(1,2), array(3))") ==
      Seq(1, 2, 3))
    assert(one("arrayElementAtString(array('a','b'), 2)") == "b")
    assert(one("arrayElementAtInt(array(1,2), 5)") == null)
    assert(one("arrayIndexOfString(array('a','b','c'), 'b')") == 1)
    assert(one("arrayIndexOfInt(array(1,2), 9)") == -1)
    assert(one("arrayIndexesOfInt(array(5,7,5,5), 5)") == Seq(0, 2, 3))
    assert(one("arrayPushFrontInt(array(2,3), 1)") == Seq(1, 2, 3))
    assert(one("arraySliceInt(array(10,20,30,40), 1, 3)") == Seq(20, 30))
    assert(one("arrayToString(array('x','y'), '-')") == "x-y")
    assert(one("intersectIndices(array(1,3,5), array(3,4,5))") == Seq(3, 5))
    assert(one("generateIntArray(0, 6, 2)") == Seq(0, 2, 4, 6))
    assert(one("generateDoubleArray(0.0D, 1.0D, 0.5D)") ==
      Seq(0.0, 0.5, 1.0))
  }

  test("epoch bucket family (DateTimeFunctions.java)") {
    assert(one("toEpochDays(172800000)") == 2L)
    assert(one("toEpochHoursRounded(7200000, 10)") == 0L)
    assert(one("toEpochMinutesBucket(600000, 5)") == 2L)
    assert(one("fromEpochDays(2)") == 172800000L)
    assert(one("fromEpochHoursBucket(1, 24)") == 86400000L)
    assert(one("toEpochDaysMV(array(86400000, 172800000))") ==
      Seq(1L, 2L))
  }

  test("datetime leftovers: iso8601, dateBin, timestampAdd/Diff, dow/yow") {
    assert(one("toIso8601(0)") == "1970-01-01T00:00:00.000Z")
    assert(one("fromIso8601('1970-01-02T00:00:00.000Z')") == 86400000L)
    assert(one("dateBin('PT15M', 1000000, 0)") == 900000L)
    assert(one("dateAddEpoch('DAY', 2, 0)") == 172800000L)
    assert(one("dateAddEpoch('MONTH', 1, 0)") == 2678400000L)
    assert(graft.sql.QueryFacade.rewriteReserved(
      "SELECT dateAdd('DAY', 1, 0), timestampDiff('HOUR', 0, x)") ==
      "SELECT dateAddEpoch('DAY', 1, 0), dateDiffEpoch('HOUR', 0, x)")
    assert(one("dateDiffEpoch('HOUR', 0, 7200000)") == 2L)
    // 1970-01-01 was a Thursday: ISO dow = 4
    assert(one("dow(0)") == 4)
    assert(one("doy(86400000)") == 2)
    assert(one("yow(0)") == 1970)
    assert(one("timezoneHour('America/New_York', 0)") == -5)
    assert(one("hourMV(array(0, 3600000))") == Seq(0, 1))
    assert(one("timestampAddMV('HOUR', 1, array(0, 3600000))") ==
      Seq(3600000L, 7200000L))
  }

  test("URL cut/extract family (UrlFunctions.java)") {
    val u = "'https://www.sub.example.com/a/b?x=1&y=2#frag'"
    assert(one(s"cutFragment($u)") ==
      "https://www.sub.example.com/a/b?x=1&y=2")
    assert(one(s"cutQueryString($u)") ==
      "https://www.sub.example.com/a/b#frag")
    assert(one(s"cutQueryStringAndFragment($u)") ==
      "https://www.sub.example.com/a/b")
    assert(one(s"cutWWW($u)") ==
      "https://sub.example.com/a/b?x=1&y=2#frag")
    assert(one(s"urlPathWithQuery($u)") == "/a/b")
    assert(one(s"urlFirstSignificantSubdomain($u)") == "example")
    assert(one(s"cutToFirstSignificantSubdomain($u)") == "example.com")
    assert(one(s"urlHierarchy('https://h.io/a/b')") ==
      Seq("https://h.io", "https://h.io/a", "https://h.io/a/b"))
    assert(one(s"urlPathHierarchy('https://h.io/a/b')") ==
      Seq("/a", "/a/b"))
    assert(one(s"cutURLParameter($u, 'x')") ==
      "https://www.sub.example.com/a/b?y=2#frag")
    assert(one(s"extractURLParameters($u)") == Seq("x=1", "y=2"))
    assert(one(s"extractURLParameterNames($u)") == Seq("x", "y"))
  }

  test("string leftovers") {
    assert(one("leftSubStr('hello', 3)") == "hel")
    assert(one("rightSubStr('hello', 3)") == "llo")
    assert(one("rightSubStr('hi', 9)") == "hi")
    assert(one("strcmp('a', 'b')") == -1)
    assert(one("isValidAscii('plain')") == true)
    assert(one("isValidAscii('naïve')") == false)
    assert(one("prefixes('abc')") == Seq("a", "ab", "abc"))
    // reference order: shortest suffix first (StringFunctions.java:470)
    assert(one("suffixes('abc')") == Seq("c", "bc", "abc"))
    assert(one("startsWithCaseInsensitive('Hello', 'he')") == true)
    assert(one("difference('Smith', 'Smyth')") == 4)
  }

  test("hash family matches published test vectors") {
    // FNV canonical vectors (Fowler/Noll/Vo published test suite)
    assert(one("fnv1aHash32UTF8('')") == 0x811c9dc5)
    assert(one("fnv1Hash32UTF8('a')") == 0x050c5d7e)
    assert(one("fnv1aHash32UTF8('a')") == 0xe40c292c)
    assert(one("fnv1aHash64UTF8('')") == 0xcbf29ce484222325L)
    // Adler32/CRC32C standard check values
    assert(one("adler32(encode('abc', 'UTF-8'))") == 38600999)
    assert(one("crc32c(encode('123456789', 'UTF-8'))") == 0xe3069283)
    // MurmurHash3 x86_32 canonical ("hello", seed 0)
    assert(one("murmurHash3Bit32(encode('hello', 'UTF-8'), 0)") ==
      0x248bfa47)
    // x64_128: 64-bit variant is the first 8 little-endian bytes
    val full = one("murmurHash3Bit128(encode('hello', 'UTF-8'), 42)")
      .asInstanceOf[Array[Byte]]
    val lo = (0 until 8).map(i => (full(i) & 0xffL) << (8 * i)).reduce(_ | _)
    assert(one("murmurHash3Bit64(encode('hello', 'UTF-8'), 42)") == lo)
    // MD2 RFC 1319 test vectors
    assert(one("md2(encode('', 'UTF-8'))") ==
      "8350e5a3e24c153df2275c9f80692773")
    assert(one("md2(encode('abc', 'UTF-8'))") ==
      "da853b0d3f88d99b30283a69e6ded6bb")
    // murmur2: deterministic + utf8 variant consistency
    assert(one("murmurHash2(encode('pinot', 'UTF-8'))") ==
      one("murmurHash2UTF8('pinot')"))
    assert(one("murmurHash2Bit64(encode('x', 'UTF-8'))") !=
      one("murmurHash2Bit64(encode('y', 'UTF-8'))"))
  }

  test("geohash round-trip and known cell") {
    // canonical example: Jutland cell "u4pruydqqvj" ≈ (57.64911, 10.40744)
    assert(one("encodeGeoHash(57.64911D, 10.40744D, 11)") == "u4pruydqqvj")
    val lat = one("decodeGeoHashLatitude('u4pruydqqvj')")
      .asInstanceOf[Double]
    val lon = one("decodeGeoHashLongitude('u4pruydqqvj')")
      .asInstanceOf[Double]
    assert(math.abs(lat - 57.64911) < 1e-4 && math.abs(lon - 10.40744) < 1e-4)
    assert(one("decodeGeoHash('u4pruydqqvj')")
      .asInstanceOf[scala.collection.Seq[Double]].size == 2)
  }

  test("gcd/lcm/hamming/levenshtein + conversions + IP helpers") {
    assert(one("gcd(12, 18)") == 6L)
    assert(one("gcd(0, 5)") == 5L)
    assert(one("lcm(4, 6)") == 12L)
    assert(one("hammingDistance('karolin', 'kathrin')") == 3)
    assert(one("levenshteinDistance('kitten', 'sitting')") == 3)
    assert(one("base64Encode(toBytes('hi'))") == "aGk=")
    assert(one("fromBytes(base64Decode('aGk='))") == "hi")
    assert(one("bytesToHex(toBytes('A'))") == "41")
    assert(one("fromBytes(hexToBytes('41'))") == "A")
    assert(one("divide(7, 2)") == 3.5)
    assert(one("divide(7, 0, -1.0D)") == -1.0)
    assert(one("remove('banana', 'an')") == "ba")
    assert(one("ipMaskLen('10.0.0.0/24')") == 24)
    assert(one("ipFamily('::1')") == 6)
    assert(one("ipFamily('8.8.8.8')") == 4)
    // canonical RFC 5952 IPv4-mapped form (reference IpAddressFunctions)
    assert(one("ipv4ToIpv6('1.2.3.4')") == "::ffff:102:304")
    assert(one("isPrivateIp('192.168.1.9')") == true)
    assert(one("isPrivateIp('8.8.8.8')") == false)
    assert(one("isPrivateIp('127.0.0.1')") == true)
    assert(one("isPrivateIp('169.254.10.1')") == true)
    assert(one("isPrivateIp('::1')") == true)
    assert(one("dotProduct(array(1.0D,2.0D), array(3.0D,4.0D))") == 11.0)
    assert(one("euclideanDistance(array(0.0D,0.0D), array(3.0D,4.0D))")
      == 5.0)
  }

  test("math + json leftovers") {
    assert(one("exp2(10.0D)") == 1024.0)
    assert(one("sigmoid(0.0D)") == 0.5)
    assert(one("intDivOrZero(7, 0)") == 0L)
    assert(one("intDivOrZero(7, 2)") == 3L)
    assert(one("isFinite(1.0D)") == true)
    assert(one("isInfinite(cast('Infinity' as double))") == true)
    assert(one("ifNotFinite(cast('Infinity' as double), 9.0D)") == 9.0)
    assert(one("byteSwapInt(1)") == 16777216)
    assert(one("byteSwapLong(1)") == 72057594037927936L)
    assert(one("hexDecimalToLong('ff')") == 255L)
    assert(one("longToHexDecimal(255)") == "ff")
    assert(one("jsonPathString('{\"a\":{\"b\":\"v\"}}', '$.a.b')") == "v")
    assert(one("jsonPathLong('{\"n\":7}', '$.n')") == 7L)
    assert(one("jsonPathExists('{\"n\":7}', '$.x')") == false)
    assert(one("jsonPathArray('{\"a\":[1,2]}', '$.a')") == Seq("1", "2"))
    assert(one("isJson('{\"a\":1}')") == true)
    assert(one("isJson('nope{')") == false)
  }

  test("ngram family matches reference semantics (NgramFunctions.java)") {
    // exact length, first-occurrence order, duplicates collapsed
    assert(one("uniqueNgrams('abab', 2)") == Seq("ab", "ba"))
    assert(one("generateUniqueNgrams('abc', 3)") == Seq("abc"))
    // n > length or n == 0 → empty
    assert(one("uniqueNgrams('ab', 3)") == Seq())
    assert(one("uniqueNgrams('ab', 0)") == Seq())
    // range form: lengths [1, 2]
    assert(one("uniqueNgrams('aab', 1, 2)") ==
      Seq("a", "b", "aa", "ab"))
    // MV forms union across elements
    assert(one("uniqueNgramsMV(array('ab', 'bc'), 2)") == Seq("ab", "bc"))
    assert(one("uniqueNgramsMV(array('ab', 'cd'), 1, 1)") ==
      Seq("a", "b", "c", "d"))
  }

  test("spelling aliases and internal functions resolve") {
    assert(one("concatWs('-', 'a', 'b', 'c')") == "a-b-c")
    assert(one("regexpLike('hello', '^h.*o$')") == true)
    assert(one("regexpLike('HELLO', '^h.*o$', 'i')") == true)
    assert(one("regexpReplaceVar('aXb', upper('x'), '-')") == "a-b")
    assert(one("queryEngine()") == "graft-spark")
    assert(one("sleep(5)") == 5)
    assert(one("startTime()").asInstanceOf[Long] > 0L)
    // ARRAYS_OVERLAP (ArraysOverlapScalarFunction) rides Spark's
    // arrays_overlap builtin via the bare-spelling alias
    assert(one("arraysOverlap(array(1, 2), array(2, 3))") == true)
    assert(one("arraysOverlap(array(1, 2), array(3, 4))") == false)
    // avgReduce (InternalReduceFunctions.java): the MSE reducer's
    // final AVG over (sum, count) partials — null on zero/null count
    assert(one("avgReduce(10.0, 4)") == 2.5)
    assert(one("avgReduce(10.0, 0)") == null)
    assert(one("avgReduce(CAST(NULL AS DOUBLE), 4)") == null)
    // polymorphic arithmetic scalars (ArithmeticFunctionsTest golds):
    // moduloOrZero(9,5)=4, zero divisor → 0; positiveModulo shifts a
    // negative remainder into [0,|b|): (9,±5)→4, (-9,5)→1, (-9,-5)→1
    assert(one("moduloOrZero(9, 5)").toString.toDouble == 4.0)
    assert(one("moduloOrZero(9, 0)").toString.toDouble == 0.0)
    assert(one("positiveModulo(9, 5)").toString.toDouble == 4.0)
    assert(one("positiveModulo(9, -5)").toString.toDouble == 4.0)
    assert(one("positiveModulo(-9, 5)").toString.toDouble == 1.0)
    assert(one("positiveModulo(-9, -5)").toString.toDouble == 1.0)
    assert(one("negate(7)").toString.toDouble == -7.0)
  }
}
