package graft

/** CompatAliases surface + the FnCanonicalize resolution rule (Pinot
  * resolves function names with underscores stripped and lowercased —
  * `FunctionRegistry.canonicalize` — so `ST_Contains`, `is_private_ip`
  * and `stddevPop` must all work through plain SQL). Expected values
  * follow the cited reference implementations. */
class CompatAliasesSpec extends SparkSpec {

  private def one(sql: String): Any = {
    graft.functions.PinotFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql").head.get(0)
  }

  test("operator-name scalars (BinaryOperatorTransformFunction)") {
    assert(one("equals(3, 3)") == true)
    assert(one("not_equals(3, 4)") == true)
    assert(one("greater_than(4, 3)") == true)
    assert(one("greater_than_or_equal(3, 3)") == true)
    assert(one("less_than(3, 4)") == true)
    assert(one("less_than_or_equal(5, 4)") == false)
    assert(one("not_in(5, 1, 2, 3)") == true)
    assert(one("is_distinct_from(NULL, 3)") == true)
    assert(one("is_not_distinct_from(NULL, NULL)") == true)
    assert(one("is_true(NULL)") == false)
    assert(one("is_not_true(NULL)") == true)
    assert(one("is_false(1 = 2)") == true)
    assert(one("caseWhen(1 = 2, 'a', 2 = 2, 'b', 'z')") == "b")
    assert(one("caseWhen(1 = 2, 'a', 'z')") == "z")
  }

  test("canonicalization reaches underscore/no-underscore spellings") {
    // underscored Pinot spellings of graft-registered names
    assert(one("ST_Distance(ST_Point(0,0), ST_Point(3,4))") != null)
    assert(one("ip_mask_len('10.0.0.0/24')") == 24)
    // no-underscore Pinot spellings of Spark builtins
    assert(one("widthBucket(5.0D, 0.0D, 10.0D, 5)") == 3L)
    assert(one("octetLength('hi')") == 2)
    assert(one("stddevPop(x) FROM (SELECT explode(array(1.0D, 3.0D)) AS x)") == 1.0)
    assert(one("regexpCount('a1b2c3', '[0-9]')") == 3)
  }

  test("cityHash + murmur x64 through SQL") {
    // vectors from the reference implementation (CityHashSpec)
    assert(one("cityHash64(toBytes('abc'))") == 2640714258260161385L)
    assert(one("cityHash32(toBytes('abc'))") == 795041479L)
    assert(one("cityHash64(toBytes('abc'), 42)") == 8990265433055283023L)
    assert(one("cityHash64(toBytes('abc'), 17, 99)") == 9116484625016603107L)
    assert(one("murmurHash3X64Bit32(toBytes('hello'), 0)") == -438922741)
    assert(one("murmurHash3X64Bit64(toBytes('hello'), 0)") == -438922741L)
    assert(one("hex(cityHash128(toBytes('ab')))").toString.toLowerCase ==
      "13e834f38a6c88b8cfdbce01c0e7622e")
  }

  test("uuid generators and byte conversions") {
    val v4 = one("uuid_v4()").toString
    assert(v4.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}"))
    val v7 = one("uuid_v7()").toString
    assert(v7.matches("[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    assert(one("fromUUIDBytes(toUUIDBytes('550e8400-e29b-41d4-a716-446655440000'))")
      == "550e8400-e29b-41d4-a716-446655440000")
    // snake_case spellings from the reference scalar/uuid registration
    assert(one("bytes_to_uuid(uuid_to_bytes('550e8400-e29b-41d4-a716-446655440000'))")
      == "550e8400-e29b-41d4-a716-446655440000")
  }

  test("ip masks, ranges, byte forms") {
    assert(one("ipNetmask('192.168.1.0/24')") == "255.255.255.0")
    assert(one("ipHostmask('192.168.1.0/24')") == "0.0.0.255")
    assert(one("ipNetmask('2001:db8::/32')") == "ffff:ffff::")
    assert(one("ipv4CIDRToRange('192.168.1.0/24')") ==
      Seq("192.168.1.0", "192.168.1.255"))
    assert(one("bytesToIpv6(ipv6ToBytes('2001:db8::1'))") == "2001:db8::1")
    assert(one("ipv6ToBytes('1.2.3.4')") == null)
  }

  test("string/regex/decimal leftovers") {
    assert(one("firstline('line one\nline two')") == "line one")
    assert(one("fromAscii(toAscii('graft'))") == "graft")
    assert(one("likeVar('hello', h)" +
      " FROM (SELECT 'h%' AS h)") == true)
    assert(one("regexpLikeVar('Hello', p, 'i')" +
      " FROM (SELECT '^hel' AS p)") == true)
    assert(one("regexpExtractVar('a1b22c', p, 1)" +
      " FROM (SELECT '([0-9]+)b' AS p)") == "1")
    assert(one("cast(bytesToBigDecimal(bigDecimalToBytes(12.5)) AS DOUBLE)") == 12.5)
    assert(one("cutURLParameters('http://x.com/p?a=1&b=2&c=3', array('a','c'))")
      == "http://x.com/p?b=2")
    assert(one("cutToFirstSignificantSubdomainWithWWW('https://www.example.com/p')")
      == "www.example.com")
  }

  test("filterMv applies the v-placeholder predicate per element") {
    assert(one("filterMv(array(1, 5, 8, 12), 'v > 4 AND v < 10')") == Seq(5, 8))
    assert(one("filterMv(array('ab','cd','ae'), 'regexp_like(v, ''^a'')')") ==
      Seq("ab", "ae"))
    assert(one("agoMV(array('PT1H'))")
      .asInstanceOf[scala.collection.Seq[Long]].head > 0L)
  }
}
