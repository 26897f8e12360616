package graft

import org.apache.spark.sql.functions._
import graft.plans.{GraftUll, TupleSketchImpl}

/** SketchFunctions scalar family — replay of the reference's
  * `SketchFunctionsTest.java` (typed 1-element creation golds over
  * {string, int, long, float, double, decimal, bytes}, null → empty,
  * ULL state round-trip) plus the tuple blob algebra semantics the
  * integration suite exercises (sum/min/max unions, intersect, diff)
  * and the BYTES-only reference aggregate form. */
class SketchScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def q(sql: String) =
    graft.sql.QueryFacade.sql(spark, s"SET explicitLimit = true; $sql")

  test("creation scalars: every typed input counts 1, null counts 0") {
    // the suite's _inputs = {"string", 1, 1L, 1.0f, 1.0d, decimal(1), bytes}
    val df = Seq((
      "string", 1, 1L, 1.0f, 1.0d, BigDecimal(1), Array[Byte](1, 2, 3)))
      .toDF("s", "i", "l", "f", "d", "bd", "b")
    df.createOrReplaceTempView("sks_t")
    for (c <- Seq("s", "i", "l", "f", "d", "bd", "b")) {
      val r = q(s"SELECT GET_THETA_SKETCH_ESTIMATE(TO_THETA_SKETCH($c))," +
        s" GET_THETA_SKETCH_ESTIMATE(TO_THETA_SKETCH($c, 1024))," +
        s" GET_INT_TUPLE_SKETCH_ESTIMATE(TO_INTEGER_SUM_TUPLE_SKETCH($c, 1))," +
        s" GET_INT_TUPLE_SKETCH_ESTIMATE(TO_INTEGER_SUM_TUPLE_SKETCH($c, 1, 16))," +
        s" GET_CPC_SKETCH_ESTIMATE(TO_CPC_SKETCH($c))," +
        s" GET_CPC_SKETCH_ESTIMATE(TO_CPC_SKETCH($c, 11))" +
        s" FROM sks_t").collect().head
      (0 until 6).foreach(j => assert(r.getLong(j) == 1L, s"$c col $j"))
      // HLL and ULL estimates decoded with the raw libraries
      val hb = q(s"SELECT TO_HLL($c), TO_HLL($c, 8) FROM sks_t")
        .collect().head
      assert(graft.plans.Hll.fromBlob(
        hb.getAs[Array[Byte]](0)).cardinality() == 1L)
      assert(graft.plans.Hll.fromBlob(
        hb.getAs[Array[Byte]](1)).cardinality() == 1L)
      val ub = q(s"SELECT TO_ULL($c), TO_ULL($c, 11) FROM sks_t")
        .collect().head
      assert(math.round(GraftUll.fromBytes(
        ub.getAs[Array[Byte]](0)).estimate) == 1L)
      assert(math.round(GraftUll.fromBytes(
        ub.getAs[Array[Byte]](1)).estimate) == 1L)
    }
    val z = q("SELECT GET_THETA_SKETCH_ESTIMATE(TO_THETA_SKETCH(NULL))," +
      " GET_INT_TUPLE_SKETCH_ESTIMATE(TO_INTEGER_SUM_TUPLE_SKETCH(NULL, 1))," +
      " GET_CPC_SKETCH_ESTIMATE(TO_CPC_SKETCH(NULL)) FROM sks_t")
      .collect().head
    (0 until 3).foreach(j => assert(z.getLong(j) == 0L, s"null col $j"))
    val zu = q("SELECT TO_HLL(NULL), TO_ULL(NULL) FROM sks_t").collect().head
    assert(graft.plans.Hll.fromBlob(zu.getAs[Array[Byte]](0))
      .cardinality() == 0L)
    assert(math.round(GraftUll.fromBytes(zu.getAs[Array[Byte]](1))
      .estimate) == 0L)
  }

  test("fromULL round-trips the wrapped state") {
    val r = q("SELECT FROM_ULL(TO_ULL('x')), TO_ULL('x')" +
      " FROM (SELECT 1) t").collect().head
    assert(r.getAs[Array[Byte]](0).toSeq == r.getAs[Array[Byte]](1).toSeq)
  }

  test("tuple blob algebra: sum/min/max unions, intersect, diff") {
    // shared key 'k' with values 3 and 5: union summary is mode-merged
    def summaryOf(blob: Array[Byte]): Seq[(Long)] = {
      val it = TupleSketchImpl.heapify(blob).iterator()
      val out = Seq.newBuilder[Long]
      while (it.next()) out += it.getSummary.getValue.toLong
      out.result()
    }
    val r = q("SELECT INT_SUM_TUPLE_SKETCH_UNION(" +
      " TO_INTEGER_SUM_TUPLE_SKETCH('k', 3)," +
      " TO_INTEGER_SUM_TUPLE_SKETCH('k', 5))," +
      " INT_MIN_TUPLE_SKETCH_UNION(" +
      " TO_INTEGER_SUM_TUPLE_SKETCH('k', 3)," +
      " TO_INTEGER_SUM_TUPLE_SKETCH('k', 5))," +
      " INT_MAX_TUPLE_SKETCH_UNION(" +
      " TO_INTEGER_SUM_TUPLE_SKETCH('k', 3)," +
      " TO_INTEGER_SUM_TUPLE_SKETCH('k', 5)) FROM (SELECT 1) t")
      .collect().head
    assert(summaryOf(r.getAs[Array[Byte]](0)) == Seq(8L))
    assert(summaryOf(r.getAs[Array[Byte]](1)) == Seq(3L))
    assert(summaryOf(r.getAs[Array[Byte]](2)) == Seq(5L))
    // 3-arg leading nominal-entries overload
    val r3 = q("SELECT GET_INT_TUPLE_SKETCH_ESTIMATE(" +
      "INT_SUM_TUPLE_SKETCH_UNION(1024," +
      " TO_INTEGER_SUM_TUPLE_SKETCH('a', 1)," +
      " TO_INTEGER_SUM_TUPLE_SKETCH('b', 1))) FROM (SELECT 1) t")
      .collect().head
    assert(r3.getLong(0) == 2L)
    // {a,b} ∩ {b,c} = {b}; {a,b} \ {b,c} = {a}
    val ix = q("SELECT GET_INT_TUPLE_SKETCH_ESTIMATE(" +
      "INT_SUM_TUPLE_SKETCH_INTERSECT(" +
      " INT_SUM_TUPLE_SKETCH_UNION(TO_INTEGER_SUM_TUPLE_SKETCH('a', 1)," +
      "  TO_INTEGER_SUM_TUPLE_SKETCH('b', 1))," +
      " INT_SUM_TUPLE_SKETCH_UNION(TO_INTEGER_SUM_TUPLE_SKETCH('b', 1)," +
      "  TO_INTEGER_SUM_TUPLE_SKETCH('c', 1))))," +
      " GET_INT_TUPLE_SKETCH_ESTIMATE(INT_SUM_TUPLE_SKETCH_DIFF(" +
      " INT_SUM_TUPLE_SKETCH_UNION(TO_INTEGER_SUM_TUPLE_SKETCH('a', 1)," +
      "  TO_INTEGER_SUM_TUPLE_SKETCH('b', 1))," +
      " INT_SUM_TUPLE_SKETCH_UNION(TO_INTEGER_SUM_TUPLE_SKETCH('b', 1)," +
      "  TO_INTEGER_SUM_TUPLE_SKETCH('c', 1)))) FROM (SELECT 1) t")
      .collect().head
    assert(ix.getLong(0) == 1L && ix.getLong(1) == 1L)
  }

  test("cpc union and toString scalars") {
    val r = q("SELECT GET_CPC_SKETCH_ESTIMATE(CPC_SKETCH_UNION(" +
      " TO_CPC_SKETCH('a'), TO_CPC_SKETCH('b'))) FROM (SELECT 1) t")
      .collect().head
    assert(r.getLong(0) == 2L)
    val s = q("SELECT THETA_SKETCH_TO_STRING(TO_THETA_SKETCH('x'))," +
      " CPC_SKETCH_TO_STRING(TO_CPC_SKETCH('x')) FROM (SELECT 1) t")
      .collect().head
    assert(s.getString(0).contains("Estimate") ||
      s.getString(0).contains("SUMMARY"))
    assert(s.getString(1).nonEmpty)
  }

  test("reference aggregate form: BYTES tuple column merges (1-arg + lgK)") {
    // the reference's DISTINCT_COUNT_TUPLE_SKETCH only accepts a BYTES
    // column of serialized sketches; per-key values sum across blobs
    val df = Seq(("k1", 3), ("k1", 5), ("k2", 7))
      .toDF("key", "v")
    df.createOrReplaceTempView("tpl_blob_src")
    graft.functions.PinotFunctions.registerAll(spark)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tpl_blobs AS
        SELECT TO_INTEGER_SUM_TUPLE_SKETCH(key, v) AS blob
        FROM tpl_blob_src""")
    val r = q("SELECT DISTINCT_COUNT_TUPLE_SKETCH(blob)," +
      " DISTINCT_COUNT_TUPLE_SKETCH(blob, 14)," +
      " SUMVALUESINTEGERSUMTUPLESKETCH(blob) FROM tpl_blobs")
      .collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 15L)
  }

  test("numeric 2nd arg is nominal entries, not lgK (ADVICE r12)") {
    // IntegerTupleSketchAggregationFunction.java:126 assigns the int
    // literal straight to _nominalEntries — a reference-style call
    // with 16384 must keep full accuracy (the old lgK reading computed
    // 1 << 16384 which wraps to nominal 1 and collapses the estimate)
    val df = (1 to 64).map(i => (s"k$i", i)).toDF("key", "v")
    df.createOrReplaceTempView("tpl_nominal_src")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tpl_nominal AS
        SELECT TO_INTEGER_SUM_TUPLE_SKETCH(key, v) AS blob
        FROM tpl_nominal_src""")
    val r = q("SELECT DISTINCT_COUNT_TUPLE_SKETCH(blob, 16384)," +
      " DISTINCT_COUNT_TUPLE_SKETCH(blob, CAST(NULL AS INT))" +
      " FROM tpl_nominal").collect().head
    assert(r.getLong(0) == 64L)
    // NULL literal degrades to the default nominal entries, no NPE
    assert(r.getLong(1) == 64L)
  }

  test("theta set-op rewrite re-escapes quotes inside the params literal") {
    // the unescaped params string is re-embedded in single quotes —
    // an embedded quote must be doubled again or the spliced SQL is
    // malformed (ADVICE r12). Count quote balance on the output.
    val in = "SELECT DISTINCT_COUNT_THETA_SKETCH(key, 'a=''x''," +
      " nominalEntries=4096', 'v > 0', 'SET_UNION($1, $1)') FROM t"
    val out = graft.sql.QueryFacade.rewriteThetaSetOps(in)
    assert(out != in, "rewrite did not fire")
    assert(out.count(_ == '\'') % 2 == 0,
      s"unbalanced quotes in rewritten SQL: $out")
    assert(out.contains("a=''x''"), s"params quote not re-escaped: $out")
  }
}
