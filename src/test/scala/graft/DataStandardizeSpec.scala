package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DataStandardize.standardize

/** Replay of the reference's DataTypeTransformerTest.testStandardize
  * (`pinot-segment-local/.../recordtransformer/DataTypeTransformerTest
  * .java:45-230`) — every committed case, multi-value results compared
  * order-insensitively where the upstream uses assertEqualsNoOrder
  * (map iteration order). */
class DataStandardizeSpec extends AnyFunSuite {
  private val C = "testColumn"
  private def jmap(kv: (String, Any)*): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    kv.foreach { case (k, v) => m.put(k, v) }
    m
  }
  private def jlist(xs: Any*): java.util.List[Any] = {
    val l = new java.util.ArrayList[Any]()
    xs.foreach(l.add)
    l
  }
  private def mv(v: Any): Set[Any] = v.asInstanceOf[Array[Any]].toSet
  private def failsSv(v: Any): Unit =
    intercept[IllegalStateException](standardize(C, v, true))

  test("maps: empty null, singleton collapses, multi errors-SV/arrays-MV") {
    assert(standardize(C, jmap(), true) == null)
    assert(standardize(C, jmap(), false) == null)
    assert(standardize(C, jmap("testKey" -> "testValue"), true) == "testValue")
    assert(standardize(C, jmap("testKey" -> "testValue"), false) == "testValue")
    val multi = jmap("testKey1" -> "testValue1", "testKey2" -> "testValue2")
    failsSv(multi)
    assert(mv(standardize(C, multi, false)) == Set("testValue1", "testValue2"))
  }

  test("lists and arrays: same contract, order preserved for sequences") {
    assert(standardize(C, jlist(), true) == null)
    assert(standardize(C, jlist("testValue"), false) == "testValue")
    failsSv(jlist("testValue1", "testValue2"))
    assert(standardize(C, jlist("testValue1", "testValue2"), false)
      .asInstanceOf[Array[Any]].toSeq == Seq("testValue1", "testValue2"))
    assert(standardize(C, Array.empty[Any], true) == null)
    assert(standardize(C, Array[Any]("testValue"), true) == "testValue")
    failsSv(Array[Any]("testValue1", "testValue2"))
    assert(standardize(C, Array[Any]("testValue1", "testValue2"), false)
      .asInstanceOf[Array[Any]].toSeq == Seq("testValue1", "testValue2"))
  }

  test("nested wrappers: empties ignored at any depth (:121-230)") {
    // Map with empty List → null both ways
    assert(standardize(C, jmap("testKey" -> jlist()), true) == null)
    assert(standardize(C, jmap("testKey" -> jlist()), false) == null)
    // Map with single-entry List collapses
    assert(standardize(C, jmap("testKey" -> jlist("testValue")), true) == "testValue")
    // Map with one empty Map + one single-entry Map: empty ignored
    val m1 = jmap("testKey1" -> jmap(), "testKey2" -> jmap("testKey" -> "testValue"))
    assert(standardize(C, m1, true) == "testValue")
    // Map with multi-entry List
    val m2 = jmap("testKey" -> jlist("testValue1", "testValue2"))
    failsSv(m2)
    assert(mv(standardize(C, m2, false)) == Set("testValue1", "testValue2"))
    // Map with empty Map + single-entry List + single-entry Object[]
    val m3 = jmap("testKey1" -> jmap(), "testKey2" -> jlist("testValue1"),
      "testKey3" -> Array[Any]("testValue2"))
    failsSv(m3)
    assert(mv(standardize(C, m3, false)) == Set("testValue1", "testValue2"))
    // List with two single-entry Maps + one empty Map
    val l1 = jlist(jmap("testKey" -> "testValue1"),
      jmap("testKey" -> "testValue2"), jmap())
    failsSv(l1)
    assert(standardize(C, l1, false).asInstanceOf[Array[Any]].toSeq ==
      Seq("testValue1", "testValue2"))
    // Object[] with two single-entry Maps
    val a1 = Array[Any](jmap("testKey" -> "testValue1"),
      jmap("testKey" -> "testValue2"))
    failsSv(a1)
    assert(mv(standardize(C, a1, false)) == Set("testValue1", "testValue2"))
    // deep mixed nesting with empties
    val deep = Array[Any](Array.empty[Any],
      jlist(jmap("testKey" -> "testValue1")),
      jmap("testKey" -> jlist(Array[Any]("testValue2"), jmap())))
    failsSv(deep)
    assert(mv(standardize(C, deep, false)) == Set("testValue1", "testValue2"))
  }
}
