package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.BatchIngest
import graft.sources.BatchIngest.FlattenComplex

/** Replay of the reference's ComplexTypeTransformer suite
  * (`pinot-segment-local/.../recordtransformer/ComplexTypeTransformerTest
  * .java`) against BatchIngest.FlattenComplex. The reference flattens
  * per-row java maps; the Spark analog flattens schema-typed structs
  * (dynamic-key MapType columns are MapShred territory), so the
  * corpora here use struct columns where the upstream rows use maps —
  * the dotted-name/unnest/JSON-mode semantics under test are
  * identical. */
class FlattenComplexSpec extends SparkSpec {
  import spark.implicits._

  private def json(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().toSeq

  test("flattenMap: root + nested tuples to dotted names; delimiter override (:39-97)") {
    val df = Seq((1L, ("v", (2, "u")), 3))
      .toDF("a", "map1", "map2c")
      .select($"a",
        struct($"map1._1".as("b"),
          struct($"map1._2._1".as("aa"), $"map1._2._2".as("bb")).as("im1"))
          .as("map1"),
        struct($"map2c".as("c")).as("map2"))
    val out = BatchIngest.applyTransforms(df, Seq(FlattenComplex()))
    assert(out.columns.toSeq ==
      Seq("a", "map1.b", "map1.im1.aa", "map1.im1.bb", "map2.c"))
    val r = out.collect().head
    assert(r.getAs[Long]("a") == 1L && r.getAs[String]("map1.b") == "v" &&
      r.getAs[Int]("map1.im1.aa") == 2 && r.getAs[String]("map1.im1.bb") == "u" &&
      r.getAs[Int]("map2.c") == 3)

    // delimiter override "_"
    val out2 = BatchIngest.applyTransforms(df,
      Seq(FlattenComplex(delimiter = "_")))
    assert(out2.columns.toSeq ==
      Seq("a", "map1_b", "map1_im1_aa", "map1_im1_bb", "map2_c"))
  }

  test("unnestCollection: root array, sibling cross-product, nested unnest, primitive replace (:99-290)") {
    // root-level array of tuples: dotted columns + ORIGINAL array kept
    val one = Seq(Tuple1(Seq("v1", "v2"))).toDF("arr")
      .select(transform($"arr", x => struct(x.as("a"))).as("array"))
    val u1 = BatchIngest.applyTransforms(one,
      Seq(FlattenComplex(fieldsToUnnest = Seq("array"))))
    assert(u1.columns.toSeq == Seq("array", "array.a"))
    assert(u1.select(col("`array.a`")).collect().map(_.getString(0)).sorted
      .toSeq == Seq("v1", "v2"))
    assert(u1.select(size($"array")).collect().forall(_.getInt(0) == 2))

    // sibling collections cross-product (4 rows)
    val two = one.withColumn("array2",
      transform(typedLit(Seq("v3", "v4")), x => struct(x.as("b"))))
    val u2 = BatchIngest.applyTransforms(two,
      Seq(FlattenComplex(fieldsToUnnest = Seq("array", "array2"))))
    val got2 = u2.select(col("`array.a`"), col("`array2.b`")).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got2 == Seq(("v1", "v3"), ("v1", "v4"), ("v2", "v3"), ("v2", "v4")))

    // nested unnest with an empty inner array: 3 rows, empty → null
    val nested = Seq(1).toDF("x").select(array(
      struct(lit("v1").as("a"),
        array(struct(lit("v3").as("b")), struct(lit("v4").as("b")))
          .as("array2")),
      struct(lit("v2").as("a"),
        array().cast("array<struct<b:string>>").as("array2"))).as("array"))
    val u3 = BatchIngest.applyTransforms(nested,
      Seq(FlattenComplex(fieldsToUnnest = Seq("array", "array.array2"))))
    val got3 = u3.select(col("`array.a`"), col("`array.array2.b`"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(t => (t._1, t._2.getOrElse(""))).toSeq
    assert(got3 == Seq(("v1", Some("v3")), ("v1", Some("v4")), ("v2", None)))

    // parent unnested but inner NOT: inner renders as a JSON string
    val u4 = BatchIngest.applyTransforms(nested,
      Seq(FlattenComplex(fieldsToUnnest = Seq("array"))))
    val got4 = u4.select(col("`array.a`"), col("`array.array2`"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got4 == Seq(("v1", """[{"b":"v3"},{"b":"v4"}]"""), ("v2", "[]")))

    // primitive array unnest REPLACES the column
    val prim = Seq(("value", "another", Seq("x", "y"))).toDF("a", "b", "array")
    val u5 = BatchIngest.applyTransforms(prim,
      Seq(FlattenComplex(fieldsToUnnest = Seq("array"))))
    assert(u5.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2))).sorted.toSeq ==
      Seq(("value", "another", "x"), ("value", "another", "y")))
  }

  test("unnestMultiLevelArray: level1 + level1.level2.level3 (:290-335)") {
    val l3 = array(struct(lit("foo_bar").as("level4")),
      struct(lit("foo_bar").as("level4")))
    val df = Seq(1).toDF("x").select(array(
      struct(struct(l3.as("level3")).as("level2")),
      struct(struct(l3.as("level3")).as("level2"))).as("level1"))
    val out = BatchIngest.applyTransforms(df, Seq(FlattenComplex(
      fieldsToUnnest = Seq("level1", "level1.level2.level3"),
      collectionNotUnnestedToJson = "NONE")))
    val got = out.select(col("`level1.level2.level3.level4`")).collect()
    assert(got.length == 4 && got.forall(_.getString(0) == "foo_bar"))
  }

  test("convertCollectionToString modes (:338-450)") {
    // inner collection of structs under an unnested parent → String
    // (covered above); primitive array NOT converted by default …
    val prim = Seq(Tuple1(Seq(1, 2))).toDF("array")
    val d1 = BatchIngest.applyTransforms(prim, Seq(FlattenComplex()))
    assert(d1.schema("array").dataType.isInstanceOf[ArrayType])
    // … but converted under ALL
    val d2 = BatchIngest.applyTransforms(prim,
      Seq(FlattenComplex(collectionNotUnnestedToJson = "ALL")))
    assert(d2.schema("array").dataType == StringType)
    assert(d2.collect().head.getString(0) == "[1,2]")
    // array under a tuple: flattened name converts (ALL), stays under NONE
    val tup = Seq(1).toDF("x").select(struct(
      array(struct(lit("v1").as("b"))).as("array1")).as("t"))
    val d3 = BatchIngest.applyTransforms(tup,
      Seq(FlattenComplex(collectionNotUnnestedToJson = "ALL")))
    assert(d3.schema("t.array1").dataType == StringType)
    val d4 = BatchIngest.applyTransforms(tup,
      Seq(FlattenComplex(collectionNotUnnestedToJson = "NONE")))
    assert(d4.schema("t.array1").dataType.isInstanceOf[ArrayType])
  }

  test("renamePrefixes: longest prefix wins; collisions error (:453-480)") {
    val df = Seq((1L, 2L, "u")).toDF("a", "map1.b", "map2.c")
    val out = BatchIngest.applyTransforms(df, Seq(FlattenComplex(
      prefixesToRename = Map("map1." -> "", "map2" -> "test"))))
    assert(out.columns.toSeq == Seq("a", "b", "test.c"))
    assert(out.collect().head == Row(1L, 2L, "u"))
    intercept[IllegalArgumentException] {
      BatchIngest.applyTransforms(Seq((1, 2)).toDF("x.y", "y"),
        Seq(FlattenComplex(prefixesToRename = Map("x." -> "")))).columns
    }
  }
}
