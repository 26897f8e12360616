package graft

import org.apache.spark.sql.functions._

/** Pinot MV exists-semantics via the GraftExtensions resolution rule:
  * `mvCol = x` in a WHERE clause matches rows where ANY element equals
  * x (SURVEY §7.5). */
class MvPredicateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val mv = {
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq("a", "b")),
      (2L, Seq(4, 5), Seq("b", "c")),
      (3L, Seq(5, 5), Seq("c"))).toDF("id", "nums", "tags")
    df.createOrReplaceTempView("mv_tbl")
    df
  }

  test("mvCol = scalar means ANY element matches") {
    mv
    val ids = spark.sql("SELECT id FROM mv_tbl WHERE nums = 5 ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids == Seq(2L, 3L))
    val tagIds = spark.sql("SELECT id FROM mv_tbl WHERE tags = 'b' ORDER BY id")
      .as[Long].collect().toSeq
    assert(tagIds == Seq(1L, 2L))
  }

  test("mvCol <> scalar is EXCLUSIVE: NO element equals the value") {
    // Reference NOT_EQ over MV (BaseDictionaryBasedPredicateEvaluator
    // .applyMV) requires every stored value to pass — id=2 ([4,5]) and
    // id=3 ([5,5]) both contain a 5 and are excluded. NOT IN follows
    // the same exclusive semantics via Not(ArrayContains) fallthrough.
    mv
    val ids = spark.sql("SELECT id FROM mv_tbl WHERE nums <> 5 ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids == Seq(1L))
    val notIn = spark.sql(
      "SELECT id FROM mv_tbl WHERE nums NOT IN (1, 4) ORDER BY id")
      .as[Long].collect().toSeq
    assert(notIn == Seq(3L))
  }

  test("mvCol IN (...) means ANY element in the set") {
    mv
    val ids = spark.sql("SELECT id FROM mv_tbl WHERE nums IN (1, 4) ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("scalar predicates are untouched") {
    mv
    assert(spark.sql("SELECT id FROM mv_tbl WHERE id = 2").as[Long]
      .collect().toSeq == Seq(2L))
  }
}
