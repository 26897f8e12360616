package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", 10L, 1), ("a", 20L, 2), ("a", 5L, 3), ("b", 15L, 4), ("c", 9L, 5)
  ).toDF("k", "t", "lid")

  private def right = Seq(
    ("a", 10L, 100), ("a", 15L, 101), ("b", 1L, 102), ("d", 7L, 103)
  ).toDF("k", "t", "rid")

  test("backward inclusive picks latest right at or before left") {
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
      direction = "backward", allowExact = true, joinType = "left")
      .select($"lid", $"r_rid").as[(Int, Option[Int])].collect().toMap
    assert(out == Map(1 -> Some(100), 2 -> Some(101), 3 -> None,
      4 -> Some(102), 5 -> None))
  }

  test("backward strict excludes equal timestamps") {
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
      direction = "backward", allowExact = false, joinType = "left")
      .select($"lid", $"r_rid").as[(Int, Option[Int])].collect().toMap
    assert(out(1).isEmpty) // t=10 equal right excluded, no earlier
    assert(out(2).contains(101))
  }

  test("forward picks earliest right at or after left") {
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
      direction = "forward", allowExact = true, joinType = "left")
      .select($"lid", $"r_rid").as[(Int, Option[Int])].collect().toMap
    assert(out == Map(1 -> Some(100), 2 -> None, 3 -> Some(100),
      4 -> None, 5 -> None))
  }

  test("inner drops unmatched left rows") {
    val n = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
      joinType = "inner").count()
    assert(n == 3)
  }

  test("broadcast variant matches shuffle variant on every mode") {
    for (exact <- Seq(true, false); jt <- Seq("left", "inner")) {
      val a = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
        direction = "backward", allowExact = exact, joinType = jt)
        .select($"lid", $"r_rid").as[(Int, Option[Int])].collect().toMap
      val b = AsOfJoin.asofJoinBroadcast(left, right, Seq("k"), "t", "t",
        allowExact = exact, joinType = jt)
        .select($"lid", $"r_rid").as[(Int, Option[Int])].collect().toMap
      assert(a == b, s"exact=$exact joinType=$jt: $a vs $b")
    }
  }

  test("broadcast variant plans without shuffling the left side") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_shipdate")
    val o = spark.read.parquet(s"$sf/orders.parquet").limit(100)
      .select(($"o_orderkey" % 7).as("l_orderkey"), $"o_orderdate", $"o_orderkey")
    val plan = AsOfJoin.asofJoinBroadcast(
      li.withColumn("l_orderkey", $"l_orderkey" % 7),
      o, Seq("l_orderkey"), "l_shipdate", "o_orderdate")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join:\n$plan")
  }
}
