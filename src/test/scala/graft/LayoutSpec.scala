package graft

import org.apache.spark.sql.functions._
import graft.sources.BucketedTables
import graft.operators.SkewJoin

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    BucketedTables.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    BucketedTables.writeBucketed(o, "o_bkt", "l_orderkey", 8)
    try {
      // AQE would hide the static plan; inspect the non-AQE physical plan
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = BucketedTables.coLocatedJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      val physical = j.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected exchange-free co-located join:\n$physical")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("salted join equals plain join results") {
    val left = Seq.tabulate(1000)(i => ("hot", i)) ++ Seq(("cold", -1))
    val l = left.toDF("k", "v")
    val r = Seq(("hot", 10), ("cold", 20), ("unmatched", 30)).toDF("k", "w")
    val plain = l.join(r, Seq("k")).agg(sum($"v" * $"w")).as[Long].collect().head
    val salted = SkewJoin.saltedEquiJoin(l, r, "k", salts = 8)
      .agg(sum($"v" * $"w")).as[Long].collect().head
    assert(salted == plain)
    val saltedLeft = SkewJoin.saltedEquiJoin(l, r, "k", 8, "left")
    assert(saltedLeft.count() == l.count())
  }
}
