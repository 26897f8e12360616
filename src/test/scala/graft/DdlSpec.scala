package graft

import org.apache.spark.sql.functions._
import graft.sql.{Ddl, QueryFacade}

/** DDL compat layer (reference pinot-sql-ddl DdlCompiler surface). */
class DdlSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE TABLE WITH path registers a queryable view; SHOW/DROP work") {
    Ddl.reset()
    QueryFacade.sql(spark,
      s"CREATE TABLE ddl_li WITH (path = '$sf/lineitem.parquet')")
    val n = QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT COUNT(*) AS n FROM ddl_li")
      .as[Long].collect().head
    assert(n > 5000)
    val shown = QueryFacade.sql(spark, "SHOW TABLES")
      .select($"table").as[String].collect().toSeq
    assert(shown == Seq("ddl_li"))
    val ddl = QueryFacade.sql(spark, "SHOW CREATE TABLE ddl_li")
      .select($"ddl").as[String].collect().head
    assert(ddl.contains("lineitem.parquet"))
    QueryFacade.sql(spark, "DROP TABLE ddl_li")
    assert(QueryFacade.sql(spark, "SHOW TABLES").count() == 0)
  }

  test("CREATE TABLE with upsert options exposes the latest-per-key view") {
    Ddl.reset()
    QueryFacade.sql(spark,
      s"""CREATE TABLE ddl_ev WITH (path = '$sf/events.parquet',
         | upsertMode = 'FULL', primaryKey = 'user_id',
         | comparisonColumn = 'event_id')""".stripMargin)
    val perKey = spark.table("ddl_ev").groupBy($"user_id").count()
      .filter($"count" > 1).count()
    assert(perKey == 0, "upsert view must be one row per key")
    QueryFacade.sql(spark, "DROP TABLE ddl_ev")
  }

  test("CREATE MATERIALIZED VIEW infers rollup shape and rewrites base queries") {
    Ddl.reset()
    Ddl.workspace = java.nio.file.Files
      .createTempDirectory("graft_ddl_mv").toString
    QueryFacade.sql(spark,
      s"CREATE TABLE ddl_li2 WITH (path = '$sf/lineitem.parquet')")
    val status = QueryFacade.sql(spark,
      """CREATE MATERIALIZED VIEW ddl_mv AS
        |SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
        |  COUNT(*) AS n
        |FROM ddl_li2 GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .select($"status").as[String].collect().head
    assert(status == "CREATED_WITH_REWRITE")
    try {
      // MV itself queryable
      assert(spark.table("ddl_mv").count() > 0)
      // base-table aggregate answered from the rollup
      val q = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy($"l_returnflag").agg(sum($"l_quantity").as("q"))
      assert(q.queryExecution.optimizedPlan.toString.contains("sum_l_quantity"))
      // and results still correct vs a fresh direct computation
      val direct = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy($"l_returnflag").agg(sum($"l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        == direct)
      val mvRow = QueryFacade.sql(spark, "SHOW MATERIALIZED VIEWS")
        .as[(String, Boolean)].collect().toSeq
      assert(mvRow == Seq(("ddl_mv", true)))
    } finally {
      QueryFacade.sql(spark, "DROP MATERIALIZED VIEW ddl_mv")
      QueryFacade.sql(spark, "DROP TABLE ddl_li2")
    }
  }

  test("CREATE MV with sketch agg columns builds blob rollups the rewrite serves") {
    Ddl.reset()
    Ddl.workspace = java.nio.file.Files
      .createTempDirectory("graft_ddl_mv_sk").toString
    QueryFacade.sql(spark,
      s"CREATE TABLE ddl_li3 WITH (path = '$sf/lineitem.parquet')")
    // the star-tree agg-pair contract end-to-end: the defining SELECT's
    // sketch aggregates become stored blob columns of the rollup
    val status = QueryFacade.sql(spark,
      """CREATE MATERIALIZED VIEW ddl_mv_sk AS
        |SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  PERCENTILETDIGEST(l_quantity, 50) AS p50_qty,
        |  DISTINCTCOUNTTHETASKETCH(l_suppkey) AS nd_supp
        |FROM ddl_li3 GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .select($"status").as[String].collect().head
    assert(status == "CREATED_WITH_REWRITE")
    try {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
      // a base-table percentile query is answered from the td blob...
      val p50 = fact.groupBy($"l_returnflag")
        .agg(graft.plans.TDigestSketch
          .percentileTDigest($"l_quantity", 50.0).as("p50"))
      assert(p50.queryExecution.optimizedPlan.toString
        .contains("td_l_quantity"), "percentile not served from rollup")
      // ...and a theta distinct count from the theta blob, with values
      // exact below nominal entries
      val nd = fact.groupBy($"l_returnflag")
        .agg(graft.plans.ThetaSketchDs
          .distinctCountTheta($"l_suppkey").as("nd"))
      assert(nd.queryExecution.optimizedPlan.toString
        .contains("theta_l_suppkey"), "theta not served from rollup")
      val direct = fact.groupBy($"l_returnflag")
        .agg(countDistinct($"l_suppkey").as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(nd.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == direct)
    } finally {
      QueryFacade.sql(spark, "DROP MATERIALIZED VIEW ddl_mv_sk")
      QueryFacade.sql(spark, "DROP TABLE ddl_li3")
    }
  }

  test("non-rollup MV materializes without a rewrite") {
    Ddl.reset()
    QueryFacade.sql(spark,
      s"CREATE TABLE ddl_ord WITH (path = '$sf/orders.parquet')")
    val status = QueryFacade.sql(spark,
      """CREATE MATERIALIZED VIEW ddl_top AS
        |SELECT o_custkey, o_totalprice FROM ddl_ord
        |WHERE o_totalprice > 100000""".stripMargin)
      .select($"status").as[String].collect().head
    assert(status == "CREATED")
    assert(spark.table("ddl_top").count() ==
      spark.table("ddl_ord").filter($"o_totalprice" > 100000).count())
    QueryFacade.sql(spark, "DROP MATERIALIZED VIEW ddl_top")
    QueryFacade.sql(spark, "DROP TABLE ddl_ord")
  }
}
