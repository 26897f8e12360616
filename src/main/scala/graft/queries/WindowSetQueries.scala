package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QH._

/** Window functions (reference `WindowAggregateOperator.java:78` and
  * `operator/window/`), set operations (`operator/set/`), sorts/limits
  * (`SortOperator.java:41`, default-limit semantics in SURVEY §2.6).
  *
  * Scale notes: every window partitions by a real key (never a global
  * window — a `Window.orderBy` without partitionBy is a single-task
  * sort and is avoided); top-k queries end in
  * `orderBy(...).limit(k)` which Catalyst plans as
  * TakeOrderedAndProject — per-partition heaps, no global sort.
  */
object WindowSetQueries {

  val all: Seq[GQuery] = Seq(

    // ROW_NUMBER / RANK / DENSE_RANK (window/range/*.java).
    GQuery("q_win_rank",
      (s, dir) => {
        val t = Tables(s, dir)
        val wRank = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
        val wRow = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        t.customer
          .withColumn("rnk", rank().over(wRank))
          .withColumn("drnk", dense_rank().over(wRank))
          .withColumn("rn", row_number().over(wRow))
          .filter(col("rn") <= 3)
          .select(col("c_nationkey"), col("rn"), col("rnk"), col("drnk"), col("c_custkey"))
          .orderBy(col("c_nationkey"), col("rn"))
      },
      Some("""WITH r AS (SELECT c_nationkey, c_custkey,
          RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
          DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer)
        SELECT c_nationkey, rn, rnk, drnk, c_custkey FROM r WHERE rn <= 3
        ORDER BY c_nationkey, rn""")),

    // NTILE / PERCENT_RANK / CUME_DIST.
    GQuery("q_win_ntile",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").asc, col("p_partkey").asc)
        t.part
          .withColumn("tile", ntile(4).over(w))
          .withColumn("prank", r6(percent_rank().over(w)))
          .withColumn("cdist", r6(cume_dist().over(w)))
          .select(col("p_brand"), col("p_partkey"), col("tile"), col("prank"), col("cdist"))
          .orderBy(col("p_brand"), col("p_partkey"))
      },
      Some("""SELECT p_brand, p_partkey,
        NTILE(4) OVER w AS tile,
        ROUND(PERCENT_RANK() OVER w, 6) AS prank,
        ROUND(CUME_DIST() OVER w, 6) AS cdist
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC)
        ORDER BY p_brand, p_partkey""")),

    // LAG / LEAD (window/value/{Lag,Lead}ValueWindowFunction.java).
    GQuery("q_win_lag_lead",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t.events
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("prev_value", lag(col("value"), 2, -1.0).over(w))
          .select(col("user_id"), col("event_id"), col("prev_type"),
            col("next_type"), col("prev_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        LAG(event_type, 1) OVER w AS prev_type,
        LEAD(event_type, 1) OVER w AS next_type,
        LAG(value, 2, -1.0) OVER w AS prev_value
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ORDER BY user_id, event_id""")),

    // FIRST_VALUE / LAST_VALUE / NTH_VALUE with an explicit frame
    // (window/value/FirstValueWindowFunction.java, LastValue…).
    GQuery("q_win_first_last",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t.events
          .withColumn("first_type", first(col("event_type")).over(w))
          .withColumn("last_type", last(col("event_type")).over(w))
          .withColumn("second_type", nth_value(col("event_type"), 2).over(w))
          .select(col("user_id"), col("event_id"), col("first_type"),
            col("last_type"), col("second_type"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        FIRST_VALUE(event_type) OVER w AS first_type,
        LAST_VALUE(event_type) OVER w AS last_type,
        NTH_VALUE(event_type, 2) OVER w AS second_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, event_id""")),

    // Windowed aggregates with ROWS frames (window/aggregate/*, frames
    // WindowFrame.java): running sum + sliding mean.
    GQuery("q_win_frames",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sliding = base.rowsBetween(-2, 0)
        // r14 perf: frame sums accumulate the 4-dp-scaled LONG (value
        // is 4-dp-exact, machine-checked) with one exact decimal
        // division per output — same doubles as the decimal-cast form,
        // without a >18-precision buffer re-serialized per frame row
        val sv = round(col("value") * 10000).cast("long")
        def unscale(c: Column): Column =
          (c.cast(DecimalType(28, 0)) / lit(10000)).cast("double")
        t.events
          .withColumn("run_sum", unscale(sum(sv).over(running)))
          .withColumn("slide_avg",
            (unscale(sum(sv).over(sliding)) /
              count(lit(1)).over(sliding)))
          .withColumn("run_cnt", count(lit(1)).over(running))
          .select(col("user_id"), col("event_id"), col("run_sum"),
            col("slide_avg"), col("run_cnt"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER run AS DOUBLE) AS run_sum,
        CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER slide AS DOUBLE)
          / COUNT(*) OVER slide AS slide_avg,
        COUNT(*) OVER run AS run_cnt
        FROM events
        WINDOW run AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          slide AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    // RANGE frame on a numeric ordering key (WindowAggregateOperator
    // RANGE frames, :57-85).
    GQuery("q_win_range_frame",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_partkey"))
          .rangeBetween(-100L, 0L)
        t.lineitem
          .filter(col("l_orderkey") <= 100)
          .withColumn("range_cnt", count(lit(1)).over(w))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_partkey"), col("range_cnt"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_partkey,
        COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_partkey
          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS range_cnt
        FROM lineitem WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber""")),

    // UNION / UNION ALL (UnionOperator, UnionAllOperator).
    GQuery("q_setop_union",
      (s, dir) => {
        val t = Tables(s, dir)
        val a = t.customer.filter(col("c_acctbal") > 7000.0).select(col("c_custkey"))
        val b = t.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        val uAll = a.unionAll(b).agg(count(lit(1)).as("n_all"))
        val uDist = a.union(b).distinct().agg(count(lit(1)).as("n_dist"))
        uAll.crossJoin(uDist)
      },
      Some("""WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7000.0),
        b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        u1 AS (SELECT COUNT(*) AS n_all FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
        u2 AS (SELECT COUNT(*) AS n_dist FROM (SELECT * FROM a UNION SELECT * FROM b))
        SELECT n_all, n_dist FROM u1, u2""")),

    // INTERSECT / EXCEPT (+ ALL variants) (IntersectOperator.java:31,
    // MinusOperator.java:32, IntersectAllOperator, MinusAllOperator).
    GQuery("q_setop_intersect_except",
      (s, dir) => {
        val t = Tables(s, dir)
        val a = t.orders.filter(col("o_totalprice") > 150000.0)
          .select(col("o_custkey"))
        val b = t.orders.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        val res = Seq(
          a.intersect(b).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n")),
          a.intersectAll(b).agg(count(lit(1)).as("n")).select(lit("intersect_all").as("op"), col("n")),
          a.except(b).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n")),
          a.exceptAll(b).agg(count(lit(1)).as("n")).select(lit("except_all").as("op"), col("n")))
        res.reduce(_ unionAll _).orderBy(col("op"))
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0),
        b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        UNION ALL SELECT 'except_all', COUNT(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        UNION ALL SELECT 'intersect', COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        UNION ALL SELECT 'intersect_all', COUNT(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        ORDER BY op""")),

    // ORDER BY + LIMIT top-k (SortOperator.java:41 PQ top-k →
    // TakeOrderedAndProject in Spark).
    GQuery("q_sort_topk",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(15)
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""")),

    // OFFSET pagination (query.thrift offset; Spark .offset()).
    GQuery("q_sort_offset",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .orderBy(col("o_orderkey").asc)
          .offset(10).limit(20)
          .select(col("o_orderkey"), col("o_orderstatus"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
        ORDER BY o_orderkey ASC LIMIT 20 OFFSET 10""")),

    // Time-bucket aggregation (TIMESERIESAGGREGATE,
    // AggregationFunctionType.java:242) via Spark's window() — the
    // streaming-compatible tumbling-window operator.
    GQuery("q_ts_window_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
          .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("v"))
          .orderBy(col("bucket"), col("event_type"))
      },
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
        COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""))
  )
}
