package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SQL-callable funnel aggregate family (graft.plans.FunnelAgg) —
  * hand-computed fixtures mirroring the reference's windowed semantics
  * (`pinot-core/.../funnel/window/`), plus cross-checks against the
  * DataFrame operators in graft.operators.Funnel. */
class FunnelAggSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, type): crafted so u1 completes in-window, u2 stalls at 2,
  // u3's purchase is outside the window, u4 has only clicks.
  private lazy val fixture = Seq(
    ("u1", 1000L, "signup"), ("u1", 2000L, "click"), ("u1", 3000L, "purchase"),
    ("u2", 1000L, "signup"), ("u2", 5000L, "click"),
    ("u3", 1000L, "signup"), ("u3", 2000L, "click"), ("u3", 99999L, "purchase"),
    ("u4", 1000L, "click"), ("u4", 2000L, "click")
  ).toDF("user_id", "ts", "event_type")

  private val stepsSql =
    "event_type = 'signup', event_type = 'click', event_type = 'purchase'"

  test("funnelmaxstep SQL aggregate matches hand-computed windowed funnel") {
    fixture.createOrReplaceTempView("fx")
    val got = spark.sql(
      s"""SELECT user_id, funnelmaxstep(ts, 10000, 3, $stepsSql) AS ms
          FROM fx GROUP BY user_id ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got == Map("u1" -> 3, "u2" -> 2, "u3" -> 2, "u4" -> 0))
  }

  test("funnelmatchstep returns the 0/1 reach array") {
    fixture.createOrReplaceTempView("fx")
    val got = spark.sql(
      s"""SELECT user_id, funnelmatchstep(ts, 10000, 3, $stepsSql) AS m
          FROM fx GROUP BY user_id ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getSeq[Int](1))).toMap
    assert(got("u1") == Seq(1, 1, 1))
    assert(got("u2") == Seq(1, 1, 0))
    assert(got("u4") == Seq(0, 0, 0))
  }

  test("funnelcompletecount counts completed rounds with window re-anchor") {
    // u5 completes the funnel twice inside one stream
    val df = (fixture.collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))) ++ Seq(
        ("u5", 1000L, "signup"), ("u5", 2000L, "click"), ("u5", 3000L, "purchase"),
        ("u5", 4000L, "signup"), ("u5", 5000L, "click"), ("u5", 6000L, "purchase")))
      .toDF("user_id", "ts", "event_type")
    df.createOrReplaceTempView("fx2")
    val got = spark.sql(
      s"""SELECT user_id, funnelcompletecount(ts, 10000, 3, $stepsSql) AS c
          FROM fx2 GROUP BY user_id ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got("u1") == 1)
    assert(got("u2") == 0)
    assert(got("u5") == 2)
  }

  test("strict modes: STRICT_ORDER aborts on intervening step") {
    // signup, click, click, purchase under STRICT_ORDER: second click
    // (step 2 when expecting step 3) resets under the complete-count
    // loop / aborts under maxstep
    val df = Seq(
      ("a", 1000L, "signup"), ("a", 2000L, "click"),
      ("a", 3000L, "click"), ("a", 4000L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    df.createOrReplaceTempView("fx3")
    val strict = spark.sql(
      s"""SELECT funnelmaxstep(ts, 10000, 3, $stepsSql, 'STRICT_ORDER') AS ms
          FROM fx3 GROUP BY user_id""").collect().head.getInt(0)
    val loose = spark.sql(
      s"""SELECT funnelmaxstep(ts, 10000, 3, $stepsSql) AS ms
          FROM fx3 GROUP BY user_id""").collect().head.getInt(0)
    assert(strict == 2 && loose == 3)
  }

  test("funnelstepdurationstats emits per-step duration functions") {
    fixture.createOrReplaceTempView("fx")
    val got = spark.sql(
      s"""SELECT user_id, funnelstepdurationstats(ts, 10000, 3, $stepsSql,
            'DURATIONFUNCTIONS=COUNT,AVG') AS d
          FROM fx GROUP BY user_id ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1))).toMap
    // u1 completes: step0 [count=1, avg=1000], step1 [1, 1000],
    // step2 (last) [1, placeholder 0]
    assert(got("u1") == Seq(1.0, 1000.0, 1.0, 1000.0, 1.0, 0.0))
    // u2 reaches step 2, never completes; COUNT forces emission with
    // reached flags and placeholder durations
    assert(got("u2") == Seq(1.0, 0.0, 1.0, 0.0, 0.0, 0.0))
  }

  test("funneleventsfunctioneval surfaces matched events' extra fields") {
    val df = Seq(
      ("u1", 1000L, "signup", "e1"), ("u1", 2000L, "click", "e2"),
      ("u1", 3000L, "purchase", "e3"),
      ("u2", 1000L, "signup", "x1"))
      .toDF("user_id", "ts", "event_type", "event_id")
    df.createOrReplaceTempView("fx4")
    val got = spark.sql(
      s"""SELECT user_id, funneleventsfunctioneval(ts, 10000, 3, $stepsSql,
            1, event_id) AS ev
          FROM fx4 GROUP BY user_id ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    // header "1, 3" then the three matched extra values in step order
    assert(got("u1") == Seq("1, 3", "e1", "e2", "e3"))
    assert(got("u2") == Seq("0"))
  }

  test("funnelcount: cumulative set-intersection per step, no time order") {
    fixture.createOrReplaceTempView("fx")
    // global (no group): users with signup = {u1,u2,u3}; ∩ click =
    // {u1,u2,u3}; ∩ purchase = {u1,u3}
    val got = spark.sql(
      s"""SELECT funnelcount(user_id, 3, $stepsSql) AS fc FROM fx""")
      .collect().head.getSeq[Long](0)
    assert(got == Seq(3L, 3L, 2L))
  }

  test("SQL funnelmaxstep agrees with the DataFrame operator on events") {
    val events = Tables(spark, sf).events
    events.createOrReplaceTempView("ev_fa")
    val sql = spark.sql(
      s"""SELECT user_id, funnelmaxstep(unix_millis(CAST(ts AS TIMESTAMP)),
            172800000, 3, $stepsSql) AS ms
          FROM ev_fa GROUP BY user_id""")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val op = graft.operators.Funnel.matchStep(events, "user_id",
        unix_millis(col("ts").cast("timestamp")),
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowMillis = 172800000L)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("max_step")))
      .toMap
    // operator emits only users with >=1 tagged event; SQL agg covers all
    op.foreach { case (u, ms) =>
      assert(sql(u) == ms, s"user $u: sql=${sql(u)} op=$ms")
    }
  }

  test("timeseriesaggregate buckets and aggregates per window") {
    val df = Seq(
      (1000L, 1.0), (1500L, 2.0),   // bucket 1 (sec 1-2]
      (2500L, 10.0),                // bucket 2 (sec 2-3]
      (4500L, 5.0))                 // bucket 4 (sec 4-5]
      .toDF("t_ms", "v")
    df.createOrReplaceTempView("tsb")
    val got = spark.sql(
      """SELECT timeseriesaggregate('m3ql', 'SUM', v, t_ms, 'MILLISECONDS',
           0, 2, 1, 5, '') AS s FROM tsb""")
      .collect().head.getSeq[Double](0)
    // firstBucketValue=2s, bucketLen=1s, 5 buckets anchored at (1,2],
    // (2,3], (3,4], (4,5], (5,6]
    assert(got == Seq(3.0, 10.0, 0.0, 5.0, 0.0))
    val avg = spark.sql(
      """SELECT timeseriesaggregate('m3ql', 'AVG', v, t_ms, 'MILLISECONDS',
           0, 2, 1, 5, '') AS s FROM tsb""")
      .collect().head.getSeq[Double](0)
    assert(avg == Seq(1.5, 10.0, 0.0, 5.0, 0.0))
  }

  test("funnelmaxstep matches a direct in-memory replay on random streams") {
    // reference-shaped scalar replay, independent of the Spark code path
    def replay(evts: Seq[(Long, Int)], win: Long, n: Int): Int = {
      val sorted = evts.sorted
      var qi = 0
      val w = scala.collection.mutable.ArrayDeque.empty[(Long, Int)]
      var best = 0
      var go = true
      while (go && qi < sorted.length) {
        while (w.nonEmpty && w.head._2 != 0) w.removeHead()
        if (w.isEmpty) {
          while (qi < sorted.length && sorted(qi)._2 != 0) qi += 1
          if (qi < sorted.length) { w.append(sorted(qi)); qi += 1 }
        }
        if (w.isEmpty) go = false
        else {
          val end = w.head._1 + win
          while (qi < sorted.length && sorted(qi)._1 < end) {
            w.append(sorted(qi)); qi += 1
          }
          var ms = 0
          val it = w.iterator
          var run = true
          while (run && it.hasNext) {
            val e = it.next()
            if (ms == e._2) ms += 1
            if (ms == n) run = false
          }
          best = math.max(best, ms)
          if (best == n) go = false
          else if (w.nonEmpty) w.removeHead()
        }
      }
      best
    }
    val rnd = new scala.util.Random(42)
    val cases = (1 to 30).map { _ =>
      Seq.fill(14)((rnd.nextInt(30).toLong, rnd.nextInt(4))) // step 3 = untagged
    }
    val rows = cases.zipWithIndex.flatMap { case (evts, g) =>
      evts.map { case (ts, st) => (g, ts, st) }
    }
    rows.toDF("g", "ts", "st").createOrReplaceTempView("fx_rand")
    val got = spark.sql(
      """SELECT g, funnelmaxstep(ts, 10, 3, st = 0, st = 1, st = 2) AS ms
         FROM fx_rand GROUP BY g""")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    cases.zipWithIndex.foreach { case (evts, g) =>
      val tagged = evts.filter(_._2 < 3)
      val expect = replay(tagged, 10, 3)
      assert(got(g) == expect, s"case $g: got ${got(g)} expect $expect")
    }
  }

  test("funnel aggregates survive partial/final shuffle (repartitioned input)") {
    fixture.repartition(7).createOrReplaceTempView("fx_shuf")
    val got = spark.sql(
      s"""SELECT user_id, funnelmaxstep(ts, 10000, 3, $stepsSql) AS ms
          FROM fx_shuf GROUP BY user_id ORDER BY user_id""")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got == Map("u1" -> 3, "u2" -> 2, "u3" -> 2, "u4" -> 0))
  }
}
