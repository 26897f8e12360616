package graft

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Gapfill, Upsert}

class UpsertFunnelGapfillSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (user, ts, event_id, type, value)
    (1L, 10L, 1L, "signup", 1.0),
    (1L, 20L, 2L, "click", 2.0),
    (1L, 30L, 3L, "purchase", 3.0),
    (2L, 10L, 4L, "click", 4.0),   // click before signup: no funnel progress
    (2L, 20L, 5L, "signup", 5.0),
    (2L, 30L, 6L, "click", 6.0),
    (3L, 10L, 7L, "signup", 7.0)
  ).toDF("user_id", "ts", "event_id", "event_type", "value")

  test("full upsert keeps latest row per key") {
    val out = Upsert.latestByKey(events, Seq("user_id"), "ts", Seq("event_id"))
      .select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 6L, 3L -> 7L))
  }

  test("upsert delete-record column tombstones keys whose latest is a delete") {
    val rows = Seq(
      (1L, 10L, "a", false), (1L, 20L, "a2", true),   // deleted at latest
      (2L, 10L, "b", true), (2L, 20L, "b2", false),   // un-deleted later
      (3L, 10L, "c", false)
    ).toDF("user_id", "ts", "payload", "deleted")
    val out = Upsert.latestByKey(rows, Seq("user_id"), "ts",
        deleteCol = Some("deleted"))
      .select($"user_id", $"payload").as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "b2", 3L -> "c"))
  }

  test("dedup table keeps first row per key") {
    val out = Upsert.firstByKey(events, Seq("user_id"), "ts", Seq("event_id"))
      .select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 4L, 3L -> 7L))
  }

  test("dedup TTL: drops within window, re-inserts after expiry, ties keep first") {
    import org.apache.spark.sql.functions.col
    // key A: t=0 kept, t=100 dropped (gap <= ttl), t=101 dropped
    // (gap from last KEPT, not last seen), t=201 kept (201-0 > 200);
    // key B: tie at t=5 -> smaller id kept; t=205 gap == ttl -> still
    // unexpired (reference expiry is STRICT: stored < t - ttl), t=206 kept
    val rows = Seq(("A", 0L, 1L), ("A", 100L, 2L), ("A", 101L, 3L),
      ("A", 201L, 4L), ("B", 5L, 6L), ("B", 5L, 5L), ("B", 205L, 7L),
      ("B", 206L, 8L))
      .toDF("k", "t", "id")
    val kept = Upsert.dedupTtl(rows, Seq("k"), col("t"), ttlMillis = 200L,
      tieCols = Seq("id"))
      .select($"k", $"id").as[(String, Long)].collect().toSet
    assert(kept == Set(("A", 1L), ("A", 4L), ("B", 5L), ("B", 8L)))
  }

  test("partial upsert merges per strategy") {
    val out = Upsert.partialUpsert(events, Seq("user_id"), "ts",
      Seq(Upsert.Increment("value"), Upsert.Overwrite("event_type"),
        Upsert.Append("event_id")))
      .filter($"user_id" === 1L)
      .select($"value", $"event_type", $"event_id")
      .as[(Double, String, Seq[Long])].collect().head
    assert(out._1 == 6.0)               // INCREMENT: 1+2+3
    assert(out._2 == "purchase")        // OVERWRITE: latest by ts
    assert(out._3 == Seq(1L, 2L, 3L))   // APPEND: arrival order
  }

  test("automatic time boundary = max offline time - granularity") {
    val offline = Seq("2024-01-01 05:00:00", "2024-01-01 09:30:00")
      .toDF("ts").withColumn("ts", to_timestamp($"ts"))
    val realtime = Seq("2024-01-01 08:00:00", "2024-01-01 09:00:00",
      "2024-01-01 10:00:00")
      .toDF("ts").withColumn("ts", to_timestamp($"ts"))
    val boundary = Upsert.timeBoundary(offline, "ts", "1 hour")
    val v = Upsert.hybridView(offline, realtime, "ts", boundary)
    // boundary = 08:30 -> offline rows <= 08:30 (1) + realtime > 08:30 (2)
    assert(v.count() == 3)
    assert(v.filter($"ts" === to_timestamp(lit("2024-01-01 08:00:00"))).count() == 0)
  }

  test("funnel max step respects event order") {
    val steps = Seq(col("event_type") === "signup",
      col("event_type") === "click", col("event_type") === "purchase")
    val out = Funnel.maxStep(events, "user_id", "ts", "event_id", steps)
      .select($"user_id", $"max_step").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("funnel count counts entities per reached step") {
    val steps = Seq(col("event_type") === "signup",
      col("event_type") === "click", col("event_type") === "purchase")
    val out = Funnel.funnelCount(events, "user_id", "ts", "event_id", steps)
      .as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("FORCE_OVERWRITE takes the latest value even when null; OVERWRITE skips nulls") {
    val rows = Seq(
      (1L, 1L, Some("a")), (1L, 2L, None),               // latest is null
      (2L, 1L, None), (2L, 2L, Some("b")),               // latest non-null
      (3L, 1L, Some("c"))
    ).toDF("k", "v", "s")
    val out = Upsert.partialUpsert(rows, Seq("k"), "v",
        Seq(Upsert.ForceOverwrite("s")))
      .select($"k", $"s").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some("b"), 3L -> Some("c")))
    val ov = Upsert.partialUpsert(rows, Seq("k"), "v",
        Seq(Upsert.Overwrite("s")))
      .select($"k", $"s").as[(Long, Option[String])].collect().toMap
    assert(ov == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("c")))
  }

  test("full-upsert tombstone ties: same-comparison revive wins") {
    val rows = Seq(
      (1L, 10L, "old", false),
      (1L, 20L, "", true),      // tombstone at ts=20
      (1L, 20L, "revived", false), // revive at the SAME ts
      (2L, 20L, "", true)       // tombstone, no revive: key gone
    ).toDF("k", "ts", "payload", "deleted")
    val out = Upsert.latestByKey(rows, Seq("k"), "ts",
        deleteCol = Some("deleted"))
      .select($"k", $"payload").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "revived"), out.toString)
  }

  test("partial-upsert tombstone ties: same-comparison revive wins") {
    // the reference's upsert comparison lets the later-arriving record
    // win on EQUAL comparison values, so a delete-then-revive at the
    // same timestamp revives the key (merge state still reset — the
    // pre-delete history stays gone)
    val rows = Seq(
      (1L, 10L, Some(5L), false),  // pre-delete history
      (1L, 20L, None,     true),   // tombstone at ts=20
      (1L, 20L, Some(7L), false),  // revive at the SAME ts
      (2L, 10L, Some(1L), false),
      (2L, 20L, None,     true)    // tombstone, no revive: key gone
    ).toDF("k", "v", "score", "deleted")
    val out = Upsert.partialUpsert(rows, Seq("k"), "v",
        Seq(Upsert.Increment("score")), deleteCol = Some("deleted"))
      .select($"k", $"score").as[(Long, Option[Long])].collect().toMap
    // key 1 revived with RESET state: 7, not 5+7; key 2 deleted
    assert(out == Map(1L -> Some(7L)), out.toString)
  }

  test("gapfillAggregate averages over filled buckets") {
    val agg = Seq(
      ("2024-01-01 00:00:00", "a", 4.0),
      ("2024-01-01 03:00:00", "a", 8.0))
      .toDF("b", "g", "v")
      .select(to_timestamp($"b").as("bucket"), $"g", $"v")
    // filled hourly: 4, 4, 4, 8 -> one day, avg 5.0 over 4 hours
    val out = Gapfill.gapfillAggregate(spark, agg, "bucket", Seq("g"), "1 hour",
        Seq(Gapfill.FillPrevious("v")),
        date_trunc("day", col("bucket")), "day",
        Seq(count(col("v")).as("n"), avg(col("v")).as("a")))
      .select($"n", $"a").as[(Long, Double)].collect().toSeq
    assert(out == Seq((4L, 5.0)))
  }

  test("windowed matchStep bounds funnel progress by the anchor window") {
    val steps = Seq(col("event_type") === "signup",
      col("event_type") === "click", col("event_type") === "purchase")
    // user 1: signup@10 click@20 purchase@30. Window 15 from the anchor
    // covers [10,25): click matches, purchase does not -> max_step 2.
    // Window 25 covers [10,35): all three -> 3.
    val narrow = Funnel.matchStep(events, "user_id", $"ts", steps, 15L)
      .select($"user_id", $"max_step").as[(Long, Int)].collect().toMap
    assert(narrow == Map(1L -> 2, 2L -> 2, 3L -> 1))
    val wide = Funnel.matchStep(events, "user_id", $"ts", steps, 25L)
      .select($"user_id", $"max_step").as[(Long, Int)].collect().toMap
    assert(wide == Map(1L -> 3, 2L -> 2, 3L -> 1))
    val arr = Funnel.matchStep(events, "user_id", $"ts", steps, 15L)
      .filter($"user_id" === 1L)
      .select($"match_steps").as[Seq[Int]].collect().head
    assert(arr == Seq(1, 1, 0))
  }

  test("windowed matchStep uses the best anchor, not only the first") {
    val steps = Seq(col("event_type") === "signup",
      col("event_type") === "click")
    // first signup's window [0,5) misses the click; second signup's
    // window [8,13) catches it.
    val df = Seq((1L, 0L, "signup"), (1L, 8L, "signup"), (1L, 10L, "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.matchStep(df, "user_id", $"ts", steps, 5L)
      .select($"max_step").as[Int].collect().head
    assert(out == 2)
  }

  test("funnel strict modes: order aborts, dedup aborts, increase skips ties") {
    val steps = Seq(col("t") === "a", col("t") === "b", col("t") === "c")
    // a@0, x-noise via repeated a@5 (dedup trigger), b@10, b@12, c@20
    val df = Seq((1L, 0L, "a"), (1L, 5L, "a"), (1L, 10L, "b"),
      (1L, 12L, "b"), (1L, 20L, "c")).toDF("u", "ts", "t")
    def ms(m: Funnel.Modes) =
      Funnel.matchStep(df, "u", $"ts", steps, 100L, m)
        .select($"max_step").as[Int].collect().head
    assert(ms(Funnel.Modes()) == 3)
    // STRICT_DEDUPLICATION: the repeated 'a'@5 (expect-1) aborts the
    // first window at max_step 1; the second 'a'@5 anchor then sees
    // b@10 advance, b@12 repeat -> abort at 2
    assert(ms(Funnel.Modes(strictDedup = true)) == 2)
    // STRICT_ORDER: 'a'@5 is not the expected 'b' -> abort at 1; the
    // 'a'@5 anchor's window hits b then the repeated b -> abort at 2
    assert(ms(Funnel.Modes(strictOrder = true)) == 2)
    // STRICT_INCREASE: same-ts c cannot advance after b at the same ts
    val tied = Seq((1L, 0L, "a"), (1L, 10L, "b"), (1L, 10L, "c"))
      .toDF("u", "ts", "t")
    assert(Funnel.matchStep(tied, "u", $"ts", steps, 100L,
      Funnel.Modes(strictIncrease = true))
      .select($"max_step").as[Int].collect().head == 2)
    assert(Funnel.matchStep(tied, "u", $"ts", steps, 100L)
      .select($"max_step").as[Int].collect().head == 3)
  }

  test("stepDurationStats aggregates first-completing-window durations") {
    val steps = Seq(col("event_type") === "signup",
      col("event_type") === "click", col("event_type") === "purchase")
    // user 1 completes with ts 10,20,30 -> d1=10, d2=10; users 2,3 never
    val out = Funnel.stepDurationStats(events, "user_id", $"ts", steps, 100L)
      .select($"transition", $"n_complete", $"avg_ms", $"min_ms", $"max_ms")
      .as[(Int, Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, 1L, 10.0, 10L, 10L), (2, 1L, 10.0, 10L, 10L)))
  }

  test("gapfill densifies buckets with default and previous fills") {
    val agg = Seq(
      ("2024-01-01 00:00:00", "a", 5L, 1.5),
      ("2024-01-01 03:00:00", "a", 2L, 2.5))
      .toDF("b", "g", "n", "v")
      .select(to_timestamp($"b").as("bucket"), $"g", $"n", $"v")
    val out = Gapfill.gapfill(spark, agg, "bucket", Seq("g"), "1 hour",
      Seq(Gapfill.FillDefault("n", lit(0L)), Gapfill.FillPrevious("v")))
      .orderBy($"bucket")
      .select($"n", $"v").as[(Long, Double)].collect()
    assert(out.length == 4)
    assert(out.map(_._1).toSeq == Seq(5L, 0L, 0L, 2L))
    assert(out.map(_._2).toSeq == Seq(1.5, 1.5, 1.5, 2.5)) // fill previous
  }
}
