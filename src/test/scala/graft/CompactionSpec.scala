package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dir = Files.createTempDirectory("graft_compact").toString

  test("merge rollup coarsens granularity preserving additive measures") {
    val out = dir
    val df = Seq(
      ("2024-01-01 10:05:00", "a", 1.0), ("2024-01-01 10:55:00", "a", 2.0),
      ("2024-01-01 11:05:00", "a", 4.0))
      .toDF("ts", "tag", "v").withColumn("ts", to_timestamp($"ts"))
    Compaction.mergeRollup(df, "ts", "hour", Seq("tag"), Seq("v"), s"$out/r")
    val r = spark.read.parquet(s"$out/r").orderBy($"ts")
      .select($"cnt", $"v").as[(Long, Double)].collect()
    assert(r.toSeq == Seq((2L, 3.0), (1L, 4.0)))
  }

  test("realtime to offline moves rows at the boundary") {
    val out = dir
    val rt = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-03 00:00:00"))
      .toDF("id", "ts").withColumn("ts", to_timestamp($"ts"))
    val remaining = Compaction.realtimeToOffline(spark, rt, "ts",
      lit("2024-01-02 00:00:00").cast("timestamp"), s"$out/off")
    assert(remaining.select($"id").as[Long].collect().toSeq == Seq(2L))
    assert(spark.read.parquet(s"$out/off").select($"id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("purge and upsert compaction rewrite the layout") {
    val out = dir
    val df = Seq((1L, 10L, "keep", false), (1L, 20L, "latest", false),
      (2L, 10L, "purge-me", false), (3L, 10L, "del", true))
      .toDF("pk", "ts", "payload", "deleted")
    Compaction.purge(df, $"payload" === "purge-me", s"$out/p")
    assert(spark.read.parquet(s"$out/p").count() == 3)
    Compaction.upsertCompact(df, Seq("pk"), "ts", Some("deleted"), s"$out/u")
    val u = spark.read.parquet(s"$out/u")
      .select($"pk", $"payload").as[(Long, String)].collect().toMap
    assert(u == Map(1L -> "latest", 2L -> "purge-me"))
  }

  test("refresh segment re-applies the current schema and layout") {
    import graft.schema.PinotSchema
    import org.apache.spark.sql.types._
    val out = dir
    // the stored segment predates the schema change: no 'score', and
    // 'hits' was written as INT
    // one segment = one file (the task is per segment directory)
    Seq(("b", 2, 20), ("a", 1, 10), ("c", 3, 30)).toDF("k", "hits", "ts")
      .coalesce(1).write.parquet(s"$out/seg")
    // current schema: hits widened to LONG (compatible datatype
    // change), new METRIC 'score' (zero default) and new DIMENSION
    // 'tag' (type-min/"null" default) — RefreshSegmentTaskExecutor's
    // cases 1 and 3; the rewrite also adds a sort layout (case 2)
    val schema = PinotSchema.Schema("t", Seq(
      PinotSchema.Field("k", StringType, PinotSchema.Dimension),
      PinotSchema.Field("hits", LongType, PinotSchema.Metric),
      PinotSchema.Field("ts", IntegerType, PinotSchema.DateTime),
      PinotSchema.Field("score", DoubleType, PinotSchema.Metric),
      PinotSchema.Field("tag", StringType, PinotSchema.Dimension)))
    Compaction.refreshSegment(spark, s"$out/seg", schema, s"$out/refreshed",
      sortBy = Seq("k"))
    val r = spark.read.parquet(s"$out/refreshed")
    assert(r.schema("hits").dataType == LongType)
    val rows = r.select($"k", $"hits", $"score", $"tag")
      .as[(String, Long, Double, String)].collect()
    // sorted layout on k, defaults backfilled
    assert(rows.toSeq == Seq(("a", 1L, 0.0, "null"), ("b", 2L, 0.0, "null"),
      ("c", 3L, 0.0, "null")))
  }

  test("upsert compact-merge collapses several segments into one") {
    val out = dir
    // three small upsert segments with overlapping keys; later
    // segments carry newer versions and one delete
    Seq((1L, 10L, "v1a", false), (2L, 10L, "v2a", false))
      .toDF("pk", "ts", "payload", "deleted").write.parquet(s"$out/s1")
    Seq((1L, 20L, "v1b", false), (3L, 10L, "v3a", false))
      .toDF("pk", "ts", "payload", "deleted").write.parquet(s"$out/s2")
    Seq((2L, 30L, "v2c", true), (4L, 10L, "v4a", false))
      .toDF("pk", "ts", "payload", "deleted").write.parquet(s"$out/s3")
    Compaction.upsertCompactMerge(spark,
      Seq(s"$out/s1", s"$out/s2", s"$out/s3"),
      Seq("pk"), "ts", Some("deleted"), s"$out/merged")
    val m = spark.read.parquet(s"$out/merged")
    // latest per key ACROSS segments; pk=2's newest version is a
    // delete, so it drops from the merged segment
    assert(m.select($"pk", $"payload").as[(Long, String)].collect().toMap ==
      Map(1L -> "v1b", 3L -> "v3a", 4L -> "v4a"))
    // one merged segment replaces the inputs (the task's contract)
    assert(new java.io.File(s"$out/merged").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }

  test("upsert compact-merge tolerates drifted segment schemas") {
    // round-13 ADVICE: refreshSegment may have added a column to only
    // SOME of the segments being merged — the union must null-fill
    // the absent column, not throw
    val out = dir
    Seq((1L, 10L, "v1a"))
      .toDF("pk", "ts", "payload").write.parquet(s"$out/s1")
    Seq((1L, 20L, "v1b", "eu"), (2L, 10L, "v2a", "us"))
      .toDF("pk", "ts", "payload", "region").write.parquet(s"$out/s2")
    Compaction.upsertCompactMerge(spark,
      Seq(s"$out/s1", s"$out/s2"),
      Seq("pk"), "ts", None, s"$out/merged")
    val m = spark.read.parquet(s"$out/merged")
    assert(m.columns.toSet == Set("pk", "ts", "payload", "region"))
    assert(m.select($"pk", $"payload", $"region").as[(Long, String, String)]
      .collect().toSet == Set((1L, "v1b", "eu"), (2L, "v2a", "us")))
  }
}
