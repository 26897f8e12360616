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
}
