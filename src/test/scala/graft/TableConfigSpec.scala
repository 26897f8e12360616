package graft

import org.apache.spark.sql.functions._
import graft.schema.TableConfig

class TableConfigSpec extends SparkSpec {
  import spark.implicits._

  private val upsertJson = """{
    "tableName": "gameScores",
    "tableType": "REALTIME",
    "primaryKeyColumns": ["playerId"],
    "tableIndexConfig": {"sortedColumn": ["ts"]},
    "upsertConfig": {
      "mode": "FULL",
      "comparisonColumns": ["ts"],
      "deleteRecordColumn": "deleted"
    }
  }"""

  private val partialJson = """{
    "tableName": "gameScores",
    "tableType": "REALTIME",
    "primaryKeyColumns": ["playerId"],
    "upsertConfig": {
      "mode": "PARTIAL",
      "comparisonColumns": ["ts"],
      "partialUpsertStrategies": {"score": "INCREMENT", "name": "IGNORE"}
    }
  }"""

  private def rows = Seq(
    (1L, 10L, "alice", 5.0, false),
    (1L, 20L, "alicia", 7.0, false),
    (2L, 10L, "bob", 3.0, false),
    (2L, 20L, "bob", 0.0, true)    // deleted at latest version
  ).toDF("playerId", "ts", "name", "score", "deleted")

  test("full upsert config parses and yields latest-per-key with deletes") {
    val cfg = TableConfig.fromJson(upsertJson)
    assert(cfg.tableName == "gameScores" && cfg.tableType == "REALTIME")
    assert(cfg.primaryKeys == Seq("playerId"))
    assert(cfg.sortedColumn.contains("ts"))
    assert(cfg.comparisonColumn.contains("ts"))
    assert(cfg.deleteRecordColumn.contains("deleted"))
    val v = TableConfig.view(cfg, rows)
      .select($"playerId", $"name").as[(Long, String)].collect().toMap
    assert(v == Map(1L -> "alicia")) // player 2 tombstoned
  }

  test("partial upsert config applies per-column strategies") {
    val cfg = TableConfig.fromJson(partialJson)
    assert(cfg.partialStrategies == Map("score" -> "INCREMENT", "name" -> "IGNORE"))
    val v = TableConfig.view(cfg, rows)
      .filter($"playerId" === 1L)
      .select($"score", $"name", $"deleted").as[(Double, String, Boolean)]
      .collect().head
    assert(v._1 == 12.0)      // INCREMENT
    assert(v._2 == "alice")   // IGNORE: first wins
    assert(!v._3)             // OVERWRITE default: latest
  }

  test("config-driven ingest writes the declared layout") {
    val cfg = TableConfig.fromJson(upsertJson).copy(
      partitionColumn = Some("name"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tc").toString
    TableConfig.ingest(spark, cfg, rows, s"$dir/out")
    assert(new java.io.File(s"$dir/out").listFiles
      .exists(_.getName.startsWith("name=")))
  }
}
