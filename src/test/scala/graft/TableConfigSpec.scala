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

  test("fieldConfigList parses JSON/VECTOR/OPENSTRUCT index declarations") {
    val json = """{
      "tableName": "docs",
      "tableType": "OFFLINE",
      "primaryKeyColumns": ["id"],
      "fieldConfigList": [
        { "name": "props", "indexTypes": ["JSON"],
          "properties": { "shredPaths": "$.k:INT;$.tag" } },
        { "name": "embedding", "indexTypes": ["VECTOR"],
          "properties": { "idColumn": "id" } },
        { "name": "attrs", "indexTypes": ["OPENSTRUCT"],
          "indexes": { "openstruct": {
            "maxDenseKeys": 2, "denseKeys": ["pinned"],
            "denseKeyMinFillRate": 0.4 } } }
      ]
    }"""
    val cfg = TableConfig.fromJson(json)
    assert(cfg.fieldIndexes.map(_.column) == Seq("props", "embedding", "attrs"))
    assert(cfg.fieldIndexes(0).indexTypes == Seq("JSON"))
    assert(cfg.fieldIndexes(0).properties("shredPaths") == "$.k:INT;$.tag")
    assert(cfg.fieldIndexes(1).properties("idColumn") == "id")
    val os = cfg.fieldIndexes(2).openStruct.get
    assert(os.maxDenseKeys == 2 && os.denseKeys == Seq("pinned") &&
      os.denseKeyMinFillRate == 0.4)
  }

  test("applyIndexes drives shred, vector registration and open-struct split") {
    import org.apache.spark.sql.types._
    val json = """{
      "tableName": "cfg_docs",
      "tableType": "OFFLINE",
      "primaryKeyColumns": ["id"],
      "fieldConfigList": [
        { "name": "props", "indexTypes": ["JSON"],
          "properties": { "shredPaths": "$.k:INT" } },
        { "name": "attrs", "indexTypes": ["OPENSTRUCT"] }
      ]
    }"""
    val cfg = TableConfig.fromJson(json)
    val df = Seq(
      (1L, """{"k": 5}""", ("a", 1)),
      (2L, """{"k": 50}""", ("b", 2)))
      .toDF("id", "props", "attrs")
    val dir = java.nio.file.Files.createTempDirectory("graft_tcidx").toString
    try {
      val out = TableConfig.applyIndexes(spark, cfg, df, dir)
      // JSON index shredded $.k; OPENSTRUCT split attrs into dense cols
      assert(out.columns.contains("props__k"))
      assert(out.columns.exists(_.startsWith("attrs$")))
      assert(out.filter(col("props__k") >= 50).count() == 1)
      // VECTOR field on a real table registers the facade index
      val embJson = """{
        "tableName": "embeddings",
        "tableType": "OFFLINE",
        "primaryKeyColumns": ["vec_id"],
        "fieldConfigList": [
          { "name": "embedding", "indexTypes": ["VECTOR"] }
        ]
      }"""
      graft.sql.QueryFacade.init(spark, sf)
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      TableConfig.applyIndexes(spark,
        TableConfig.fromJson(embJson), emb, dir)
      val vec = (1.0 +: Seq.fill(63)(0.0)).mkString("ARRAY[", ", ", "]")
      val served = graft.sql.QueryFacade.sql(spark,
        s"""SET explicitLimit = true;
            SELECT vec_id FROM embeddings
            WHERE VECTOR_SIMILARITY(embedding, $vec, 5)""")
      assert(served.collect().length == 5)
      assert(served.queryExecution.executedPlan.toString
        .linesIterator.exists(l =>
          l.contains("PushedFilters") && l.contains("In(vec_id")))
    } finally {
      graft.sql.QueryFacade.VectorIndexes.clear()
      graft.sources.JsonShred.clear()
    }
  }

  test("TEXT and VECTOR fieldConfig properties drive the index configs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tcfg2").toString
    try {
      graft.sql.QueryFacade.init(spark, sf)
      // TEXT index family → facade TEXT_MATCH served index-first
      val docsJson = """{
        "tableName": "documents",
        "tableType": "OFFLINE",
        "primaryKeyColumns": ["doc_id"],
        "fieldConfigList": [
          { "name": "text", "indexTypes": ["TEXT"] }
        ]
      }"""
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      TableConfig.applyIndexes(spark, TableConfig.fromJson(docsJson),
        docs, dir)
      val served = graft.sql.QueryFacade.sql(spark,
        "SET explicitLimit = true; SELECT doc_id FROM documents " +
          "WHERE TEXT_MATCH(text, 'query AND stream')")
      assert(served.queryExecution.executedPlan.toString
        .linesIterator.exists(l =>
          l.contains("PushedFilters") && l.contains("In(doc_id")),
        "TEXT fieldConfig did not register the posting index")
      // VECTOR index with the reference's vectorDistanceFunction /
      // vectorExactRerank properties → top-k by THAT metric, exact
      val embJson = """{
        "tableName": "embeddings",
        "tableType": "OFFLINE",
        "primaryKeyColumns": ["vec_id"],
        "fieldConfigList": [
          { "name": "embedding", "indexTypes": ["VECTOR"],
            "properties": { "vectorDistanceFunction": "L2",
                            "vectorExactRerank": "true" } }
        ]
      }"""
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      TableConfig.applyIndexes(spark, TableConfig.fromJson(embJson),
        emb, dir)
      val vec = (0.5 +: Seq.fill(62)(0.1) :+ 2.0)
        .mkString("ARRAY[", ", ", "]")
      val got = graft.sql.QueryFacade.sql(spark,
        s"""SET explicitLimit = true;
            SELECT vec_id FROM embeddings
            WHERE VECTOR_SIMILARITY(embedding, $vec, 5)""")
        .collect().map(_.getLong(0)).toSet
      val exact = graft.sql.QueryFacade.sql(spark,
        s"""SET explicitLimit = true;
            SELECT vec_id FROM embeddings
            ORDER BY l2distance(embedding, cast($vec as array<double>)) ASC,
              vec_id LIMIT 5""").collect().map(_.getLong(0)).toSet
      assert(got == exact, s"config-driven L2 top-k: $got vs $exact")
    } finally {
      graft.sources.TextIndex.clear()
      graft.sql.QueryFacade.VectorIndexes.clear()
    }
  }

  test("one fieldConfig entry applies EVERY declared index family") {
    // in the reference a fieldConfig entry's index declarations are
    // independent — JSON shredding and a timestampConfig on the same
    // entry must both take effect, not first-match-wins
    val json = """{
      "tableName": "cfg_multi",
      "tableType": "OFFLINE",
      "primaryKeyColumns": ["id"],
      "fieldConfigList": [
        { "name": "props", "indexTypes": ["JSON"],
          "properties": { "shredPaths": "$.k:INT" },
          "timestampConfig": { "granularities": ["DAY"] } }
      ]
    }"""
    val cfg = TableConfig.fromJson(json)
    assert(cfg.fieldIndexes.head.timestampGranularities == Seq("DAY"))
    val df = Seq((1L, """{"k": 5}"""), (2L, """{"k": 50}"""))
      .toDF("id", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_tcmulti").toString
    try {
      val out = TableConfig.applyIndexes(spark, cfg, df, dir)
      // JSON family shredded $.k AND the timestamp family added its
      // derived granularity column
      assert(out.columns.contains("props__k"), out.columns.mkString(","))
      assert(out.columns.exists(_.contains("$DAY")), out.columns.mkString(","))
    } finally {
      graft.sources.JsonShred.clear()
      graft.sources.TimestampIndex.clear()
    }
  }
}
