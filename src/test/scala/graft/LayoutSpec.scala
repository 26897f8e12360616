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

  test("bloom-filtered layout serves EQ misses without touching row groups") {
    // unsorted high-cardinality string column: row-group min/max spans
    // nearly the whole domain (useless), so EQ pruning rests entirely
    // on the bloom filter — the BloomFilterSegmentPruner case
    val n = 200000
    val df = spark.range(n).toDF("id")
      .withColumn("s", md5(concat(lit("row-"), col("id"))))
      .withColumn("payload", concat(lit("p"), col("id")))
      .repartition(1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom").toString
    // small row groups force several per file, so per-group skipping
    // is observable in the footer
    df.write.mode("overwrite")
      .options(BucketedTables.bloomOptions(Map("s" -> 50000L)) +
        ("parquet.block.size" -> (256 * 1024).toString))
      .parquet(dir + "/t")
    val file = new java.io.File(dir + "/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val groups = reader.getRowGroups.asScala
      assert(groups.size > 1, s"expected several row groups, got ${groups.size}")
      val chunks = groups.map(_.getColumns.asScala
        .find(_.getPath.toDotString == "s").get)
      // the filter is written per row group…
      assert(chunks.forall(_.getBloomFilterOffset > 0),
        "bloom filter missing from a row group")
      // …and answers membership: every group definitely excludes a
      // value that is in NO group, while each group's own first value
      // reports maybe-present (no false negatives)
      import org.apache.parquet.io.api.Binary
      val bfs = chunks.map(reader.readBloomFilter)
      assert(bfs.forall(_ != null))
      val absent = Binary.fromString("definitely-not-a-row-hash")
      assert(bfs.forall(bf => !bf.findHash(bf.hash(absent))),
        "EQ miss not excluded — no row-group skip")
      val present = Binary.fromString(
        df.filter(col("id") === 0).select("s").collect().head.getString(0))
      assert(bfs.exists(bf => bf.findHash(bf.hash(present))))
    } finally reader.close()
    // end-to-end: the EQ scan over the bloom layout stays correct
    val hit = spark.read.parquet(dir + "/t")
      .filter(col("s") === md5(lit("row-12345"))).count()
    assert(hit == 1L)
    val miss = spark.read.parquet(dir + "/t")
      .filter(col("s") === "nope").count()
    assert(miss == 0L)
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
