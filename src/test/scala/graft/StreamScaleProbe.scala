package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-subsystem measurement (round-13 directive #3): every
  * stream source and stateful stream is correctness-gated (exactly-once
  * restart specs) but the 100 TB story was asserted, not probed. This
  * probe measures
  *   (a) end-to-end rows/s through each SOCKET SOURCE (Kafka wire,
  *       Kinesis wire, Pulsar wire) against its in-process
  *       protocol-faithful broker, at two fetch/batch sizes, and
  *   (b) STATE growth of the stateful streams at 1× vs 10× live-key
  *       cardinality — the bounded-state claim is "state ∝ live keys,
  *       not total records seen", so the 10× ratio must be ~10 while
  *       records/key stays fixed, and TTL expiry must DROP TtlDedup
  *       state when the watermark passes.
  *
  * Results land in PLANS.md. Run:
  *   sbt "Test/runMain graft.StreamScaleProbe [rows]"
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(30000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val payload = ("x" * 100).getBytes(UTF_8) // ~100B values

    // untimed warmup: absorb streaming-engine + parquet-sink + codegen
    // startup so the first timed source doesn't carry it alone
    locally {
      val broker = new graft.streaming.KafkaWireBroker(numPartitions = 1).start()
      try {
        (0 until 200).foreach(i =>
          broker.append("warm", 0, s"k$i".getBytes(UTF_8), payload, 1L + i))
        val out = java.nio.file.Files.createTempDirectory("sspw").toString
        val q = spark.readStream
          .format(classOf[graft.streaming.KafkaSocketSourceProvider].getName)
          .option("brokers", broker.bootstrap).option("topic", "warm")
          .option("startingoffsets", "earliest").load()
          .selectExpr("CAST(value AS STRING) AS v")
          .writeStream.format("parquet")
          .option("path", s"$out/out")
          .option("checkpointLocation", s"$out/ckpt").start()
        q.processAllAvailable(); q.stop()
      } finally broker.close()
    }

    def timeQuery(name: String)(build: String => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val out = java.nio.file.Files.createTempDirectory("ssp").toString
      val t0 = System.nanoTime()
      val q = build(out)
      q.processAllAvailable()
      q.stop()
      val s = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$out/out").count()
      println(f"[probe] $name%-46s $s%7.2f s  rows=$rows%-7d ${rows / s}%9.0f rows/s")
      assert(rows == n, s"$name lost rows: $rows != $n")
    }

    // ---------------- Kafka wire source ----------------
    // chunks=1: records pre-published, the timed span is pure consume
    // (comparable with the kinesis/pulsar rows). chunks=8: publish
    // interleaved -> 8 micro-batches, measuring per-trigger overhead.
    for (chunks <- Seq(1, 8)) {
      val broker = new graft.streaming.KafkaWireBroker(numPartitions = 4).start()
      try {
        if (chunks == 1)
          (0 until n).foreach(i =>
            broker.append("probe", i % 4, s"k$i".getBytes(UTF_8), payload,
              1700000000000L + i))
        timeQuery(s"kafka-wire  n=$n  micro-batches=$chunks") { out =>
          val q = spark.readStream
            .format(classOf[graft.streaming.KafkaSocketSourceProvider].getName)
            .option("brokers", broker.bootstrap)
            .option("topic", "probe")
            .option("startingoffsets", "earliest")
            .load()
            .selectExpr("CAST(value AS STRING) AS v")
            .writeStream.format("parquet")
            .option("path", s"$out/out")
            .option("checkpointLocation", s"$out/ckpt")
            .start()
          if (chunks > 1) (0 until chunks).foreach { c =>
            val lo = c * n / chunks; val hi = (c + 1) * n / chunks
            (lo until hi).foreach(i =>
              broker.append("probe", i % 4, s"k$i".getBytes(UTF_8), payload,
                1700000000000L + i))
            q.processAllAvailable()
          }
          q
        }
      } finally broker.close()
    }

    // ---------------- Kinesis wire source ----------------
    val creds = graft.streaming.KinesisWire.Credentials("ak", "sk", "us-east-1")
    for (maxRecords <- Seq(500, 10000)) {
      val mock = new MockKinesis(creds, maxPerCall = 10000)
      try {
        (0 until 4).foreach(s => mock.addShard(f"shardId-$s%012d"))
        (0 until n).foreach(i =>
          mock.put(f"shardId-${i % 4}%012d", s"k$i", payload))
        timeQuery(s"kinesis-wire n=$n maxRecordsToFetch=$maxRecords") { out =>
          spark.readStream
            .format(classOf[graft.streaming.KinesisSocketSourceProvider].getName)
            .option("endpoint", mock.endpoint)
            .option("stream", "probe")
            .option("region", creds.region)
            .option("accessKey", creds.accessKey)
            .option("secretKey", creds.secretKey)
            .option("shardIteratorType", "TRIM_HORIZON")
            .option("maxRecordsToFetch", maxRecords.toString)
            .load()
            .selectExpr("CAST(data AS STRING) AS v")
            .writeStream.format("parquet")
            .option("path", s"$out/out")
            .option("checkpointLocation", s"$out/ckpt")
            .start()
        }
      } finally mock.stop()
    }

    // ---------------- Pulsar wire source ----------------
    for (permits <- Seq(200, 5000)) {
      val mock = new MockPulsar(partitions = 4)
      try {
        (0 until n).foreach(i => mock.put(i % 4, s"k$i", payload))
        timeQuery(s"pulsar-wire n=$n permits=$permits") { out =>
          spark.readStream
            .format(classOf[graft.streaming.PulsarSocketSourceProvider].getName)
            .option("serviceUrl", mock.serviceUrl)
            .option("topic", mock.baseTopic)
            .option("startPosition", "earliest")
            .option("permits", permits.toString)
            .load()
            .selectExpr("CAST(data AS STRING) AS v")
            .writeStream.format("parquet")
            .option("path", s"$out/out")
            .option("checkpointLocation", s"$out/ckpt")
            .start()
        }
      } finally mock.stop()
    }

    // ---------------- TtlDedupStream state growth ----------------
    // records/key fixed at 20; live keys 1k vs 10k. Bounded-state
    // claim: numRowsTotal == live keys (one Long per key), ratio ~10.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ttlStateRows(keys: Int): (Long, Long) = {
      val in = MemoryStream[graft.streaming.TtlDedupStream.Rec]
      val q = graft.streaming.TtlDedupStream
        .kept(in.toDS(), ttlMillis = 1000L, watermarkDelay = "0 seconds")
        .writeStream.outputMode("append").format("noop").start()
      val base = 1700000000000L
      (0 until 20).foreach { r =>
        in.addData((0 until keys).map(k => graft.streaming.TtlDedupStream
          .Rec(s"key$k", new java.sql.Timestamp(base + r * 40L), r.toLong)))
        if (r % 10 == 9) q.processAllAvailable()
      }
      q.processAllAvailable()
      val live = q.lastProgress.stateOperators.head.numRowsTotal
      // watermark far past every key's TTL window -> timeout reaps all
      in.addData(graft.streaming.TtlDedupStream.Rec("flush",
        new java.sql.Timestamp(base + 3600L * 1000), 999L))
      q.processAllAvailable()
      in.addData(graft.streaming.TtlDedupStream.Rec("flush2",
        new java.sql.Timestamp(base + 7200L * 1000), 1000L))
      q.processAllAvailable()
      val reaped = q.lastProgress.stateOperators.head.numRowsTotal
      q.stop()
      (live, reaped)
    }
    val (s1, r1) = ttlStateRows(1000)
    val (s10, r10) = ttlStateRows(10000)
    println(f"[probe] ttl-dedup state rows: 1k keys=$s1 (reaped->$r1), " +
      f"10k keys=$s10 (reaped->$r10), ratio=${s10.toDouble / s1}%.2f")
    assert(s10 <= s1 * 12, s"super-linear TTL state growth: $s1 -> $s10")
    assert(r1 <= 2 && r10 <= 2,
      s"TTL timeout did not reap state: $r1 / $r10 rows left")

    // ---------------- UpsertStream store growth ----------------
    // 20 updates/key; store rows must equal DISTINCT keys at 1k and
    // 10k (upsert state ∝ key cardinality, not records seen)
    def upsertStoreRows(keys: Int): Long = {
      val in = MemoryStream[(String, Long, Long)]
      val df = in.toDS().toDF("k", "cmp", "v")
      val q = graft.streaming.UpsertStream.start(spark, df,
        keys = Seq("k"), cmpCol = "cmp", tieCols = Seq("v"),
        viewName = s"probe_upsert_$keys")
      (0 until 20).foreach { r =>
        in.addData((0 until keys).map(k => (s"key$k", r.toLong, r.toLong * 10)))
        if (r % 10 == 9) q.processAllAvailable()
      }
      q.processAllAvailable()
      val rows = spark.table(s"probe_upsert_$keys").count()
      q.stop()
      rows
    }
    val u1 = upsertStoreRows(1000)
    val u10 = upsertStoreRows(10000)
    println(s"[probe] upsert store rows: 1k keys=$u1, 10k keys=$u10")
    assert(u1 == 1000 && u10 == 10000,
      s"upsert store != live keys: $u1/$u10")

    spark.stop()
  }
}
