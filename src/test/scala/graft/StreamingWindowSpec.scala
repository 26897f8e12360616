package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Realtime ingestion shape (SURVEY §2.9): watermarked tumbling-window
  * aggregation over a stream — the streaming counterpart of the
  * TimeSeries range planner (same window() operator). */
class StreamingWindowSpec extends SparkSpec {

  test("watermarked windowed aggregation emits finalized buckets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "tag", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"), $"tag")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .select($"w.start".as("bucket"), $"tag", $"n", $"s")

    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_out").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2024-01-01 00:10:00"), "a", 1.0),
        (t("2024-01-01 00:40:00"), "a", 2.0),
        (t("2024-01-01 01:05:00"), "a", 4.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 00:00 and 01:00 windows
      mem.addData((t("2024-01-01 03:00:00"), "a", 8.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"bucket", $"n", $"s").as[(Timestamp, Long, Double)]
        .collect().sortBy(_._1.getTime)
      assert(rows.length == 2)
      assert(rows(0) == ((t("2024-01-01 00:00:00"), 2L, 3.0)))
      assert(rows(1) == ((t("2024-01-01 01:00:00"), 1L, 4.0)))
    } finally q.stop()
  }
}
