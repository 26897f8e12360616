package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B: JSON_MATCH via per-row string parsing vs the shredded ingest
  * layout (json-index analog) — scan cost and pushdown evidence. */
object JsonShredAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables(spark, sfDir).events
      .select(col("event_type"), col("props"))
    val tmp = java.nio.file.Files.createTempDirectory("jshred_ab").toString
    val shredded = graft.sources.JsonShred.ingestShredded(
      spark, events, s"$tmp/shred", "props", Seq("$.k" -> IntegerType))

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-12s rows=${runs.head._1}%8d best=${runs.map(_._2).min}%.3f s")
    }
    time("stringparse") {
      events.filter(get_json_object(col("props"), "$.k")
        .cast(IntegerType) >= 50).count()
    }
    time("shredded") {
      shredded.filter(graft.sources.JsonShred
        .jsonMatch(shredded, "props", "\"$.k\" >= 50")).count()
    }
    // selective predicate: pruning shows up hardest here
    time("string=99") {
      events.filter(get_json_object(col("props"), "$.k")
        .cast(IntegerType) === 99).count()
    }
    time("shred=99") {
      shredded.filter(graft.sources.JsonShred
        .jsonMatch(shredded, "props", "\"$.k\" = 99")).count()
    }
    spark.stop()
  }
}
