package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Media near-dup scaling probe: the registered q_image/audio/video
  * neardup queries run on FIXED inline corpora (200 blobs), so the dir
  * replicas can't scale them — this probe regenerates each corpus at
  * 1× and 10× and times decode→fingerprint→banded-pair wall. The
  * decode+fingerprint stage is map-only (must scale ~linearly on
  * fixed cores); the pair stage is the pigeonhole-banded hamming join
  * whose candidate growth is the thing under test.
  * Run: sbt 'Test/runMain graft.MediaScaleProbe'
  */
object MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def imagesDf(n: Int) = spark.range(n)
      .select(col("id"),
        lit(null).cast("binary").as("__placeholder")).as[(Long, Array[Byte])]
      .map { case (i, _) => (i, Multimodal.patternBmp((i / 5).toInt, (i % 5).toInt * 8)) }
      .toDF("img_id", "content")

    def wavsDf(n: Int) = spark.range(n)
      .select(col("id"), lit(null).cast("binary").as("__p")).as[(Long, Array[Byte])]
      .map { case (i, _) =>
        (i, Multimodal.patternWav((i / 5).toInt, (i % 5).toInt + 1))
      }.toDF("clip_id", "content")

    def time(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-28s $s%8.2f s  ($rows rows)")
      s
    }

    def probeImages(n: Int): Double = time(s"image dHash+pairs n=$n") {
      val h = Multimodal.imageDHash(imagesDf(n), "img_id")
      Dedup.fingerprintPairs(h, "id", "dhash", maxDist = 3).count()
    }
    def probeAudio(n: Int): Double = time(s"audio fp+pairs n=$n") {
      val fps = Multimodal.audioFingerprints(wavsDf(n), "clip_id")
      Dedup.fingerprintPairs(fps, "id", "afp", maxDist = 3).count()
    }

    // warm
    probeImages(200)
    probeAudio(200)
    println("image:")
    val i1 = probeImages(200)
    val i10 = probeImages(2000)
    val i100 = probeImages(20000)
    println(f"  ratio at 10x: ${i10 / i1}%5.1f   at 100x: ${i100 / i1}%5.1f")
    println("audio:")
    val a1 = probeAudio(200)
    val a10 = probeAudio(2000)
    val a100 = probeAudio(20000)
    println(f"  ratio at 10x: ${a10 / a1}%5.1f   at 100x: ${a100 / a1}%5.1f")
    spark.stop()
  }
}
