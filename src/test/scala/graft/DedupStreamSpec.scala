package graft

import org.apache.spark.sql.functions._
import graft.streaming.DedupStream
import graft.operators.Dedup

/** Streaming content dedup: within-batch and cross-batch exact/near-dup
  * rejection, restart idempotence, and the no-two-near-dups invariant
  * over the final store. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank"
  private def doc(suffix: String) = s"$base $suffix $suffix $suffix"

  test("batch step: exact + near dups rejected within and across batches") {
    val b1 = Seq(
      (1L, doc("alpha beta gamma delta epsilon")),
      (2L, doc("alpha beta gamma delta epsilon")), // exact dup of 1
      (3L, doc("alpha beta gamma delta zeta")),    // near dup of 1
      (4L, "completely different content about columnar query engines and vectorized execution pipelines running on large clusters")
    ).toDF("doc_id", "text")
    val s1 = DedupStream.dedupBatch(None, b1, "doc_id", "text",
      DedupStream.Config(threshold = 0.7))
    val ids1 = s1.select("doc_id").as[Long].collect().toSet
    assert(ids1.contains(1L) && !ids1.contains(2L) && ids1.contains(4L))
    assert(!ids1.contains(3L), "near-dup within batch must be clustered out")

    val b2 = Seq(
      (10L, doc("alpha beta gamma delta epsilon")), // exact dup of accepted 1
      (11L, doc("alpha beta gamma delta eta")),     // near dup of accepted 1
      (12L, "fresh unrelated text describing streaming checkpoints atomic renames and idempotent merge commits in detail")
    ).toDF("doc_id", "text")
    val s2 = DedupStream.dedupBatch(Some(s1), b2, "doc_id", "text",
      DedupStream.Config(threshold = 0.7))
    val ids2 = s2.select("doc_id").as[Long].collect().toSet
    assert(ids2 == ids1 + 12L,
      s"expected only 12 accepted from batch 2, got ${ids2 -- ids1}")

    // idempotence: replaying batch 2 is a fixpoint
    val s3 = DedupStream.dedupBatch(Some(s2), b2, "doc_id", "text",
      DedupStream.Config(threshold = 0.7))
    assert(s3.select("doc_id").as[Long].collect().toSet == ids2)
  }

  test("durable stream survives restart; store has no near-dup pair left") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_dstream").toString
    val inDir = s"$root/in"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = "doc_id LONG, text STRING"
    def startQ() = DedupStream.startDurable(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(inDir),
      "doc_id", "text", store, ckpt, DedupStream.Config(threshold = 0.7))

    def jline(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text"}"""
    Files.writeString(Paths.get(s"$inDir/f1.json"),
      Seq(jline(1, doc("one two three four five")),
        jline(2, doc("one two three four five")),
        jline(3, "unrelated corpus text about parquet row groups statistics pruning and sorted layout within partitions")).mkString("\n"))
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()

    Files.writeString(Paths.get(s"$inDir/f2.json"),
      Seq(jline(10, doc("one two three four six")), // near dup of 1
        jline(11, "second unrelated document mentioning broadcast joins shuffle partitions and adaptive query execution at scale")).mkString("\n"))
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()

    val ids = spark.read.parquet(store).select("doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(1L, 3L, 11L), s"got $ids")

    // restart with nothing new: fixpoint
    val q3 = startQ(); q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(store).select("doc_id").as[Long]
      .collect().toSet == ids)

    // invariant: the accepted set contains no near-dup pair at the
    // operating threshold (re-check with the batch pair finder over the
    // original texts of accepted ids)
    val texts = Seq(
      (1L, doc("one two three four five")),
      (3L, "unrelated corpus text about parquet row groups statistics pruning and sorted layout within partitions"),
      (11L, "second unrelated document mentioning broadcast joins shuffle partitions and adaptive query execution at scale"))
      .toDF("doc_id", "text")
    val leftover = Dedup.minhashLsh(texts, "doc_id", "text", 0.7).count()
    assert(leftover == 0L)
  }
}
