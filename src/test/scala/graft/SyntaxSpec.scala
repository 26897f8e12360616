package graft

import org.apache.spark.sql.functions._
import graft.syntax._

/** The fluent layer must forward faithfully — each call is checked
  * against the operator object it delegates to. */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b c d e f"), (1L, "a b c d e f"), (2L, "x y z w q"),
    (3L, "p q r s t u v")).toDF("doc_id", "text")

  test("fluent ops forward to the operator objects") {
    val deduped = docs.dedupExactKeepFirst("doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted
    assert(deduped.toSeq == Seq(0L, 2L, 3L))

    val chunks = docs.chunkOverlap("doc_id", "text", 4, 2)
    assert(chunks.count() ==
      graft.operators.Curation.chunkOverlap(docs, "doc_id", "text", 4, 2)
        .count())

    val splits = docs.assignSplits("doc_id", 800, 100)
    assert(splits.columns.contains("split") && splits.count() == 4)

    val packed = docs.packFfd("doc_id",
      graft.functions.TextFunctions.tokenCount($"text"), capacity = 10)
    assert(packed.count() == 4)

    val mixed = docs.withColumn("lang", lit("en"))
      .mixByTemperature("doc_id", "lang", alpha = 0.5)
    assert(mixed.count() == 4) // single stratum keeps everything

    val emb = Seq((0L, Seq(1.0f, 0f)), (1L, Seq(0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val nn = emb.annTopK("vec_id", "embedding", Seq(1.0, 0.0), k = 1)
      .select($"vec_id").as[Long].collect()
    assert(nn.toSeq == Seq(0L))
  }

  test("hnswTopK and withRealtimeTail forward faithfully") {
    val rnd = new scala.util.Random(5)
    val emb = (0L until 64L).map(i =>
        (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val probes = emb.filter($"vec_id" < 2)
    val got = emb.hnswTopK("vec_id", "embedding", probes, "vec_id", k = 3)
    assert(got.groupBy($"probe_id").count().collect()
      .forall(_.getLong(1) == 3))

    import org.apache.spark.sql.types.TimestampType
    def mk(rows: Seq[(Long, String)]) = rows.toDF("id", "t")
      .withColumn("t", $"t".cast(TimestampType))
    val off = mk(Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-05 00:00:00")))
    val rt = mk(Seq((2L, "2024-01-05 00:00:00"), (3L, "2024-01-09 00:00:00")))
    val ids = off.withRealtimeTail("t", rt)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
