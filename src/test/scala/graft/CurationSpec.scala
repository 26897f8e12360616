package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Train/val/test splits + decontamination (operators/Curation.scala). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is deterministic and stable under corpus growth") {
    val small = spark.range(1000).toDF("id")
    val big = spark.range(5000).toDF("id")
    val a = Curation.assignSplit(small, "id", 900, 50)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = Curation.assignSplit(big, "id", 900, 50)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // rows never migrate when the corpus grows
    a.foreach { case (id, s) => assert(b(id) == s) }
    // weights land near 90/5/5
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 1000.0)
    assert(math.abs(frac("train") - 0.9) < 0.03)
    assert(frac.getOrElse("val", 0.0) > 0.02)
  }

  test("contaminated flags train docs overlapping the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about databases and spark"),
      (3L, "the quick brown fox sat still")).toDF("doc_id", "text")
    val ev = Seq("a quick brown fox jumps over anything" -> 0)
      .toDF("text", "x")
    val hits = Curation.contaminated(train, "doc_id", "text", ev, "text",
        shingleSize = 3, minHits = 2)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "quick brown fox" + "brown fox jumps" (+ more)
    assert(hits.contains(1L))
    assert(!hits.contains(2L))
    // doc 3 shares only "quick brown fox" (1 shingle) — below minHits
    assert(!hits.contains(3L))
  }
}
