package graft

import org.apache.spark.sql.functions._
import graft.operators.BandJoin

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("absDiffJoin equals brute force, including band boundaries") {
    val l = Seq((1L, 0.0), (2L, 5.0), (3L, 9.99), (4L, -3.2))
      .toDF("lid", "lv")
    val r = Seq((10L, 0.5), (11L, 1.0), (12L, 6.3), (13L, 9.0), (14L, -4.2))
      .toDF("rid", "rv")
    val got = BandJoin.absDiffJoin(l, r, $"lv", $"rv", 1.0)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val want = l.crossJoin(r).filter(abs($"lv" - $"rv") <= 1.0)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    // boundary pair |0.0 - 1.0| == width must be included
    assert(got.contains((1L, 11L)))
    // exactly-one-band-apart pair (-3.2, -4.2) crosses a negative bucket
    assert(got.contains((4L, 14L)))
  }

  test("intervalJoin finds containing intervals across bucket spans") {
    val pts = Seq((1L, 2.5), (2L, 7.0), (3L, 11.0)).toDF("pid", "v")
    val ivs = Seq((100L, 0.0, 3.0), (101L, 2.0, 10.0), (102L, 6.9, 7.0))
      .toDF("iid", "lo", "hi")
    val got = BandJoin.intervalJoin(pts, ivs, $"v", $"lo", $"hi", 2.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (1L, 101L), (2L, 101L), (2L, 102L)))
  }
}
