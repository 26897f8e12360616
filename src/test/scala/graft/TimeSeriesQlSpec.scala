package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesQL

/** M3QL pipeline stages: fills, rate/increase/offset, topk/bottomk. */
class TimeSeriesQlSpec extends SparkSpec {

  // one metric, two hosts, 4 buckets of 10s starting at t=0
  private lazy val metrics: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 0L, 10.0), ("a", 10L, 30.0), ("a", 20L, 60.0), ("a", 30L, 100.0),
      ("b", 0L, 5.0), ("b", 10L, 6.0), ("b", 30L, 8.0) // bucket 2 missing
    ).toDF("host", "t", "v")
  }

  private def run(q: String): Map[(String, Long), Option[Double]] =
    TimeSeriesQL.query(_ => metrics, q, 0L, 39L, 10L)
      .collect()
      .map(r => ((r.getString(1), r.getLong(0)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("increase is the delta vs the previous bucket, null first") {
    val got = run("""fetch{table="m", ts_column="t", ts_unit="SECONDS",
      value="v"} | sum{host} | transformNull{0} | increase{}""")
    assert(got(("a", 0L)).isEmpty)
    assert(got(("a", 10L)).contains(20.0))
    assert(got(("a", 30L)).contains(40.0))
    assert(got(("b", 20L)).contains(-6.0)) // missing bucket filled 0
  }

  test("rate divides the increase by the step") {
    val got = run("""fetch{table="m", ts_column="t", ts_unit="SECONDS",
      value="v"} | sum{host} | transformNull{0} | rate{}""")
    assert(got(("a", 10L)).contains(2.0))
    assert(got(("a", 30L)).contains(4.0))
  }

  test("offset shifts the series by whole buckets") {
    val got = run("""fetch{table="m", ts_column="t", ts_unit="SECONDS",
      value="v"} | sum{host} | transformNull{0} | offset{10}""")
    assert(got(("a", 0L)).isEmpty)
    assert(got(("a", 10L)).contains(10.0))
    assert(got(("a", 30L)).contains(60.0))
  }

  test("topk/bottomk keep whole series by range total") {
    val top = run("""fetch{table="m", ts_column="t", ts_unit="SECONDS",
      value="v"} | sum{host} | topk{1}""")
    assert(top.keySet.map(_._1) == Set("a")) // total 200 vs 19
    val bot = run("""fetch{table="m", ts_column="t", ts_unit="SECONDS",
      value="v"} | sum{host} | bottomk{1}""")
    assert(bot.keySet.map(_._1) == Set("b"))
  }
}
