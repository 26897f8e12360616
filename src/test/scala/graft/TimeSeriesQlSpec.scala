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

  test("query_range endpoint: Prometheus-shaped matrix over TimeBuckets") {
    import graft.sql.TimeSeriesEndpoint
    // the reference's response contract
    // (PinotBrokerTimeSeriesResponse.java): status/data/resultType,
    // one result entry per series keyed by tag values, __name__ =
    // serialized tags, values = [epochSec, "v"|null] per TIME BUCKET
    val json = TimeSeriesEndpoint.queryRange(_ => metrics, Map(
      "query" -> """fetch{table="m", ts_column="t", ts_unit="SECONDS",
        value="v"} | sum{host}""",
      "start" -> "0", "end" -> "39", "step" -> "10s"))
    assert(json.contains("\"status\":\"success\""), json)
    assert(json.contains("\"resultType\":\"matrix\""))
    // both series present, keyed by their tag values, with the
    // __name__ default (TimeSeries.getTagsSerialized: k=v)
    assert(json.contains("\"__name__\":\"host=a\""))
    assert(json.contains("\"__name__\":\"host=b\""))
    assert(json.contains("\"host\":\"a\"") && json.contains("\"host\":\"b\""))
    // series a: all four buckets valued; series b: bucket 2 (t=20) is
    // a NULL cell, not a missing one — the TimeBuckets contract
    assert(json.contains("""[0,"10.0"],[10,"30.0"],[20,"60.0"],[30,"100.0"]"""),
      json)
    assert(json.contains("""[0,"5.0"],[10,"6.0"],[20,null],[30,"8.0"]"""),
      json)
    // human-readable step strings parse (getStepSeconds analog)
    assert(TimeSeriesEndpoint.stepSeconds("2m") == 120L)
    assert(TimeSeriesEndpoint.stepSeconds("1h") == 3600L)
    assert(TimeSeriesEndpoint.stepSeconds("90") == 90L)
    // missing params fail closed with the reference's messages
    val err = TimeSeriesEndpoint.queryRange(_ => metrics,
      Map("start" -> "0", "end" -> "39", "step" -> "10"))
    assert(err.contains("\"status\":\"error\""))
    assert(err.contains("Query cannot be null"))
    // a series LIMIT caps the result entries (DEFAULT_SERIES_LIMIT role)
    val limited = TimeSeriesEndpoint.queryRange(_ => metrics, Map(
      "query" -> """fetch{table="m", ts_column="t", ts_unit="SECONDS",
        value="v"} | sum{host}""",
      "start" -> "0", "end" -> "39", "step" -> "10", "limit" -> "1"))
    assert(limited.contains("host=a") && !limited.contains("host=b"))
  }
}
