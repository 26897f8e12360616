package graft

import org.apache.spark.sql.functions._
import graft.functions.DateTimeAlgos

/** The TimePredicateFilterOptimizer analog: dateTrunc-vs-literal
  * comparisons must rewrite to raw-column ranges — provably equivalent
  * (including NULL propagation and NOT contexts), gone from the
  * optimized plan, and pushed into the parquet scan. */
class TimePredicateRewriteSpec extends SparkSpec {
  import spark.implicits._

  // epoch millis around unit boundaries (± jitter), spanning DST-free
  // UTC calendar edges: month lengths, leap year, week starts
  private lazy val samples: Seq[Long] = {
    val bases = Seq(
      0L, 1696118400000L /* 2023-10-01 */, 1704067200000L /* 2024-01-01 */,
      1709164800000L /* 2024-02-29 */, 1735689600000L /* 2025-01-01 */,
      86400000L * 3 + 12345L)
    val jitter = Seq(-86400000L, -3600000L, -1L, 0L, 1L, 59999L,
      3600000L, 86399999L, 86400000L * 17 + 7L)
    for (b <- bases; j <- jitter) yield b + j
  }

  private lazy val tdir = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_timepred").toString
    samples.zipWithIndex.toDF("ms", "i")
      .withColumn("ms", when($"i" % 13 === 0, lit(null)).otherwise($"ms"))
      .withColumn("ts", timestamp_micros($"ms" * 1000)
        .cast(org.apache.spark.sql.types.TimestampNTZType))
      .write.mode("overwrite").parquet(d)
    d
  }

  private def expected(unit: String, op: String, v: Long): Set[Long] = {
    val idx = samples.indices.filterNot(_ % 13 == 0)
    idx.filter { i =>
      val t = DateTimeAlgos.dateTruncEpoch(unit, samples(i), "UTC")
      op match {
        case "=" => t == v
        case ">" => t > v
        case ">=" => t >= v
        case "<" => t < v
        case "<=" => t <= v
      }
    }.map(samples(_)).toSet
  }

  test("dateTrunc comparisons rewrite to equivalent raw ranges (all ops, units, alignments)") {
    val df = spark.read.parquet(tdir)
    df.createOrReplaceTempView("timepred_t")
    val units = Seq("hour", "day", "week", "month", "quarter", "year")
    for (unit <- units; op <- Seq("=", ">", ">=", "<", "<=");
         v <- Seq(1704067200000L,            // aligned for all units
           DateTimeAlgos.dateTruncEpoch(unit, 1709250845123L, "UTC"),
           1709250845123L)) {                // unaligned
      val q = spark.sql(
        s"SELECT ms FROM timepred_t WHERE datetrunc('$unit', ms) $op ${v}L")
      val got = q.collect().map(_.getLong(0)).toSet
      assert(got == expected(unit, op, v), s"$unit $op $v")
      // the truncation must be GONE from the optimized filter
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.toLowerCase.contains("datetrunc"),
        s"$unit $op $v still evaluates dateTrunc:\n$opt")
    }
  }

  test("NULL propagation survives NOT around an unaligned equality") {
    val df = spark.read.parquet(tdir)
    df.createOrReplaceTempView("timepred_t")
    // dateTrunc = unaligned-literal is never true; NOT of it is TRUE for
    // non-null ms and NULL (row dropped) for null ms — an FALSE-constant
    // rewrite would wrongly keep every row
    val n = spark.sql("SELECT count(*) AS n FROM timepred_t" +
      " WHERE NOT (datetrunc('day', ms) = 123L)").head.getLong(0)
    val nonNull = samples.indices.count(_ % 13 != 0)
    assert(n == nonNull)
  }

  test("rewritten ranges push into the parquet scan (long and NTZ columns)") {
    val df = spark.read.parquet(tdir)
    df.createOrReplaceTempView("timepred_t")
    def pushed(sql: String): String =
      spark.sql(sql).queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("PushedFilters")).mkString
    val longPush = pushed("SELECT * FROM timepred_t" +
      " WHERE datetrunc('day', ms) = 1704067200000L")
    assert(longPush.contains("ms"), s"long range not pushed: $longPush")
    // NTZ: datetrunc routes through UnixMillis(Cast(ntz, TS, UTC)); the
    // rule unwraps to NTZ literals on the raw column
    val ntzPush = pushed("SELECT * FROM timepred_t" +
      " WHERE datetrunc('day', ts) >= 1704067200000L")
    assert(ntzPush.contains("ts"), s"ntz range not pushed: $ntzPush")
  }

  test("IN-list of boundaries rewrites to a union of ranges") {
    val df = spark.read.parquet(tdir)
    df.createOrReplaceTempView("timepred_t")
    val q = spark.sql("SELECT ms FROM timepred_t" +
      " WHERE datetrunc('day', ms) IN (1704067200000L, 1709164800000L, 5L)")
    val got = q.collect().map(_.getLong(0)).toSet
    val want = expected("day", "=", 1704067200000L) ++
      expected("day", "=", 1709164800000L)
    assert(got == want)
    assert(!q.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("datetrunc"))
  }

  test("non-unit input scalings divide through the bounds (epoch-seconds column)") {
    import spark.implicits._
    // epoch-SECONDS column with MILLISECONDS output: the truncation's
    // child is the raw value x1000; the rewrite must divide the millis
    // bounds back through with ceiling division and land the range on
    // the RAW seconds column (pre-epoch negatives included). The
    // 3-arg form (output back in input units) wraps the truncation in
    // a divide and intentionally stays un-rewritten -- asserted below.
    val secs = (samples.map(_ / 1000) ++
      Seq(-1L, -86401L, -86400L, 0L, 1L)).distinct
    val sdf = secs.toDF("s")
    sdf.createOrReplaceTempView("timepred_s")
    for (unit <- Seq("hour", "day", "month");
         op <- Seq("=", ">", ">=", "<", "<=");
         v <- Seq(1704067200000L, 1709250845123L, -86400000L)) {
      val stmt = s"SELECT s FROM timepred_s WHERE" +
        s" datetrunc('$unit', s, 'SECONDS', 'UTC', 'MILLISECONDS') $op ${v}L"
      val q = spark.sql(stmt)
      val got = q.collect().map(_.getLong(0)).toSet
      val want = secs.filter { sv =>
        val t = DateTimeAlgos.dateTruncEpoch(unit, sv * 1000L, "UTC")
        op match {
          case "=" => t == v
          case ">" => t > v
          case ">=" => t >= v
          case "<" => t < v
          case "<=" => t <= v
        }
      }.toSet
      assert(got == want, s"$unit $op $v")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.toLowerCase.contains("datetrunc"),
        s"$unit $op $v still evaluates dateTrunc:\n$opt")
      assert(!opt.contains("* 1000"),
        s"$unit $op $v kept the x1000 scaling:\n$opt")
    }
    // the 3-arg form compares in INPUT units (millis-trunc divided
    // back); results must stay correct via plain evaluation
    val q3 = spark.sql("SELECT s FROM timepred_s WHERE" +
      " datetrunc('day', s, 'SECONDS') = 1704067200L")
    val want3 = secs.filter(sv =>
      DateTimeAlgos.dateTruncEpoch("day", sv * 1000L, "UTC") / 1000L ==
        1704067200L).toSet
    assert(q3.collect().map(_.getLong(0)).toSet == want3)
  }
}
