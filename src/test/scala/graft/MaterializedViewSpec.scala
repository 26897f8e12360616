package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.MaterializedView
import graft.sources.MaterializedView._

/** Incremental MV maintenance: the reference's MaterializedViewTask
  * state machine (APPEND / markStale / OVERWRITE / DELETE, fingerprint
  * staleness, watermark guard, tracked-but-empty deletes) driven
  * end-to-end against a file-backed store. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000L

  private def viewDef = ViewDef("ts", H, Seq("tag"),
    Seq(count(lit(1)).as("cnt"), sum($"v").cast("long").as("sv")))

  private def rows(w: Int, tag: String, n: Int) =
    (0 until n).map(i => (w * 3600L + i, tag, 1L))

  private def toDf(rs: Seq[(Long, String, Long)]) =
    rs.toDF("sec", "tag", "v")
      .select(timestamp_seconds($"sec").as("ts"), $"tag", $"v")

  test("append windows, read equals direct aggregation") {
    val path = Files.createTempDirectory("graft_mv").toString
    val src = toDf(rows(0, "a", 3) ++ rows(0, "b", 2) ++ rows(1, "a", 4))
    val store = new Store(spark, path, viewDef)
    store.append(src, 0L)
    store.append(src, H)
    val got = store.read().groupBy($"tag").agg(sum($"cnt").as("c"), sum($"sv").as("s"))
      .orderBy($"tag").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 7L, 7L), ("b", 2L, 2L)))
    assert(store.state.watermarkMs == 2 * H)
  }

  test("append below the watermark is rejected (reference preProcess guard)") {
    val path = Files.createTempDirectory("graft_mv").toString
    val src = toDf(rows(0, "a", 1) ++ rows(1, "a", 1))
    val store = new Store(spark, path, viewDef)
    store.append(src, H)
    intercept[IllegalArgumentException] { store.append(src, 0L) }
  }

  test("backfill flips VALID -> STALE -> OVERWRITE -> VALID") {
    val path = Files.createTempDirectory("graft_mv").toString
    val v1 = toDf(rows(0, "a", 3))
    val store = new Store(spark, path, viewDef)
    store.append(v1, 0L)
    // source unchanged: no stale flip
    assert(!store.markStaleIfChanged(v1, 0L))
    // backfilled source: detected by fingerprint
    val v2 = toDf(rows(0, "a", 3) ++ rows(0, "b", 5))
    assert(store.markStaleIfChanged(v2, 0L))
    assert(store.state.partitions(0L).state == Stale)
    // overwrite on a non-stale window is rejected
    intercept[IllegalArgumentException] { store.overwrite(v2, H) }
    store.overwrite(v2, 0L)
    assert(store.state.partitions(0L).state == Valid)
    val got = store.read().orderBy($"tag")
      .select($"tag", $"cnt").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 5L)))
  }

  test("retention delete keeps the window tracked as VALID+empty") {
    val path = Files.createTempDirectory("graft_mv").toString
    val v1 = toDf(rows(0, "a", 2))
    val store = new Store(spark, path, viewDef)
    store.append(v1, 0L)
    val gone = toDf(Nil.asInstanceOf[Seq[(Long, String, Long)]])
    assert(store.markStaleIfChanged(gone, 0L))
    store.deleteWindow(gone, 0L)
    val p = store.state.partitions(0L)
    assert(p.state == Valid && p.fingerprint == EmptyFingerprint)
    assert(store.read().count() == 0L)
    // a later backfill into the emptied window re-enters via the
    // normal markStale -> overwrite path (why the entry is kept)
    val back = toDf(rows(0, "c", 6))
    assert(store.markStaleIfChanged(back, 0L))
    store.overwrite(back, 0L)
    assert(store.read().select($"tag", $"cnt").as[(String, Long)]
      .collect().toSeq == Seq(("c", 6L)))
  }

  test("delete with a concurrent backfill leaves the window STALE (commit-time re-check)") {
    val path = Files.createTempDirectory("graft_mv").toString
    val v1 = toDf(rows(0, "a", 2))
    val store = new Store(spark, path, viewDef)
    store.append(v1, 0L)
    store.markStaleIfChanged(toDf(Nil.asInstanceOf[Seq[(Long, String, Long)]]), 0L)
    // backfill lands between dispatch and commit: delete must NOT clear
    val backfilled = toDf(rows(0, "b", 1))
    store.deleteWindow(backfilled, 0L)
    assert(store.state.partitions(0L).state == Stale)
    // old rows still present until the OVERWRITE pass runs
    assert(store.read().count() == 1L)
  }
}
