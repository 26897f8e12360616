package graft

import org.apache.spark.sql.functions._

import graft.sources.{IndexStore, RegexpIndex, TextIndex}

/** Durable index artifacts: a fresh process re-registering unchanged
  * data must LOAD (no build job, artifact files untouched); changed
  * data must rebuild; read-only corpus mounts route artifacts to the
  * index root instead of table-adjacent `_indexes/`. */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  /** Recursive (path, len, mtime) snapshot of a local dir. */
  private def snapshot(dir: String): Set[(String, Long, Long)] = {
    val root = java.nio.file.Paths.get(
      new java.net.URI(dir).getPath match {
        case null => dir
        case p => p
      })
    if (!java.nio.file.Files.exists(root)) Set.empty
    else {
      val out = scala.collection.mutable.Set[(String, Long, Long)]()
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out += ((p.toString, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
      }
      out.toSet
    }
  }

  private def freshTable(rows: Seq[(Long, String)]): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_ixstore_tab").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(d)
    d
  }

  test("text index persists table-adjacent and reloads with no build") {
    val tab = freshTable(Seq((1L, "alpha bravo"), (2L, "bravo charlie"),
      (3L, "delta echo")))
    val corpus = spark.read.parquet(tab)
    graft.operators.IndexCache.clear()
    val b0 = IndexStore.builds.get()
    TextIndex.register("ixs_docs", corpus, "doc_id", "text", nBuckets = 2)
    assert(IndexStore.builds.get() == b0 + 1, "first register must build")
    // the artifact lives under <table>/_indexes/<family>/<column>/
    // <variant>/ (variant = plan+params hash so distinct corpora over
    // one table path never clobber each other)
    val colDir = java.nio.file.Paths.get(s"$tab/_indexes/text/text")
    val variants = java.nio.file.Files.list(colDir).iterator()
    assert(variants.hasNext, "expected a variant dir under _indexes")
    val adjacent = variants.next().toString
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(adjacent, "_manifest.json")),
      "artifact must live under <table>/_indexes with a manifest")
    // the _indexes dir must stay invisible to the table's own reader
    assert(spark.read.parquet(tab).count() == 3)
    val snap = snapshot(adjacent)

    // ---- simulated fresh process: all JVM memos cleared ----
    graft.operators.IndexCache.clear()
    TextIndex.clear()
    val l0 = IndexStore.loads.get()
    TextIndex.register("ixs_docs", corpus, "doc_id", "text", nBuckets = 2)
    assert(IndexStore.loads.get() == l0 + 1 &&
      IndexStore.builds.get() == b0 + 1,
      "re-register over unchanged data must load, not rebuild")
    assert(snapshot(adjacent) == snap,
      "reload must not touch artifact files (no write job)")
    // ... and the loaded index actually serves
    val m = TextIndex.lookup("ixs_docs", "text").get.model
    assert(m.dict.filter(col("token") === "bravo").head.getLong(1) == 2L)

    // ---- data change: fingerprint miss, rebuild ----
    Seq((1L, "alpha bravo"), (2L, "bravo charlie"), (3L, "delta echo"),
      (4L, "bravo foxtrot")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(tab)
    graft.operators.IndexCache.clear()
    TextIndex.clear()
    val corpus2 = spark.read.parquet(tab)
    TextIndex.register("ixs_docs", corpus2, "doc_id", "text", nBuckets = 2)
    assert(IndexStore.builds.get() == b0 + 2,
      "changed data must rebuild")
    val m2 = TextIndex.lookup("ixs_docs", "text").get.model
    assert(m2.dict.filter(col("token") === "bravo").head.getLong(1) == 3L)
    TextIndex.clear()
  }

  test("regexp dictionary reloads with no build and serves the rewrite") {
    val tab = freshTable(Seq((1L, "red"), (2L, "green"), (3L, "blue")))
    val corpus = spark.read.parquet(tab)
    graft.operators.IndexCache.clear()
    val b0 = IndexStore.builds.get()
    RegexpIndex.register("ixs_colors", corpus, "text")
    assert(IndexStore.builds.get() == b0 + 1)
    // fresh process
    graft.operators.IndexCache.clear()
    RegexpIndex.clear()
    RegexpIndex.register("ixs_colors", corpus, "text")
    assert(IndexStore.builds.get() == b0 + 1, "reload must not rebuild")
    corpus.createOrReplaceTempView("ixs_colors")
    val served = graft.sql.QueryFacade.sql(spark,
      "SET explicitLimit = true; SELECT doc_id FROM ixs_colors " +
        "WHERE REGEXP_LIKE(text, '^(red|blue)$') ORDER BY doc_id")
    assert(served.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    RegexpIndex.clear()
  }

  test("read-only corpus mounts route artifacts to the index root (still durable)") {
    val t = Tables(spark, sf)
    graft.operators.IndexCache.clear()
    val b0 = IndexStore.builds.get()
    val located = IndexStore.getOrBuild(t.documents.select(
      col("doc_id"), col("text")), "spec_probe", "text",
      Seq("v1")) { d =>
      Seq((1L, "x")).toDF("a", "b").write.mode("overwrite")
        .parquet(s"$d/payload")
    }
    assert(located.isDefined)
    val dir = located.get.dir
    assert(!dir.contains("/root/testdata"),
      s"must not write into the read-only corpus mount: $dir")
    assert(located.get.rebuilt || IndexStore.builds.get() == b0)
    // second call (any process with the same root): pure load
    val again = IndexStore.getOrBuild(t.documents.select(
      col("doc_id"), col("text")), "spec_probe", "text",
      Seq("v1")) { d => fail(s"unexpected rebuild into $d") }
    assert(again.exists(!_.rebuilt))
  }

  test("fingerprint-less corpora keep the temp-dir behavior") {
    val mem = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    assert(IndexStore.fingerprint(mem, Seq("v1")).isEmpty,
      "in-memory frames have no file fingerprint")
    graft.operators.IndexCache.clear()
    TextIndex.register("ixs_mem", mem, "doc_id", "text", nBuckets = 2)
    val m = TextIndex.lookup("ixs_mem", "text").get.model
    assert(m.dict.count() == 2)
    TextIndex.clear()
  }

  test("rollup artifact reloads across a simulated process restart (used_rollup stays green)") {
    def run() = SparkEntry.queries("q_rollup_tdigest")(spark, sf)
      .collect()
    val r1 = run()
    assert(r1.nonEmpty && r1.forall(_.getAs[Boolean]("used_rollup")))
    val b0 = IndexStore.builds.get()
    // fresh process: JVM memo + registered specs gone, artifact stays
    graft.operators.IndexCache.clear()
    graft.plans.RollupRewrite.clear()
    val r2 = run()
    assert(r2.nonEmpty && r2.forall(_.getAs[Boolean]("used_rollup")),
      "reloaded rollup must still serve the rewrite")
    assert(IndexStore.builds.get() == b0,
      "restart over unchanged data must not rebuild the rollup")
    assert(r1.map(_.toSeq.toList).toList == r2.map(_.toSeq.toList).toList)
  }

  test("hnsw blobs reload byte-exact with no build") {
    val tab = java.nio.file.Files
      .createTempDirectory("graft_ixstore_vec").toString
    val rnd = new scala.util.Random(7)
    (0L until 64L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(tab)
    val corpus = spark.read.parquet(tab)
    graft.operators.IndexCache.clear()
    val b0 = IndexStore.builds.get()
    val m1 = graft.operators.HnswIndex.build(corpus, "vec_id",
      "embedding", nShards = 2)
    assert(IndexStore.builds.get() == b0 + 1)
    val blobs1 = m1.shards.orderBy(col("shard")).collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq))
    graft.operators.IndexCache.clear()
    val m2 = graft.operators.HnswIndex.build(corpus, "vec_id",
      "embedding", nShards = 2)
    assert(IndexStore.builds.get() == b0 + 1, "reload must not rebuild")
    val blobs2 = m2.shards.orderBy(col("shard")).collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq))
    assert(blobs1.toSeq == blobs2.toSeq, "persisted graphs must be byte-exact")
  }

  test("concurrent first builds commit atomically (tmp + rename)") {
    val tab = freshTable(Seq((1L, "alpha"), (2L, "bravo")))
    val corpus = spark.read.parquet(tab)
    // two writers race the same (family, column, params): each builds
    // into its own temp sibling; one rename wins, the loser discards
    // its temp and the final dir is ONE writer's complete artifact —
    // never an interleaving of both
    // store paths carry the `file:` scheme (scan-root strings) — strip
    // it for java.nio access, as snapshot() does
    def local(d: String): java.nio.file.Path =
      java.nio.file.Paths.get(Option(new java.net.URI(d).getPath).getOrElse(d))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def racer(tag: String): IndexStore.Located = {
      barrier.await()
      IndexStore.getOrBuild(corpus, "racefam", "text", Seq("p1")) { d =>
        val p = local(d)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve("part-0"), tag)
        Thread.sleep(50) // widen the overlap window
        java.nio.file.Files.writeString(p.resolve("part-1"), tag)
      }.get
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (l1, l2) = (Future(racer("w1")), Future(racer("w2")))
    val (a, b) = (Await.result(l1, 60.seconds), Await.result(l2, 60.seconds))
    assert(a.dir == b.dir)
    val dir = local(a.dir)
    assert(java.nio.file.Files.exists(dir.resolve("_manifest.json")),
      "committed artifact must carry a manifest")
    val p0 = java.nio.file.Files.readString(dir.resolve("part-0"))
    val p1 = java.nio.file.Files.readString(dir.resolve("part-1"))
    assert(p0 == p1, s"artifact mixes two writers: $p0 vs $p1")
    // no abandoned temp dirs next to the committed artifact
    val parent = dir.getParent
    val leftovers = java.nio.file.Files.list(parent).iterator()
    val names = scala.collection.mutable.Buffer[String]()
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(!names.exists(_.contains(".build-")),
      s"temp build dirs left behind: $names")
    // a third registration (fingerprint unchanged) loads, no rebuild
    val b0 = IndexStore.builds.get()
    val c = IndexStore.getOrBuild(corpus, "racefam", "text", Seq("p1")) {
      _ => fail("third call must load, not rebuild")
    }.get
    assert(!c.rebuilt && IndexStore.builds.get() == b0)
  }
}
