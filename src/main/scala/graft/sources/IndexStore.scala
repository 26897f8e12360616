package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Durable, reloadable index-artifact store — the segment-adjacent
  * index directory of the reference, re-expressed for a lake layout.
  *
  * The reference persists every index INSIDE the segment at ingest
  * (`pinot-segment-local/.../segment/creator/impl/vector/
  * HnswVectorIndexCreator.java`, `.../index/fst/FstIndexType.java`,
  * `.../startree/v2/builder/...`) and only ever READS at query time —
  * a fresh server process never rebuilds. The Spark analog: each
  * index family writes its artifact parquet/blobs under a durable
  * directory keyed to the corpus table, with a MANIFEST recording a
  * corpus fingerprint; registration (TableConfig.applyIndexes or the
  * family's `register`) loads the artifact with NO build job when the
  * fingerprint still matches, and rebuilds (ingest semantics) when
  * the data changed.
  *
  * Layout: `<table>/_indexes/<family>/<column>/` when the table
  * directory accepts writes — the underscore prefix keeps Spark's
  * parquet reader blind to it (default PathFilter hides `_`/`.`
  * entries), exactly like `_SUCCESS`/`_metadata`. Tables on
  * read-only storage fall back to
  * `<spark.graft.indexes.root>/<tableKey>/<family>/<column>` (same
  * manifest discipline, still durable across processes).
  *
  * FINGERPRINT: SHA-256 over (layout version, build params, the
  * corpus plan's canonicalized shape, and every underlying scan's
  * file listing `(path, length, mtime)`). Any data or transform
  * change misses the manifest and rebuilds — a false mismatch costs a
  * rebuild, never a wrong answer. Artifacts write before the
  * manifest, so a crashed build leaves a manifest-less directory the
  * next registration rebuilds over (single-writer discipline per
  * table, the reference's segment-build contract).
  */
object IndexStore {

  /** Root for non-adjacent artifacts (read-only table storage). */
  val RootConf = "spark.graft.indexes.root"
  /** Comma-separated path prefixes that must NEVER take adjacent
    * writes even when technically writable (e.g. a shared read-only
    * corpus mount this process could — but must not — write to). */
  val AdjacentExcludeConf = "spark.graft.indexes.adjacent.exclude"
  private val DefaultExclude = "/root/testdata,/root/reference"

  final case class Located(dir: String, rebuilt: Boolean)

  /** Test/ops visibility: how many getOrBuild calls RAN the build vs
    * loaded an existing artifact (the cold-start serving gate asserts
    * loads-without-build on a fresh process). */
  val builds = new java.util.concurrent.atomic.AtomicLong()
  val loads = new java.util.concurrent.atomic.AtomicLong()

  private def sha(parts: Iterator[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach { p =>
      val b = p.getBytes(StandardCharsets.UTF_8)
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Every parquet/file scan root under the plan (a join fingerprints
    * BOTH sides; first one anchors directory placement). */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten

  private def hiddenFree(p: Path): Boolean = {
    var cur = p
    while (cur != null) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) return false
      cur = cur.getParent
    }
    true
  }

  /** `(path, len, mtime)` listing of a scan root, hidden entries
    * (`_indexes`, `_SUCCESS`, …) excluded so artifact writes cannot
    * invalidate their own corpus. */
  private def listing(fs: FileSystem, root: Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val st = fs.getFileStatus(root)
    if (st.isFile) out += s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
    else {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val s = it.next()
        val rel = new Path(s.getPath.toUri.getPath
          .stripPrefix(root.toUri.getPath))
        if (hiddenFree(rel))
          out += s"${s.getPath}|${s.getLen}|${s.getModificationTime}"
      }
    }
    out.toSeq
  }

  /** Corpus fingerprint, None when the plan has no file scan (derived
    * or in-memory frames keep the JVM-lifetime temp-dir behavior). */
  def fingerprint(corpus: DataFrame, params: Seq[Any]): Option[String] = {
    val roots = scanRoots(corpus)
    if (roots.isEmpty) None
    else try {
      val conf = corpus.sparkSession.sessionState.newHadoopConf()
      val files = roots.sorted.flatMap { r =>
        val p = new Path(r)
        listing(p.getFileSystem(conf), p)
      }
      Some(sha(Iterator("graft-index-v1") ++
        params.iterator.map(String.valueOf) ++
        Iterator(corpus.queryExecution.analyzed.canonicalized.toString) ++
        files.sorted.iterator))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def indexRoot(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption(RootConf).getOrElse(
      sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_indexes")

  private def excluded(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Boolean = {
    val local = new Path(tablePath).toUri.getPath
    spark.conf.getOption(AdjacentExcludeConf).getOrElse(DefaultExclude)
      .split(",").map(_.trim).filter(_.nonEmpty)
      .exists(pre => local.startsWith(pre))
  }

  /** Durable artifact directory for (table, family, column, variant):
    * table-adjacent `_indexes/` when allowed and writable, else under
    * the index root keyed by the table path's hash (stable across
    * processes — the point of the exercise). `variant` disambiguates
    * DIFFERENT corpora over the same table path (e.g. a plain scan vs
    * a union, or different build params) — without it the second
    * registration's overwrite would clobber the first's files under
    * the feet of its already-handed-out DataFrames. */
  def dirFor(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      family: String, column: String, variant: String = ""): String = {
    val leaf = if (variant.isEmpty) column else s"$column/$variant"
    val adjacent = s"${tablePath.stripSuffix("/")}/_indexes/$family/$leaf"
    if (!excluded(spark, tablePath)) {
      try {
        val p = new Path(adjacent)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.mkdirs(p)
        if (fs.exists(p)) return adjacent
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val key = sha(Iterator(new Path(tablePath).toUri.toString)).take(16)
    s"${indexRoot(spark)}/$key/$family/$leaf"
  }

  private def manifestPath(dir: String) = new Path(dir, "_manifest.json")

  private def readManifest(fs: FileSystem, dir: String): Option[String] =
    try {
      val mp = manifestPath(dir)
      if (!fs.exists(mp)) None
      else {
        val in = fs.open(mp)
        val bytes = try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
        val js = new String(bytes, StandardCharsets.UTF_8)
        val m = """"fingerprint"\s*:\s*"([0-9a-f]+)"""".r
        m.findFirstMatchIn(js).map(_.group(1))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def writeManifest(fs: FileSystem, dir: String, fp: String,
      family: String, column: String, params: Seq[Any]): Unit = {
    val js =
      s"""{"fingerprint":"$fp","family":"$family","column":"$column",
         |"params":${params.map(p => "\"" + String.valueOf(p)
            .replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
            .mkString("[", ",", "]")},
         |"builtAtMs":${System.currentTimeMillis()}}""".stripMargin
    val out = fs.create(manifestPath(dir), true)
    try out.write(js.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Load-or-build a durable artifact for `corpus`. `build(dir)`
    * writes the artifact under `dir`; the manifest commits it. Returns
    * None when the corpus has no stable file-scan fingerprint — the
    * caller keeps its JVM-lifetime temp-dir behavior. */
  def getOrBuild(corpus: DataFrame, family: String, column: String,
      params: Seq[Any])(build: String => Unit): Option[Located] = {
    val spark = corpus.sparkSession
    for {
      fp <- fingerprint(corpus, params)
      tablePath <- scanRoots(corpus).headOption
    } yield {
      // variant = plan shape + params (NOT the file listing): the same
      // logical corpus re-registered in any process lands on the same
      // directory, while a different corpus over the same table path
      // gets its own — in-place data changes still rebuild in place
      // via the manifest fingerprint
      val variant = sha(params.iterator.map(String.valueOf) ++ Iterator(
        corpus.queryExecution.analyzed.canonicalized.toString)).take(12)
      val dir = dirFor(spark, tablePath, family, column, variant)
      val fs = new Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (readManifest(fs, dir).contains(fp)) {
        loads.incrementAndGet()
        Located(dir, rebuilt = false)
      } else {
        // build into a TEMP sibling and commit by rename, so two
        // processes racing a first build can never interleave partial
        // artifacts under the final directory: whichever rename lands
        // first wins, the loser discards its temp and loads the
        // winner's manifest (same fingerprint ⇒ same artifact).
        builds.incrementAndGet()
        val tmp = new Path(dir + ".build-" +
          java.util.UUID.randomUUID().toString.take(8))
        build(tmp.toString)
        writeManifest(fs, tmp.toString, fp, family, column, params)
        val dst = new Path(dir)
        if (readManifest(fs, dir).contains(fp)) {
          // a racing writer committed the identical artifact while we
          // built — theirs is live, ours is redundant
          fs.delete(tmp, true)
        } else {
          if (fs.exists(dst)) fs.delete(dst, true) // stale artifact
          fs.mkdirs(dst.getParent)
          if (!fs.rename(tmp, dst)) {
            // rename lost the race window after our delete: accept the
            // winner if it carries our fingerprint, else surface it
            if (readManifest(fs, dir).contains(fp)) fs.delete(tmp, true)
            else throw new java.io.IOException(
              s"index artifact commit failed: $tmp -> $dir")
          }
        }
        Located(dir, rebuilt = true)
      }
    }
  }
}
