package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MAP-column per-key index analog — the reference's map index family
  * (`pinot-segment-local/.../segment/index/map/MapKeyIndexReader.java`,
  * `ImmutableMapDataSource.java`): each configured key of a MAP column
  * gets its own per-key forward/inverted index, so a predicate on
  * `mapValue(col, 'k')` is served by the KEY's index instead of
  * walking every row's map.
  *
  * Spark-first shape (the JsonShred pattern): at ingest, DENSE keys
  * are MATERIALIZED as typed top-level columns next to the map
  * (`<mapCol>__<key>` naming), so a `mapValue(col,'k') = v` predicate
  * compiles to a plain column comparison that PUSHES INTO the parquet
  * scan (min/max + dictionary pruning — the per-key-index analog).
  * Un-shredded keys keep the `element_at` fallback (functionally
  * identical, no pushdown), exactly as the reference serves un-indexed
  * keys from the map forward index.
  *
  * At 100 TB the shredded layout is what makes map predicates viable:
  * a key comparison prunes row groups by column statistics instead of
  * deserializing every map — the same reason the reference builds
  * per-key indexes rather than scanning `MapValue` blobs.
  */
object MapShred {

  /** Shredded-column name for a map key: `attrs` + `k` → `attrs__k`. */
  def colNameFor(mapCol: String, key: String): String =
    s"${mapCol}__" + key.replaceAll("[^A-Za-z0-9_]", "_")

  final case class Spec(mapCol: String, keys: Set[String])

  // frame-level registry (canonical scan path → spec), and a SQL-level
  // registry (table/view name → spec) for the facade rewrite
  private val specs =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()
  private val tableSpecs =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  /** Materialize `keys` of `mapCol` as typed top-level columns and
    * write the shredded layout; registers the location so
    * [[mapValue]] targets the columns. Returns the re-read frame. */
  def ingestShredded(
      spark: SparkSession,
      input: DataFrame,
      outPath: String,
      mapCol: String,
      keys: Seq[String],
      partitionBy: Seq[String] = Nil): DataFrame = {
    val shredded = keys.foldLeft(input) { (df, k) =>
      df.withColumn(colNameFor(mapCol, k), element_at(col(mapCol), k))
    }
    val writer = shredded.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(outPath)
    val out = spark.read.parquet(outPath)
    graft.plans.RollupRewrite.pathOf(out).foreach { canonical =>
      specs.put(canonical, Spec(mapCol, keys.toSet))
    }
    out
  }

  def registerTable(table: String, mapCol: String,
      keys: Seq[String]): Unit =
    tableSpecs.put(table.toLowerCase, Spec(mapCol, keys.toSet))

  def clear(): Unit = { specs.clear(); tableSpecs.clear() }

  private[graft] def tableSpec(table: String): Option[Spec] =
    Option(tableSpecs.get(table.toLowerCase))

  private def specFor(df: DataFrame): Option[Spec] =
    graft.plans.RollupRewrite.pathOf(df).flatMap(p => Option(specs.get(p)))

  /** `mapValue(mapCol, key)` over a frame: the shredded column when
    * this scan is registered with the key (pushdown-capable), the
    * `element_at` map probe otherwise. */
  def mapValue(df: DataFrame, mapCol: String, key: String): Column =
    specFor(df) match {
      case Some(s) if s.mapCol == mapCol && s.keys(key) =>
        col(colNameFor(mapCol, key))
      case _ => element_at(col(mapCol), key)
    }
}
