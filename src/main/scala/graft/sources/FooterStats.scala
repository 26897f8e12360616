package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Metadata-only aggregation: answer unfiltered COUNT(*)/COUNT(col)/
  * MIN/MAX from parquet FOOTER statistics instead of scanning data.
  *
  * The reference serves these from segment metadata — no posting scan,
  * no forward-index read
  * (`pinot-core/.../operator/query/NonScanBasedAggregationOperator
  * .java`: min/max/count from `DataSourceMetadata`/dictionary;
  * `FastFilteredCountOperator.java` for the count path). At 100 TB the
  * difference is reading kilobytes of footers vs terabytes of data.
  *
  * Spark-first re-expression: a one-off distributed job reads every
  * file's footer (row count + per-chunk min/max/null statistics) into
  * a ROW-GROUP STATISTICS TABLE — one local row per row group, the
  * rollup-table convention (`cnt`, `min_c`, `max_c`, `nulls_c`) — and
  * registers it as a ZERO-DIMENSION [[graft.plans.RollupRewrite.Spec]].
  * The existing rollup rule then rewrites qualifying plans: no dims
  * means only UNGROUPED, UNFILTERED aggregates match (the same guard
  * the reference applies — any predicate forces the scan), and
  * COUNT(*) → SUM(cnt), MIN(c) → MIN(min_c), MAX(c) → MAX(max_c),
  * COUNT(c) → SUM(cnt) − SUM(nulls_c) re-aggregate over the
  * kilobyte-sized local table.
  *
  * TRUST RULES — a column is served only when every chunk's statistics
  * are usable, else it silently keeps the scan:
  *   - chunk has min/max (`hasNonNullValue`), or is provably all-null
  *     (`numNulls == rowCount`) so the chunk contributes no value;
  *     parquet-mr OMITS binary stats larger than its size bound rather
  *     than truncating, so an absent min/max refuses the column instead
  *     of under-reporting it;
  *   - float/double chunks whose recorded min/max is NaN are refused
  *     (parquet writers order NaN inconsistently — the same caveat
  *     Spark's own DSv2 parquet aggregate pushdown carries);
  *   - only atomic Int/Long/Float/Double/String columns are harvested
  *     for min/max; COUNT(col) needs just `isNumNullsSet`, so it is
  *     served for any column whose chunks all record null counts.
  */
object FooterStats {

  private def minMaxType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | StringType => true
    case _ => false
  }

  /** Per-column harvest of one row group: (min, max, nulls, trusted). */
  private final case class ChunkStats(min: Option[Any], max: Option[Any],
      nulls: Option[Long], trusted: Boolean)
  private final case class GroupStats(rows: Long,
      cols: Map[String, ChunkStats])

  private def convert(v: Any): Any = v match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case other => other
  }

  private def isNaN(v: Option[Any]): Boolean = v.exists {
    case d: java.lang.Double => d.isNaN
    case f: java.lang.Float => f.isNaN
    case _ => false
  }

  /** Hadoop Configuration is not Serializable; ship it to executors
    * via the same writeObject trick Spark's own (package-private)
    * SerializableConfiguration uses. */
  private final class ConfBox(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Distributed footer read — the only cluster work, proportional to
    * FILE COUNT, not data size. Footers open with the SESSION's
    * Hadoop configuration (credentials, custom filesystems), not a
    * bare `new Configuration()` — a table on S3A must not fail the
    * footer job while the scan path works. */
  private def harvest(spark: SparkSession, files: Seq[String],
      wanted: Set[String]): Seq[GroupStats] = {
    val confBox = new ConfBox(spark.sessionState.newHadoopConf())
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), confBox.conf))
        try reader.getRowGroups.asScala.map { bm =>
          val rows = bm.getRowCount
          val cols = bm.getColumns.asScala.flatMap { cc =>
            val name = cc.getPath.toDotString
            if (!wanted(name)) None
            else {
              val st = cc.getStatistics
              val nulls =
                if (st != null && st.isNumNullsSet) Some(st.getNumNulls)
                else None
              val hasVals = st != null && st.hasNonNullValue
              val mn = if (hasVals) Some(convert(st.genericGetMin)) else None
              val mx = if (hasVals) Some(convert(st.genericGetMax)) else None
              val trusted = st != null && !isNaN(mn) && !isNaN(mx) &&
                (hasVals || nulls.contains(rows))
              Some(name -> ChunkStats(mn, mx, nulls, trusted))
            }
          }.toMap
          GroupStats(rows, cols)
        }.toVector
        finally reader.close()
      }.collect().toSeq
  }

  /** Harvest `fact`'s footers and register the zero-dimension rollup
    * spec. Returns the spec (None when the plan has no parquet scan
    * path or no row groups). `fact` must be a PLAIN scan — derived
    * columns have no footer stats and are simply never harvested. */
  def register(spark: SparkSession, fact: DataFrame)
      : Option[graft.plans.RollupRewrite.Spec] = {
    val pathOpt = graft.plans.RollupRewrite.pathOf(fact)
    if (pathOpt.isEmpty) return None
    val files = fact.inputFiles.toSeq.filter(_.endsWith(".parquet"))
    if (files.isEmpty) return None
    val atomic = fact.schema.fields.filter(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case _ => true
    })
    val groups = harvest(spark, files, atomic.map(_.name).toSet)
    if (groups.isEmpty) return None

    def allTrusted(c: String): Boolean =
      groups.forall(_.cols.get(c).exists(_.trusted))
    def allNullsSet(c: String): Boolean =
      groups.forall(_.cols.get(c).exists(_.nulls.isDefined))

    val served = atomic.filter(f => minMaxType(f.dataType) &&
      allTrusted(f.name)).map(_.name)
    val nullServed = atomic.map(_.name).filter(allNullsSet)

    val schema = StructType(
      StructField("cnt", LongType, nullable = false) +:
        (served.flatMap { c =>
          val dt = fact.schema(c).dataType
          Seq(StructField(s"min_$c", dt), StructField(s"max_$c", dt))
        } ++ nullServed.map(c =>
          StructField(s"nulls_$c", LongType, nullable = false))))
    val rows = groups.map { g =>
      Row.fromSeq(g.rows +:
        (served.flatMap { c =>
          val cs = g.cols(c)
          Seq(cs.min.orNull, cs.max.orNull)
        } ++ nullServed.map(c => g.cols(c).nulls.get)))
    }
    val statsDf = spark.createDataFrame(rows.asJava, schema)

    val spec = graft.plans.RollupRewrite.Spec(
      factPath = pathOpt.get,
      rollupDf = statsDf,
      dims = Set.empty,
      sums = Set.empty,
      mins = served.toSet,
      maxs = served.toSet,
      nullCounts = nullServed.toSet)
    graft.plans.RollupRewrite.register(spark, spec)
    Some(spec)
  }
}
