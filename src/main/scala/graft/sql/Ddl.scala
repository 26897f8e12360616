package graft.sql

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import graft.plans.RollupRewrite

/** Pinot DDL compatibility layer (reference `pinot-sql-ddl/.../compile/
  * DdlCompiler.java`: CREATE TABLE, SHOW CREATE TABLE, DROP TABLE,
  * CREATE/SHOW/DROP MATERIALIZED VIEW, SHOW TABLES / SHOW MATERIALIZED
  * VIEWS — the statement forms the controller serves).
  *
  * Spark-first mapping: tables are temp views over parquet paths
  * (controller persistence → Spark catalog); the WITH-options form
  * (`CreateTableWithOptionsHandler.java`) carries the table-config
  * subset (primaryKey/sortedColumn/partitionColumn/upsert) that drives
  * [[graft.schema.TableConfig]] view semantics; a MATERIALIZED VIEW is
  * executed once, persisted as parquet, and — when its defining query
  * is a plain dims/SUM/MIN/MAX/COUNT aggregate over a parquet-backed
  * table — registered with [[RollupRewrite]], so base-table aggregates
  * are transparently answered from the view (the reference's
  * materialized-view broker rewrite, `MaterializedViewSchemaInferer
  * .java` inference included).
  */
object Ddl {

  final case class TableEntry(name: String, ddl: String, path: Option[String])
  final case class MvEntry(name: String, ddl: String, select: String,
      path: String, rewriteRegistered: Boolean)

  private val tables = new TrieMap[String, TableEntry]()
  private val mvs = new TrieMap[String, MvEntry]()

  /** Workspace for MV parquet output (test/default: java.io.tmpdir). */
  @volatile var workspace: String =
    System.getProperty("java.io.tmpdir") + "/graft_mv"

  private val CreateTable =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*(?:\((.*?)\))?\s*(?:WITH\s*\((.*)\))?\s*$""".r
  private val DropTable =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val ShowTables = """(?is)^\s*SHOW\s+TABLES\s*$""".r
  private val ShowCreateTable =
    """(?is)^\s*SHOW\s+CREATE\s+TABLE\s+(\w+)\s*$""".r
  private val CreateMv =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(.*)$""".r
  private val DropMv =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val ShowMvs = """(?is)^\s*SHOW\s+MATERIALIZED\s+VIEWS\s*$""".r
  private val ShowCreateMv =
    """(?is)^\s*SHOW\s+CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$""".r

  /** Is `stmt` a DDL statement this layer handles? */
  def isDdl(stmt: String): Boolean = {
    val s = stmt.trim.toUpperCase
    s.startsWith("CREATE TABLE") || s.startsWith("DROP TABLE") ||
      s.startsWith("SHOW TABLES") || s.startsWith("SHOW CREATE") ||
      s.startsWith("CREATE MATERIALIZED") || s.startsWith("DROP MATERIALIZED") ||
      s.startsWith("SHOW MATERIALIZED")
  }

  private def parseOptions(raw: String): Map[String, String] =
    if (raw == null) Map.empty
    else """(\w+)\s*=\s*'([^']*)'""".r.findAllMatchIn(raw)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  /** Execute one DDL statement; returns a result DataFrame (SHOW rows,
    * or a single status row for CREATE/DROP). */
  def execute(spark: SparkSession, stmt: String): DataFrame = {
    import spark.implicits._
    stmt match {
      case CreateTable(name, _, optsRaw) =>
        val opts = parseOptions(optsRaw)
        val path = opts.get("path")
        path.foreach { p =>
          // TIMESTAMP(NANOS) parquet columns (no native Spark type) read
          // as long nanos instead of failing the whole CREATE
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          val raw = spark.read.parquet(p)
          // WITH options carry the table-config subset; upsert/dedup
          // configs materialize as the config-implied view
          val viewDf = opts.get("upsertmode").map(_.toUpperCase) match {
            case Some("FULL") =>
              graft.operators.Upsert.latestByKey(raw,
                opts("primarykey").split(',').toSeq.map(_.trim),
                opts.getOrElse("comparisoncolumn",
                  sys.error("upsert table needs comparisonColumn")),
                tieCols = Nil)
            case _ => raw
          }
          viewDf.createOrReplaceTempView(name)
        }
        tables.put(name, TableEntry(name, stmt.trim, path))
        Seq((name, "CREATED")).toDF("table", "status")

      case DropTable(name) =>
        tables.remove(name)
        spark.catalog.dropTempView(name)
        Seq((name, "DROPPED")).toDF("table", "status")

      case ShowTables() =>
        tables.values.toSeq.sortBy(_.name)
          .map(t => (t.name, t.path.getOrElse("")))
          .toDF("table", "path")

      case ShowCreateTable(name) =>
        Seq((name, tables.get(name).map(_.ddl)
          .getOrElse(sys.error(s"unknown table $name"))))
          .toDF("table", "ddl")

      case CreateMv(name, select) =>
        val df = spark.sql(select)
        val out = s"$workspace/$name"
        // rollup-shape inference (MaterializedViewSchemaInferer analog):
        // Aggregate(plain dims, Sum/Min/Max/Count — or any of the
        // mergeable sketch families, the star-tree agg-pair contract —
        // over plain measures) over a parquet scan → build + register
        // the rewrite; otherwise materialize without a rewrite
        val rollup = inferRollup(spark, df)
        val registered = rollup match {
          case Some(sh) =>
            RollupRewrite.buildRollup(spark, sh.fact, sh.factPath,
              sh.dims, sh.measures, out,
              distinctMeasures = sh.hlls.keys.toSeq.sorted,
              hllP = sh.hlls.values.headOption
                .getOrElse(graft.plans.HllSketch.DefaultP),
              tdigestMeasures = sh.tds.keys.toSeq.sorted,
              tdCompression = sh.tds.values.headOption
                .getOrElse(graft.plans.GraftTDigest.DefaultCompression),
              qdigestMeasures = sh.qds.keys.toSeq.sorted,
              qdMaxError = sh.qds.values.headOption
                .getOrElse(graft.plans.GraftQDigest.DefaultMaxError),
              kllMeasures = sh.klls.keys.toSeq.sorted,
              kllK = sh.klls.values.headOption
                .getOrElse(graft.plans.KllSketch.DefaultK),
              thetaMeasures = sh.thetas.keys.toSeq.sorted,
              thetaK = sh.thetas.values.headOption
                .getOrElse(graft.plans.ThetaDs.DefaultNominalEntries),
              cpcMeasures = sh.cpcs.keys.toSeq.sorted,
              cpcLgK = sh.cpcs.values.headOption.getOrElse(12),
              tupleMeasures = sh.tuples.keys.toSeq.sorted,
              tupleK = sh.tuples.values.headOption.getOrElse(16384))
            true
          case None =>
            df.write.mode("overwrite").parquet(out)
            false
        }
        spark.read.parquet(out).createOrReplaceTempView(name)
        mvs.put(name, MvEntry(name, stmt.trim, select.trim, out, registered))
        Seq((name, if (registered) "CREATED_WITH_REWRITE" else "CREATED"))
          .toDF("view", "status")

      case DropMv(name) =>
        mvs.remove(name)
        spark.catalog.dropTempView(name)
        // conservative: dropping any MV clears rewrite registrations
        // (specs are keyed by fact path, not MV name)
        RollupRewrite.clear()
        Seq((name, "DROPPED")).toDF("view", "status")

      case ShowMvs() =>
        mvs.values.toSeq.sortBy(_.name)
          .map(m => (m.name, m.rewriteRegistered))
          .toDF("view", "rewrite")

      case ShowCreateMv(name) =>
        Seq((name, mvs.get(name).map(_.ddl)
          .getOrElse(sys.error(s"unknown materialized view $name"))))
          .toDF("view", "ddl")

      case _ =>
        sys.error("Unsupported DDL. Supported: CREATE TABLE, SHOW CREATE " +
          "TABLE, DROP TABLE, SHOW TABLES, CREATE MATERIALIZED VIEW, " +
          "SHOW CREATE MATERIALIZED VIEW, DROP MATERIALIZED VIEW, " +
          "SHOW MATERIALIZED VIEWS.")
    }
  }

  /** (fact, factPath, dims, measures) when the MV query is a
    * rollup-shaped aggregate over a parquet-backed scan. */
  /** The rollup shape an MV's defining SELECT implies: plain dims,
    * sum/min/max measures, plus one map per mergeable-sketch family
    * (measure → param). Conflicting params within a family reject the
    * rewrite (a rollup stores ONE blob per measure). */
  private final case class RollupShape(
      fact: DataFrame, factPath: String,
      dims: Seq[String], measures: Seq[String],
      hlls: Map[String, Int], tds: Map[String, Double],
      qds: Map[String, Double], klls: Map[String, Int],
      thetas: Map[String, Int], cpcs: Map[String, Int],
      tuples: Map[(String, String), Int])

  private def inferRollup(spark: SparkSession, df: DataFrame)
      : Option[RollupShape] = {
    df.queryExecution.analyzed match {
      case Aggregate(groups, aggs, child, _) =>
        val dims = groups.map {
          case a: AttributeReference => a.name
          case _ => return None
        }
        val measures = Seq.newBuilder[String]
        val hlls = scala.collection.mutable.Map[String, Int]()
        val tds = scala.collection.mutable.Map[String, Double]()
        val qds = scala.collection.mutable.Map[String, Double]()
        val klls = scala.collection.mutable.Map[String, Int]()
        val thetas = scala.collection.mutable.Map[String, Int]()
        val cpcs = scala.collection.mutable.Map[String, Int]()
        val tuples = scala.collection.mutable.Map[(String, String), Int]()
        def put[K](m: scala.collection.mutable.Map[K, Int], k: K,
            v: Int): Boolean =
          m.getOrElseUpdate(k, v) == v
        def putD[K](m: scala.collection.mutable.Map[K, Double], k: K,
            v: Double): Boolean =
          m.getOrElseUpdate(k, v) == v
        aggs.foreach {
          case a: AttributeReference if dims.contains(a.name) =>
          case Alias(a: AttributeReference, _) if dims.contains(a.name) =>
          case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
            case Sum(m: AttributeReference, _) => measures += m.name
            case Min(m: AttributeReference) => measures += m.name
            case Max(m: AttributeReference) => measures += m.name
            case Count(Seq(_)) =>
            case graft.plans.HllAgg(m: AttributeReference, p, false, _, _) =>
              if (!put(hlls, m.name, p)) return None
            case graft.plans.TDigestAgg(
                m: AttributeReference, _, c, _, _, _) =>
              if (!putD(tds, m.name, c)) return None
            case graft.plans.QDigestAgg(
                m: AttributeReference, _, e, _, _, _) =>
              if (!putD(qds, m.name, e)) return None
            case graft.plans.KllAgg(m: AttributeReference, _, k, _, _, _) =>
              if (!put(klls, m.name, k)) return None
            case graft.plans.ThetaSketchAgg(
                m: AttributeReference, k, _, _, _) =>
              if (!put(thetas, m.name, k)) return None
            case graft.plans.CpcSketchAgg(
                m: AttributeReference, lgK, _, _, _) =>
              if (!put(cpcs, m.name, lgK)) return None
            case graft.plans.IntegerTupleSketchAgg(
                k: AttributeReference, v: AttributeReference, kk, _, _, _) =>
              if (!put(tuples, (k.name, v.name), kk)) return None
            case _ => return None
          }
          case _ => return None
        }
        // one param per family (a rollup stores one blob per measure)
        if (Seq(hlls.values, klls.values, thetas.values, cpcs.values,
            tuples.values).exists(_.toSet.size > 1)) return None
        if (Seq(tds.values, qds.values).exists(_.toSet.size > 1)) return None
        // child must be a BARE parquet scan (attr-only projections ok):
        // a WHERE in the MV query would make the whole-fact rollup
        // diverge from the defining SELECT
        val factPath = pathOfBareScan(child).getOrElse(return None)
        Some(RollupShape(spark.read.parquet(factPath), factPath, dims,
          measures.result().distinct, hlls.toMap, tds.toMap, qds.toMap,
          klls.toMap, thetas.toMap, cpcs.toMap, tuples.toMap))
      case _ => None
    }
  }

  private def pathOfBareScan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[String] = plan match {
    case p: org.apache.spark.sql.catalyst.plans.logical.Project
        if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      pathOfBareScan(p.child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      pathOfBareScan(s.child)
    case v: org.apache.spark.sql.catalyst.plans.logical.View =>
      pathOfBareScan(v.child)
    case org.apache.spark.sql.execution.datasources.LogicalRelation(
        fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
        _, _, _, _) =>
      fs.location.rootPaths.headOption.map(_.toString)
    case _ => None
  }

  /** Test/maintenance hook. */
  def reset(): Unit = { tables.clear(); mvs.clear() }
}
