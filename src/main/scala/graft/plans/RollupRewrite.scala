package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** Materialized-rollup rewrite — the Spark analog of the reference's
  * star-tree index and materialized-view rewrite.
  *
  * Reference: apache/pinot star-tree matching
  * (`pinot-core/.../startree/StarTreeUtils.java:55,65,178`
  * `isFitForStarTree`: a query is answered from the pre-aggregated tree
  * when its group-by dims and agg pairs are subsets of the tree's) and
  * the materialized-view broker rewrite (`pinot-materialized-view/`).
  *
  * Spark-first shape: the "tree" is a pre-aggregated parquet table
  * (built by [[RollupRewrite.buildRollup]]); the match-and-rewrite is a
  * `Rule[LogicalPlan]` installed via `spark.experimental.extraOptimizations`
  * that redirects `Aggregate(dims ⊆ rollup.dims, aggs ⊆ rollup.measures)`
  * over the fact scan to the (usually orders-of-magnitude smaller)
  * rollup scan, re-aggregating partial states: SUM→SUM(sum_x),
  * COUNT(*)→SUM(cnt), MIN→MIN(min_x), MAX→MAX(max_x). Output exprIds
  * and types are preserved so the surrounding plan is untouched.
  */
object RollupRewrite {

  final case class Spec(
      factPath: String,           // path identifying the fact scan
      rollupDf: DataFrame,        // the pre-aggregated table
      dims: Set[String],
      sums: Set[String],          // measures with sum_<m> columns
      mins: Set[String],
      maxs: Set[String],
      // measures with stored hll_<m> sketch blobs (column → precision p):
      // lets the rollup answer DISTINCTCOUNTHLL queries by blob merge —
      // the star-tree distinct-count trick
      hlls: Map[String, Int] = Map.empty,
      // percentile-sketch blob columns (the star-tree agg-pair contract
      // accepts ANY function whose intermediate merges,
      // `StarTreeUtils.java:55-178` — the percentile sketches qualify):
      // td_<m> t-digest blobs (column → compression), qd_<m> q-digest
      // blobs (column → maxError), kll_<m> KLL blobs (column → k)
      tds: Map[String, Double] = Map.empty,
      qds: Map[String, Double] = Map.empty,
      klls: Map[String, Int] = Map.empty,
      // set-sketch blob columns, completing the star-tree agg-pair
      // contract (any mergeable intermediate, StarTreeUtils.java:55-178):
      // theta_<m> compact-theta blobs (column → nominalEntries),
      // cpc_<m> CPC blobs (column → lgK), tuple_<k>_<v> integer-tuple
      // blobs ((keyCol, valueCol) → nominalEntries)
      thetas: Map[String, Int] = Map.empty,
      cpcs: Map[String, Int] = Map.empty,
      tuples: Map[(String, String), Int] = Map.empty,
      // measures with nulls_<m> per-group null counts: lets the rollup
      // answer COUNT(col) as SUM(cnt) - SUM(nulls_col) — populated by
      // the footer-statistics store (sources/FooterStats), where the
      // "rollup" is parquet row-group metadata and a null count is all
      // the footer knows about a column
      nullCounts: Set[String] = Set.empty)

  private val specs =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  /** Build + register a rollup over `fact` (reference: star-tree builder
    * `StarTreeV2BuilderConfig.java:47` — dimensionsSplitOrder +
    * functionColumnPairs). Columns: dims…, cnt, sum_<m>, min_<m>, max_<m>. */
  def buildRollup(
      spark: SparkSession,
      fact: DataFrame,
      factPath: String,
      dims: Seq[String],
      measures: Seq[String],
      outPath: String,
      distinctMeasures: Seq[String] = Nil,
      hllP: Int = HllSketch.DefaultP,
      tdigestMeasures: Seq[String] = Nil,
      tdCompression: Double = GraftTDigest.DefaultCompression,
      qdigestMeasures: Seq[String] = Nil,
      qdMaxError: Double = GraftQDigest.DefaultMaxError,
      kllMeasures: Seq[String] = Nil,
      kllK: Int = KllSketch.DefaultK,
      thetaMeasures: Seq[String] = Nil,
      thetaK: Int = ThetaDs.DefaultNominalEntries,
      cpcMeasures: Seq[String] = Nil,
      cpcLgK: Int = 12,
      tupleMeasures: Seq[(String, String)] = Nil,
      tupleK: Int = 16384): Spec = {
    val aggs = (count(lit(1)).as("cnt") +:
      measures.flatMap(m => Seq(sum(col(m)).as(s"sum_$m"),
        min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))) ++
      distinctMeasures.map(m => HllSketch.hllState(col(m), hllP).as(s"hll_$m")) ++
      tdigestMeasures.map(m =>
        TDigestSketch.tdigestState(col(m), tdCompression).as(s"td_$m")) ++
      qdigestMeasures.map(m =>
        QDigestSketch.qdigestState(col(m), qdMaxError).as(s"qd_$m")) ++
      kllMeasures.map(m =>
        KllSketch.kllState(col(m), kllK).as(s"kll_$m")) ++
      thetaMeasures.map(m =>
        ThetaSketchDs.thetaState(col(m), thetaK).as(s"theta_$m")) ++
      cpcMeasures.map(m =>
        ThetaSketchDs.cpcState(col(m), cpcLgK).as(s"cpc_$m")) ++
      tupleMeasures.map { case (kc, vc) =>
        TupleSketch.tupleState(col(kc), col(vc), tupleK)
          .as(s"tuple_${kc}_$vc") }
    fact.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(outPath)
    val spec = Spec(factPath, spark.read.parquet(outPath),
      dims.toSet, measures.toSet, measures.toSet, measures.toSet,
      distinctMeasures.map(_ -> hllP).toMap,
      tdigestMeasures.map(_ -> tdCompression).toMap,
      qdigestMeasures.map(_ -> qdMaxError).toMap,
      kllMeasures.map(_ -> kllK).toMap,
      thetaMeasures.map(_ -> thetaK).toMap,
      cpcMeasures.map(_ -> cpcLgK).toMap,
      tupleMeasures.map(_ -> tupleK).toMap)
    register(spark, spec)
    spec
  }

  /** Register a rollup from an ALREADY-WRITTEN artifact (durable
    * ingest-time build, the star-tree contract: the server only ever
    * reads the persisted tree) — same Spec as [[buildRollup]] with the
    * same parameters, but no aggregation job. The caller owns the
    * claim that `rollupPath` was built from `factPath` with these
    * parameters (IndexStore's fingerprint manifest is that proof). */
  def loadRollup(
      spark: SparkSession,
      factPath: String,
      rollupPath: String,
      dims: Seq[String],
      measures: Seq[String],
      distinctMeasures: Seq[String] = Nil,
      hllP: Int = HllSketch.DefaultP,
      tdigestMeasures: Seq[String] = Nil,
      tdCompression: Double = GraftTDigest.DefaultCompression,
      qdigestMeasures: Seq[String] = Nil,
      qdMaxError: Double = GraftQDigest.DefaultMaxError,
      kllMeasures: Seq[String] = Nil,
      kllK: Int = KllSketch.DefaultK,
      thetaMeasures: Seq[String] = Nil,
      thetaK: Int = ThetaDs.DefaultNominalEntries,
      cpcMeasures: Seq[String] = Nil,
      cpcLgK: Int = 12,
      tupleMeasures: Seq[(String, String)] = Nil,
      tupleK: Int = 16384): Spec = {
    val spec = Spec(factPath, spark.read.parquet(rollupPath),
      dims.toSet, measures.toSet, measures.toSet, measures.toSet,
      distinctMeasures.map(_ -> hllP).toMap,
      tdigestMeasures.map(_ -> tdCompression).toMap,
      qdigestMeasures.map(_ -> qdMaxError).toMap,
      kllMeasures.map(_ -> kllK).toMap,
      thetaMeasures.map(_ -> thetaK).toMap,
      cpcMeasures.map(_ -> cpcLgK).toMap,
      tupleMeasures.map(_ -> tupleK).toMap)
    register(spark, spec)
    spec
  }

  def register(spark: SparkSession, spec: Spec): Unit = {
    specs.put(spec.factPath, spec)
    val rule = new RewriteRule(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[RewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }

  def clear(): Unit = specs.clear()

  /** Canonical scan path of a parquet-backed DataFrame (for Spec.factPath). */
  def pathOf(df: DataFrame): Option[String] =
    df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.head.toString
    }

  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption.map(_.toString)
    case _ => None
  }

  final class RewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

    /** Peel attribute-only Projects and collect Filters between the
      * Aggregate and the fact scan (the optimizer's pruning/pushdown
      * leave exactly this shape). Returns (conjoined filter?, scan). */
    private def decompose(p: LogicalPlan)
        : Option[(Option[Expression], LogicalPlan)] = p match {
      case org.apache.spark.sql.catalyst.plans.logical.Project(proj, ch)
          if proj.forall(_.isInstanceOf[AttributeReference]) => decompose(ch)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, ch) =>
        decompose(ch).map { case (f, rel) =>
          (Some(f.map(And(cond, _)).getOrElse(cond)), rel) }
      case rel: LogicalRelation => Some((None, rel))
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        (for {
          (filterOpt, rel) <- decompose(child)
          path <- scanPath(rel)
          spec <- Option(specs.get(path))
          rewritten <- rewrite(agg, groupExprs, aggExprs, filterOpt, spec)
        } yield rewritten).getOrElse(agg)
    }

    private def rewrite(
        agg: Aggregate,
        groupExprs: Seq[Expression],
        aggExprs: Seq[NamedExpression],
        filterOpt: Option[Expression],
        spec: Spec): Option[LogicalPlan] = {
      // a filter is admissible only over dimension columns (star-tree
      // semantics: the tree pre-aggregates ONLY across dims, so dim
      // predicates can be transplanted onto the rollup scan). A
      // non-deterministic predicate (rand() < p) is row-multiplicity
      // sensitive and must never move to the rollup.
      filterOpt.foreach { f =>
        if (!f.references.forall(a => spec.dims(a.name))) return None
        if (f.exists(!_.deterministic)) return None
      }
      // group keys must be plain dim columns of the rollup
      val groupNames = groupExprs.map {
        case a: AttributeReference if spec.dims(a.name) => a.name
        case _ => return None
      }
      val rollupPlan = spec.rollupDf.queryExecution.analyzed
      val rollupAttr: Map[String, Attribute] =
        rollupPlan.output.map(a => a.name -> a).toMap

      def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
        if (ae.isDistinct || ae.filter.isDefined) return None
        ae.aggregateFunction match {
          case Sum(a: AttributeReference, _) if spec.sums(a.name) =>
            Some(Cast(Sum(rollupAttr(s"sum_${a.name}")).toAggregateExpression(),
              ae.dataType))
          case Min(a: AttributeReference) if spec.mins(a.name) =>
            Some(Cast(Min(rollupAttr(s"min_${a.name}")).toAggregateExpression(),
              ae.dataType))
          case Max(a: AttributeReference) if spec.maxs(a.name) =>
            Some(Cast(Max(rollupAttr(s"max_${a.name}")).toAggregateExpression(),
              ae.dataType))
          case HllAgg(a: AttributeReference, p, false, _, _)
              if spec.hlls.get(a.name).contains(p) =>
            // DISTINCTCOUNTHLL answered from stored blobs: register-max
            // merge is associative, so the estimate is bit-identical to
            // a direct pass over the fact table
            Some(HllMergeAgg(rollupAttr(s"hll_${a.name}"), emitBlob = false)
              .toAggregateExpression())
          // percentile sketches answered from stored blobs (the
          // star-tree agg-pair contract: any intermediate that merges,
          // StarTreeUtils.java:55-178). The digest/KLL merge is the
          // SAME state machine a direct fact pass shuffles through, so
          // the estimate stays within the sketch's documented error.
          case TDigestAgg(a: AttributeReference, p, compression, blob, _, _)
              if spec.tds.get(a.name).contains(compression) =>
            Some(TDigestMergeAgg(rollupAttr(s"td_${a.name}"), p, blob)
              .toAggregateExpression())
          case QDigestAgg(a: AttributeReference, p, maxError, blob, _, _)
              if spec.qds.get(a.name).contains(maxError) =>
            Some(QDigestMergeAgg(rollupAttr(s"qd_${a.name}"), p, blob)
              .toAggregateExpression())
          case KllAgg(a: AttributeReference, p, k, blob, _, _)
              if spec.klls.get(a.name).contains(k) =>
            Some(KllMergeAgg(rollupAttr(s"kll_${a.name}"), p, blob)
              .toAggregateExpression())
          // set sketches answered from stored blobs: union merges are
          // associative (exact below nominal entries), completing the
          // star-tree agg-pair contract for the theta/tuple/CPC family
          // NB: fully qualified — Spark 4 ships a same-named
          // ThetaSketchAgg under catalyst.expressions.aggregate, which
          // the wildcard import above would otherwise resolve to
          case graft.plans.ThetaSketchAgg(
              a: AttributeReference, k, emitBlob, _, _)
              if spec.thetas.get(a.name).contains(k) =>
            Some(ThetaMergeAgg(rollupAttr(s"theta_${a.name}"), k, emitBlob)
              .toAggregateExpression())
          case graft.plans.CpcSketchAgg(
              a: AttributeReference, lgK, emitBlob, _, _)
              if spec.cpcs.get(a.name).contains(lgK) =>
            Some(CpcMergeAgg(rollupAttr(s"cpc_${a.name}"), lgK, emitBlob)
              .toAggregateExpression())
          case IntegerTupleSketchAgg(ka: AttributeReference,
              va: AttributeReference, k, mode, _, _)
              if spec.tuples.get((ka.name, va.name)).contains(k) =>
            Some(TupleSketchMergeAgg(
              rollupAttr(s"tuple_${ka.name}_${va.name}"), k, mode)
              .toAggregateExpression())
          case Count(Seq(a: AttributeReference))
              if spec.nullCounts(a.name) =>
            // COUNT(col) = rows - nulls, both tracked per group (the
            // NonScanBasedAggregationOperator.java count-from-metadata
            // case); Coalesce for the ungrouped-empty-input shape as in
            // COUNT(*) below
            Some(Cast(Coalesce(Seq(
              Subtract(
                Sum(rollupAttr("cnt")).toAggregateExpression(),
                Sum(rollupAttr(s"nulls_${a.name}")).toAggregateExpression()),
              Literal(0L))), ae.dataType))
          case Count(Seq(Literal(_, _))) =>
            // COUNT(*) is 0 on empty input but SUM(cnt) is NULL — for a
            // global (ungrouped) aggregate the rewritten query would
            // return NULL when the filter matches no rollup rows.
            // Coalesce is a no-op in grouped mode (cnt is never null).
            Some(Cast(Coalesce(Seq(
              Sum(rollupAttr("cnt")).toAggregateExpression(), Literal(0L))),
              ae.dataType))
          case _ => None
        }
      }

      val newAggExprs: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference if spec.dims(a.name) =>
          // group column passthrough: re-alias rollup attr under the
          // ORIGINAL exprId so parent references stay valid
          Alias(rollupAttr(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name) =>
          rewriteAgg(ae) match {
            case Some(e) => Alias(e, name)(exprId = al.exprId)
            case None => return None
          }
        // agg-free expressions over dims (or literals CollapseProject
        // folded into the Aggregate — e.g. a gate/constant column):
        // transplant with attrs remapped to the rollup's
        case al @ Alias(e, name)
            if !e.exists(_.isInstanceOf[AggregateExpression]) &&
              e.deterministic &&
              e.references.forall(a => spec.dims(a.name)) =>
          val remapped = e.transform {
            case a: AttributeReference => rollupAttr(a.name)
          }
          Alias(remapped, name)(exprId = al.exprId)
        case _ => return None
      }
      val newGroups: Seq[Expression] = groupNames.map(rollupAttr)
      // transplant the (dims-only) filter onto the rollup, remapped by name
      val filtered = filterOpt match {
        case Some(f) =>
          val remapped = f.transform {
            case a: AttributeReference => rollupAttr(a.name)
          }
          org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, rollupPlan)
        case None => rollupPlan
      }
      // explicit projection so the rollup scan prunes to referenced cols
      // (this rule runs after the optimizer's own ColumnPruning pass)
      val needed = rollupPlan.output.filter(a =>
        newAggExprs.exists(_.references.contains(a)) ||
          newGroups.exists(_.references.contains(a)) ||
          filterOpt.exists(f => f.references.exists(_.name == a.name)))
      Some(Aggregate(newGroups, newAggExprs,
        org.apache.spark.sql.catalyst.plans.logical.Project(needed, filtered)))
    }
  }
}
