package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: per entity, how far through an ordered sequence of
  * step predicates did its event stream get?
  *
  * Reference surface: apache/pinot `AggregationFunctionType.java:193-202`
  * (FUNNELMAXSTEP, FUNNELCOMPLETECOUNT, FUNNELCOUNT, FUNNELMATCHSTEP) and
  * `pinot-core/.../query/aggregation/function/funnel/`.
  *
  * Scale design: ONE shuffle (groupBy entity) collecting (ts, step-id)
  * pairs — step-id is resolved BEFORE the shuffle so only a byte-sized
  * tag rides the exchange, not the raw event row. The per-entity fold is
  * a higher-order `aggregate` over the sorted pair array: pure Catalyst
  * expressions, codegen'd, no UDF. Entities with pathologically many
  * events are the only skew concern — same as any sessionization.
  */
object Funnel {

  /** max step reached per entity.
    *
    * @param steps ordered step predicates as (name, boolean Column); an
    *              event can only advance the funnel to step k+1 if steps
    *              1..k were already matched by strictly earlier events
    *              (sorted by orderCol, tie-broken by tieCol).
    */
  def maxStep(
      events: DataFrame,
      entityCol: String,
      orderCol: String,
      tieCol: String,
      steps: Seq[Column]): DataFrame = {

    // Resolve each event to the first step predicate it satisfies (or 0).
    val stepId = steps.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (pred, i)) => when(pred, lit(i + 1)).otherwise(acc)
    }
    val tagged = events
      .withColumn("__step", stepId)
      .filter(col("__step") > 0)
      .select(col(entityCol), struct(col(orderCol), col(tieCol).as("tie"),
        col("__step").as("step")).as("__evt"))

    val n = steps.size
    tagged
      .groupBy(entityCol)
      .agg(sort_array(collect_list(col("__evt"))).as("__evts"))
      .withColumn("max_step",
        aggregate(col("__evts"), lit(0),
          (acc, e) => when(acc < n && e.getField("step") === acc + 1, acc + 1)
            .otherwise(acc)))
      .drop("__evts")
  }

  /** FUNNELCOMPLETECOUNT: entities that completed the whole funnel. */
  def completeCount(
      events: DataFrame,
      entityCol: String,
      orderCol: String,
      tieCol: String,
      steps: Seq[Column]): DataFrame =
    maxStep(events, entityCol, orderCol, tieCol, steps)
      .filter(col("max_step") === steps.size)
      .agg(count(lit(1)).as("n_complete"))

  /** Number of entities that reached each step: rows (step, n_entities). */
  def funnelCount(
      events: DataFrame,
      entityCol: String,
      orderCol: String,
      tieCol: String,
      steps: Seq[Column]): DataFrame = {
    val ms = maxStep(events, entityCol, orderCol, tieCol, steps)
    ms.filter(col("max_step") >= 1)
      .select(explode(sequence(lit(1), col("max_step"))).as("step"))
      .groupBy("step").agg(count("*").as("n_entities"))
  }
}
