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

  /** Windowed funnel runs — the sliding-window semantics of the
    * reference's window funnel family (`FunnelBaseAggregationFunction
    * .java:44` fillWindow/processWindow, default mode): per entity,
    * every step-1 event anchors a window of `windowMillis`; scanning
    * events in (ts, step) order within the window, the expected step
    * advances greedily when an event matches it (other events are
    * ignored — no strict_order). A window's run is the array of matched
    * step timestamps. The reference pops every queue head as an anchor;
    * only step-1 anchors can produce nonzero runs, and a step-1 anchor's
    * window contains any later head's matches, so max-over-step-1-anchors
    * equals the reference's max-over-heads.
    *
    * ONE shuffle (groupBy entity); the per-entity fold is a higher-order
    * aggregate inside a transform over anchors — pure Catalyst, no UDF.
    * Cost is O(anchors × events) per entity, the same window re-scan the
    * reference does.
    */
  private def runs(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long): DataFrame = {
    val stepId = steps.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (pred, i)) => when(pred, lit(i + 1)).otherwise(acc)
    }
    val tagged = events
      .withColumn("__step", stepId)
      .filter(col("__step") > 0)
      .select(col(entityCol),
        struct(tsMillis.cast("long").as("ts"), col("__step").as("step")).as("__evt"))
    tagged.groupBy(entityCol)
      .agg(sort_array(collect_list(col("__evt"))).as("__evts"))
      .withColumn("__runs",
        transform(filter(col("__evts"), e => e.getField("step") === 1),
          a => aggregate(col("__evts"),
            struct(lit(1).as("expect"), array().cast("array<long>").as("tss")),
            (st, e) => when(
              e.getField("ts") >= a.getField("ts") &&
                e.getField("ts") < a.getField("ts") + windowMillis &&
                e.getField("step") === st.getField("expect"),
              struct((st.getField("expect") + 1).as("expect"),
                concat(st.getField("tss"), array(e.getField("ts"))).as("tss")))
              .otherwise(st),
            st => st.getField("tss"))))
      .drop("__evts")
  }

  /** FUNNELMATCHSTEP (reference `FunnelMatchStepAggregationFunction
    * .java:49`): per entity, an int array with a 1 for every step the
    * entity reached in its best window, plus the max step itself.
    * Output: (entity, max_step, match_steps array). */
  def matchStep(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long): DataFrame = {
    val n = steps.size
    runs(events, entityCol, tsMillis, steps, windowMillis)
      .withColumn("max_step",
        coalesce(array_max(transform(col("__runs"), r => size(r))), lit(0)))
      .withColumn("match_steps",
        transform(sequence(lit(1), lit(n)),
          i => when(i <= col("max_step"), 1).otherwise(0)))
      .drop("__runs")
  }

  /** FUNNELSTEPDURATIONSTATS (reference
    * `FunnelStepDurationStatsAggregationFunction.java:43`): stats over
    * the durations between consecutive matched steps, across entities
    * that completed the funnel. The reference aggregates durations from
    * every completing sliding window (overlapping windows re-counted);
    * this implementation uses each entity's FIRST completing window —
    * deterministic, per-entity-weighted, and SQL-mirrorable. Returns one
    * row per step transition k→k+1: (transition, n_complete, avg_ms,
    * min_ms, max_ms, med_ms). */
  def stepDurationStats(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long): DataFrame = {
    val n = steps.size
    runs(events, entityCol, tsMillis, steps, windowMillis)
      .withColumn("__tss",
        // get() (0-based) is null-safe on the empty array, unlike
        // element_at under ANSI mode
        get(filter(col("__runs"), r => size(r) === n), lit(0)))
      .filter(col("__tss").isNotNull)
      .select(col(entityCol),
        posexplode(zip_with(slice(col("__tss"), 2, n - 1),
          slice(col("__tss"), 1, n - 1), (b, a) => b - a))
          .as(Seq("__i", "__d")))
      .groupBy((col("__i") + 1).as("transition"))
      .agg(count(lit(1)).as("n_complete"),
        round(avg(col("__d")), 4).as("avg_ms"),
        min(col("__d")).as("min_ms"),
        max(col("__d")).as("max_ms"),
        round(expr("percentile(__d, 0.5)"), 4).as("med_ms"))
  }

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
